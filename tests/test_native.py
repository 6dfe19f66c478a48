"""Native C++ PDB scanner: parity with the Python reference scanner."""
import gzip

import numpy as np
import pytest

from timed_design_tpu.structure._native import native_available, scan_pdb_native
from timed_design_tpu.structure.pdb import _scan_python


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_scanner_parity(ubq_pdb_gz):
    text = gzip.open(ubq_pdb_gz).read().decode()
    a = scan_pdb_native(text)
    b = _scan_python(text)
    assert a is not None and len(a["coords"]) == len(b["coords"]) > 600
    for k in b:
        if a[k].dtype.kind in "fiu?":
            np.testing.assert_allclose(
                a[k].astype(float), b[k].astype(float), atol=1e-4, err_msg=k
            )
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_scanner_multimodel():
    text = (
        "MODEL        1\n"
        "ATOM      1  CA  ALA A   1      11.000  12.000  13.000  1.00 10.00           C\n"
        "ENDMDL\n"
        "MODEL        2\n"
        "ATOM      2  CA  ALA A   1      21.000  22.000  23.000  1.00 20.00           C\n"
        "ENDMDL\n"
    )
    a = scan_pdb_native(text)
    np.testing.assert_array_equal(a["model_idx"], [0, 1])
    b = _scan_python(text)
    np.testing.assert_array_equal(b["model_idx"], [0, 1])


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_scanner_fuzz_parity(ubq_pdb_gz):
    """Random corruption of a real PDB: native and Python scanners must stay
    field-for-field identical (including which records they reject)."""
    rng = np.random.default_rng(0)
    text = gzip.open(ubq_pdb_gz).read().decode()
    lines = text.splitlines()
    for trial in range(5):
        mutated = []
        for line in lines:
            r = rng.random()
            if r < 0.05:
                continue  # drop line
            if r < 0.10 and len(line) > 30:
                pos = int(rng.integers(6, len(line)))
                line = line[:pos] + chr(int(rng.integers(33, 126))) + line[pos + 1:]
            if r < 0.12:
                line = line[: int(rng.integers(0, len(line) + 1))]  # truncate
            mutated.append(line)
        corrupted = "\n".join(mutated)
        a = scan_pdb_native(corrupted)
        b = _scan_python(corrupted)
        assert len(a["coords"]) == len(b["coords"]), f"trial {trial}"
        for k in b:
            if a[k].dtype.kind in "fiu?":
                np.testing.assert_allclose(
                    a[k].astype(float), b[k].astype(float), atol=1e-4,
                    err_msg=f"trial {trial} field {k}",
                )
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=f"trial {trial} {k}")
