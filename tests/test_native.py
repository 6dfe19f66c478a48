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
