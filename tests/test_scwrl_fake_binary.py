"""SCWRL adapter executed end-to-end against a FAKE Scwrl4 binary.

The real SCWRL4 is licensed and absent from every CI image, so round 1
shipped the adapter with zero execution coverage. This fake reproduces the
binary's observable contract — `-i/-o/-s` flags, an output PDB, and the
"Total minimal energy of the graph" stdout line (reference
scwrl_utils.py:16-49 parses exactly that) — so the subprocess plumbing,
score parsing, output parsing, and the error-collection batch driver all
run for real.
"""
import os
import stat
from pathlib import Path

import pytest

from timed_design_tpu.analyse.scwrl import (
    ScwrlNotFoundError,
    analyse_with_scwrl,
    find_scwrl,
    pack_side_chains_scwrl,
    parse_scwrl_score,
)
from timed_design_tpu.structure import load_pdb

_FAKE = r"""#!/usr/bin/env python3
import sys

args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
with open(args["-i"]) as f:
    pdb = f.read()
seq = open(args["-s"]).read().split()[0].strip()
if "x" in seq:
    # unpackable residue: SCWRL dies without emitting a score line
    sys.stderr.write("bad residue\n")
    sys.exit(1)
with open(args["-o"], "w") as f:
    f.write(pdb)
print("A few lines of preamble")
print(f"Total minimal energy of the graph = {-17.25 - len(seq) * 0.5}")
"""


@pytest.fixture()
def fake_scwrl(tmp_path):
    exe = tmp_path / "Scwrl4"
    exe.write_text(_FAKE)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return exe


def test_find_scwrl_explicit_and_missing(fake_scwrl, monkeypatch):
    assert find_scwrl(fake_scwrl) == fake_scwrl
    monkeypatch.setenv("PATH", "/nonexistent")
    with pytest.raises(ScwrlNotFoundError):
        find_scwrl(None)


def test_parse_scwrl_score():
    assert parse_scwrl_score("x\nTotal minimal energy of the graph = -55.25\n") == -55.25
    with pytest.raises(ChildProcessError):
        parse_scwrl_score("no score here")


def test_pack_side_chains_roundtrip(fake_scwrl, ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    seq = "A" * 76
    packed, score = pack_side_chains_scwrl(s, [seq], scwrl_path=fake_scwrl)
    assert packed.n_residues == s.n_residues
    assert score == pytest.approx(-17.25 - 76 * 0.5)


def test_analyse_with_scwrl_error_collection(fake_scwrl, ubq_pdb_gz, tmp_path):
    s = load_pdb(ubq_pdb_gz)
    pdb_to_seq = {
        "1ubqA": "A" * 76,          # ok
        "1ubqB": "x" * 76,          # fake binary exits 1 -> ChildProcessError
        "2zzzA": "A" * 10,          # assembly missing
    }
    scores, errors = analyse_with_scwrl(
        pdb_to_seq, {"1ubq": s}, tmp_path, "_test", scwrl_path=fake_scwrl
    )
    assert scores["1ubqA"] == pytest.approx(-17.25 - 38.0)
    assert (tmp_path / "1ubqA__test.pdb").exists()
    assert "SCWRL failed" in errors["1ubqB"]
    assert "Assembly not found" in errors["2zzzA"]
    err_csv = (tmp_path / "errors_scwrl_test.csv").read_text()
    assert "1ubqB" in err_csv and "2zzzA" in err_csv

    # pre-existing output short-circuits (resume semantics)
    scores2, errors2 = analyse_with_scwrl(
        {"1ubqA": "A" * 76}, {"1ubq": s}, tmp_path, "_test",
        scwrl_path=fake_scwrl,
    )
    assert "already exists" in errors2["1ubqA"] and not scores2


def test_sequence_file_case_preserved(fake_scwrl, ubq_pdb_gz, tmp_path,
                                      monkeypatch):
    """The -s file must carry the sequence VERBATIM: SCWRL4 treats
    lower-case letters as 'keep this side chain fixed', so lower-casing a
    design would silently skip the repack. Also: -h (omit hydrogens) is
    passed, matching the reference's default."""
    import stat as _stat

    capture = tmp_path / "capture"
    recorder = tmp_path / "Scwrl4rec"
    recorder.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, shutil\n"
        "args = dict(zip(sys.argv[1::2], sys.argv[2::2]))\n"
        f"shutil.copy(args['-s'], {str(capture)!r})\n"
        f"open({str(capture)!r} + '.argv', 'w').write(' '.join(sys.argv[1:]))\n"
        "shutil.copy(args['-i'], args['-o'])\n"
        "print('Total minimal energy of the graph = -1.0')\n"
    )
    recorder.chmod(recorder.stat().st_mode | _stat.S_IEXEC)
    s = load_pdb(ubq_pdb_gz)
    seq = "MKYW" + "A" * 72
    pack_side_chains_scwrl(s, [seq], scwrl_path=recorder)
    assert capture.read_text() == seq  # verbatim: no .lower(), no newlines
    assert " -h" in capture.with_suffix(".argv").read_text()
