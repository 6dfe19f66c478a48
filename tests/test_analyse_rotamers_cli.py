"""analyse_rotamers CLI end-to-end (SCWRL-free paths).

Reference flow (analyse_rotamers.py:19-139): saved rotamer predictions +
datasetmap + PDB directory -> wild-type crystal-rotamer metrics. The SCWRL
analyses require the licensed binary and must skip cleanly.
"""
import shutil
from pathlib import Path

import numpy as np
import pytest

from timed_design_tpu.cli.analyse_rotamers import main as rot_main
from timed_design_tpu.structure import load_pdb
from timed_design_tpu.structure.geometry import encode_structure_rotamers


def test_analyse_rotamers_cli(tmp_path, ubq_pdb_gz, capsys):
    # layout a pdb dir the CLI can search
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    shutil.copy(ubq_pdb_gz, pdb_dir / "1ubq.pdb1.gz")

    # synthetic near-perfect predictions from the crystal rotamers
    truth = np.array(encode_structure_rotamers(load_pdb(ubq_pdb_gz)), float)
    P = np.full((76, 338), 0.1 / 337)
    P[np.arange(76), truth.astype(int)] = 0.9
    np.savetxt(tmp_path / "TIMED_rot.csv", P, delimiter=",")
    (tmp_path / "TIMED.txt").write_text(
        "ignore_uncommon False\ninclude_pdbs\n##########\n1ubqA 76\n"
    )

    rot_main([
        "--path_to_pred_matrix", str(tmp_path / "TIMED_rot.csv"),
        "--path_to_datasetmap", str(tmp_path / "TIMED.txt"),
        "--path_to_pdb", str(pdb_dir),
        "--path_to_output", str(tmp_path / "out"),
    ])
    out = capsys.readouterr().out
    assert "[wt] top-1 1.0000" in out
    assert "Skipping SCWRL analyses" in out
    results = (tmp_path / "out" / "results_wt.txt").read_text()
    assert "Metrics AUC_OVO" in results


def test_analyse_rotamers_cli_with_fake_scwrl(tmp_path, ubq_pdb_gz, capsys):
    """The 3-way evaluation (wt + scwrl-pred + scwrl-real) end-to-end
    against the fake Scwrl4 binary — covers analyses 2+3 and
    scwrl_scores.csv (reference analyse_rotamers.py:94-139)."""
    import stat

    from tests.test_scwrl_fake_binary import _FAKE

    exe = tmp_path / "Scwrl4"
    exe.write_text(_FAKE)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)

    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    shutil.copy(ubq_pdb_gz, pdb_dir / "1ubq.pdb1.gz")
    structure = load_pdb(ubq_pdb_gz)
    truth = np.array(encode_structure_rotamers(structure), float)
    P = np.full((76, 338), 0.1 / 337)
    P[np.arange(76), truth.astype(int)] = 0.9
    np.savetxt(tmp_path / "TIMED_rot.csv", P, delimiter=",")
    # old-format (per-residue) map so real sequences carry genuine labels
    res = [r for r in structure.residues if r.is_standard_aa]
    (tmp_path / "TIMED.txt").write_text(
        "".join(f"1ubq,A,{r.id},{r.res_name}\n" for r in res)
    )

    rot_main([
        "--path_to_pred_matrix", str(tmp_path / "TIMED_rot.csv"),
        "--path_to_datasetmap", str(tmp_path / "TIMED.txt"),
        "--path_to_pdb", str(pdb_dir),
        "--path_to_output", str(tmp_path / "out"),
        "--path_to_scwrl", str(exe),
        "--support_old_datasetmap",
    ])
    out = capsys.readouterr().out
    assert "[wt] top-1 1.0000" in out
    assert "[scwrl-pred] top-1" in out
    assert "[scwrl-real] top-1" in out
    scores = (tmp_path / "out" / "scwrl_scores.csv").read_text().splitlines()
    assert scores[0] == "pdb,score_pred,score_real"
    assert scores[1].startswith("1ubqA,")
    assert (tmp_path / "out" / "results_scwrl_pred.txt").exists()
    assert (tmp_path / "out" / "results_scwrl_real.txt").exists()


def test_reference_flag_aliases_parse():
    """The reference's --output_path/--scwrl_path/--workers spellings
    (analyse_rotamers.py:148,171,162) must be accepted for drop-in use."""
    from timed_design_tpu.cli.analyse_rotamers import build_parser

    args = build_parser().parse_args([
        "--path_to_pred_matrix", "m.csv", "--path_to_pdb", "pdbs",
        "--output_path", "out", "--scwrl_path", "scwrl4", "--workers", "8",
    ])
    assert args.path_to_output == "out"
    assert args.path_to_scwrl == "scwrl4"
    assert args.workers == 8
