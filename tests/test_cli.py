"""CLI wiring: parsers, config validation, sampler CLI end-to-end."""
import numpy as np
import pytest

from timed_design_tpu.cli.analyse_rotamers import build_parser as rot_parser
from timed_design_tpu.cli.predict import build_parser as predict_parser
from timed_design_tpu.cli.sample import build_parser as sample_parser
from timed_design_tpu.cli.train import build_parser as train_parser
from timed_design_tpu.cli.voxelize import build_parser as voxelize_parser
from timed_design_tpu.utils.config import PredictConfig


def test_predict_parser_reference_flags():
    # flag surface mirrors reference predict.py:250-298
    args = predict_parser().parse_args(
        ["--path_to_dataset", "d.hdf5", "--path_to_model", "TIMED.h5",
         "--batch_size", "500", "--predict_rotamers", "--is_structure_nmr"]
    )
    assert args.batch_size == 500
    assert args.predict_rotamers and args.is_structure_nmr
    assert args.path_to_datasetmap == "datasetmap.txt"


def test_sample_parser_reference_flags():
    args = sample_parser().parse_args(
        ["--path_to_pred_matrix", "TIMED.csv", "--sample_n", "200",
         "--temperature", "0.1", "--seed", "42", "--workers", "35"]
    )
    assert args.sample_n == 200 and args.temperature == 0.1
    assert args.workers == 35  # accepted for parity, ignored


def test_other_parsers():
    a = voxelize_parser().parse_args(["pdbs/", "-e", ".pdb1.gz", "-ae", "CNOCBCAQ"])
    assert a.atom_encoder == "CNOCBCAQ"
    t = train_parser().parse_args(["--path_to_dataset", "d.hdf5", "--model", "DenseCPD"])
    assert t.model == "DenseCPD"
    r = rot_parser().parse_args(
        ["--path_to_pred_matrix", "x.csv", "--path_to_pdb", "pdbs/"]
    )
    assert r.path_to_pdb == "pdbs/"


def test_predict_config_validation(tmp_path):
    d = tmp_path / "d.hdf5"
    d.write_bytes(b"")
    cfg = PredictConfig(path_to_dataset=d, path_to_model=["TIMED"])
    assert cfg.validate() is cfg
    with pytest.raises(FileNotFoundError):
        PredictConfig(path_to_dataset=tmp_path / "nope", path_to_model=[]).validate()
    with pytest.raises(ValueError):
        PredictConfig(path_to_dataset=d, path_to_model=[], batch_size=0).validate()


def test_sample_cli_end_to_end(tmp_path, monkeypatch, capsys):
    from timed_design_tpu.cli.sample import main

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    probs = rng.random((6, 20))
    probs /= probs.sum(1, keepdims=True)
    np.savetxt(tmp_path / "TIMED.csv", probs, delimiter=",")
    (tmp_path / "TIMED.txt").write_text(
        "ignore_uncommon False\ninclude_pdbs\n##########\n1abcA 6\n"
    )
    main(["--path_to_pred_matrix", str(tmp_path / "TIMED.csv"),
          "--path_to_datasetmap", str(tmp_path / "TIMED.txt"),
          "--sample_n", "4", "--temperature", "0.5", "--save_as", "fasta"])
    out = capsys.readouterr().out
    assert "Wrote:" in out
    fastas = list(tmp_path.glob("*.fasta"))
    assert len(fastas) == 1
    assert fastas[0].read_text().count(">") == 4


def test_predict_profile_flag_writes_trace(tmp_path, monkeypatch):
    """--profile DIR wraps the run in jax.profiler.trace."""
    from timed_design_tpu.cli.predict import build_parser

    args = build_parser().parse_args(
        ["--path_to_dataset", "d.hdf5", "--path_to_model", "X.h5",
         "--profile", str(tmp_path / "trace")]
    )
    assert args.profile == str(tmp_path / "trace")


def test_predict_voxelize_forwards_nmr_all_states(tmp_path, monkeypatch):
    """--voxelize with --is_structure_nmr must voxelize EVERY NMR state
    (voxelise_all_states) or the 'consensus' is just state 0."""
    import timed_design_tpu.voxel as voxel_mod
    from timed_design_tpu.cli import predict as predict_cli

    seen = {}

    def fake_mfd(pdbs, path, codec=None, voxelise_all_states=False, **kw):
        seen["all_states"] = voxelise_all_states
        raise SystemExit(0)  # stop before the heavy predict

    monkeypatch.setattr(voxel_mod, "make_frame_dataset", fake_mfd)
    src = tmp_path / "x.pdb"
    src.write_text("END\n")
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        predict_cli.main([
            "--path_to_dataset", str(src), "--path_to_model", "M.h5",
            "--path_to_output", str(tmp_path), "--voxelize",
            "--is_structure_nmr",
        ])
    assert seen["all_states"] is True


def test_voxelize_rejects_bool_typos(tmp_path):
    """'-g Ture' (typo) must error instead of silently flipping the
    dataset's gaussian encoding to False."""
    from timed_design_tpu.cli.voxelize import main

    (tmp_path / "x.pdb").write_text("ATOM\n")  # pass the existence check
    with pytest.raises(SystemExit, match="expected True/False"):
        main([str(tmp_path), "-e", ".pdb", "-g", "Ture"])
