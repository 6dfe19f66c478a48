"""Static HTML design report (report.py): the UI's output section as one
self-contained artifact."""
import base64

import numpy as np
import pytest

from timed_design_tpu.report import write_design_report


def _result(n=12, classes=20, seed=0):
    rng = np.random.default_rng(seed)
    P = rng.random((n, classes))
    P /= P.sum(1, keepdims=True)
    from timed_design_tpu.constants import AA1

    aa = np.array(list(AA1))
    designed = "".join(aa[np.asarray(P[:, :20]).argmax(1) % 20])
    native = "".join(rng.choice(list(AA1), n))
    return designed, native, P


def test_report_contains_all_sections(tmp_path):
    designed, native, P = _result()
    out = write_design_report(
        {"1abcA": designed}, {"1abcA": native}, {"1abcA": P},
        tmp_path, model_name="TIMED",
    )
    assert out.name == "TIMED_report.html"
    text = out.read_text()
    # self-contained: every image is inline base64, no external refs
    assert text.count("data:image/png;base64,") == 3  # heatmap+entropy+logo
    assert "src=\"http" not in text and "href=\"http" not in text
    assert designed in text.replace('<span class="diff">', "").replace(
        "</span>", ""
    )
    assert native in text
    assert "Isoelectric point" in text and "Molecular weight" in text
    assert "Per-position top-3" in text
    assert "identity" in text and "similarity" in text
    # the inline PNGs decode
    for chunk in text.split("data:image/png;base64,")[1:]:
        png = base64.b64decode(chunk.split('"')[0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_report_rotamer_and_consensus(tmp_path):
    designed, native, P338 = _result(n=9, classes=338, seed=1)
    designed = designed[:9]
    out = write_design_report(
        {"2xyzA": designed[:9]}, {"2xyzA": native}, {"2xyzA": P338},
        tmp_path, model_name="TIMED_rotamer",
        pdb_to_consensus={"2xyzA": native},
    )
    text = out.read_text()
    assert "338-rotamer head" in text
    assert "NMR consensus sequence" in text


def test_report_missing_native_degrades(tmp_path):
    designed, _, P = _result(n=6, seed=2)
    out = write_design_report(
        {"3qqqA": designed[:6]}, {}, {"3qqqA": P}, tmp_path,
    )
    text = out.read_text()
    assert "model_report.html" == out.name
    assert "nan%" in text  # identity/similarity degrade, render still lands


def test_report_cli_from_saved_artifacts(tmp_path):
    """td-report: rebuild the report from a saved {model}.csv + SRB
    datasetmap pair, no model/device needed."""
    from timed_design_tpu.cli.report import main
    from timed_design_tpu.io import save_prediction_csv, save_srb_datasetmap
    from timed_design_tpu.io.datasetmap import DatasetMap

    designed, native, P = _result(n=10, seed=4)
    save_prediction_csv(P, "TIMED", tmp_path, float16=True)
    dmap = DatasetMap(
        entries=[("1abc", "A", str(i + 1), "ALA") for i in range(10)]
    )
    save_srb_datasetmap(dmap, "TIMED", tmp_path)
    main([
        "--path_to_pred_matrix", str(tmp_path / "TIMED.csv"),
        "--path_to_datasetmap", str(tmp_path / "TIMED.txt"),
        "--path_to_output", str(tmp_path),
    ])
    text = (tmp_path / "TIMED_report.html").read_text()
    assert text.count("data:image/png;base64,") == 3
    assert "1abcA" in text


def test_seq_block_without_native_still_renders_design():
    """A chain with no native sequence must still show the designed
    sequence (a zip over the empty native blanked it entirely)."""
    from timed_design_tpu.report import _seq_block

    html_out = _seq_block("MKYW", "")
    assert "M" in html_out and "K" in html_out and "W" in html_out
    assert "Native sequence" not in html_out
    # shorter native: tail positions render as differing, never truncated
    html_out = _seq_block("MKYW", "MK")
    assert html_out.count('class="diff"') == 2


def test_report_length_mismatch_degrades_not_crashes():
    """native/designed length mismatch on one chain must degrade that
    chain's identity/similarity to NaN, not kill the whole render."""
    from timed_design_tpu.report import render_design_report

    P = np.full((4, 20), 1 / 20.0)
    doc = render_design_report(
        {"aA": "MKYW"}, {"aA": "MK"}, {"aA": P}, model_name="T"
    )
    assert "identity nan" in doc


def test_report_cli_rejects_flag_shape_mismatch(tmp_path):
    """--predict_rotamers on a 20-column matrix must error, not decode
    {A,C,D,E} garbage."""
    from timed_design_tpu.cli.report import main
    from timed_design_tpu.io import save_prediction_csv, save_datasetmap
    from timed_design_tpu.io.datasetmap import DatasetMap

    P = np.full((2, 20), 1 / 20.0)
    csv = save_prediction_csv(P, "T", tmp_path)
    dmap = DatasetMap(entries=[("1abc", "A", "1", "ALA"),
                               ("1abc", "A", "2", "GLY")])
    dm = save_datasetmap(dmap, tmp_path / "dm.txt")
    with pytest.raises(SystemExit, match="338"):
        main(["--path_to_pred_matrix", str(csv),
              "--path_to_datasetmap", str(dm), "--predict_rotamers",
              "--path_to_output", str(tmp_path)])
