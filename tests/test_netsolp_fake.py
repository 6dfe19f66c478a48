"""NetSolP adapter executed against a fake predict.py checkout.

Same rationale as the fake-SCWRL tests: the real NetSolP (ESM-based,
licensed download) is absent everywhere, so the subprocess plumbing, CSV
parsing, and metrics-join were never executed. The fake reproduces the
invocation contract (scripts/run_netsolp.sh flag surface) and output CSV.
"""
import csv
from pathlib import Path

import pytest

from timed_design_tpu.analyse.netsolp import (
    NetSolPNotFoundError,
    annotate_samples_with_netsolp,
    run_netsolp,
)

_FAKE_PREDICT = r"""#!/usr/bin/env python3
import argparse

p = argparse.ArgumentParser()
p.add_argument("--FASTA_PATH")
p.add_argument("--OUTPUT_PATH")
p.add_argument("--MODEL_TYPE")
p.add_argument("--PREDICTION_TYPE")
p.add_argument("--MODELS_PATH", default=None)
a = p.parse_args()

ids = [l[1:].strip() for l in open(a.FASTA_PATH) if l.startswith(">")]
with open(a.OUTPUT_PATH, "w") as f:
    f.write("sid,predicted_solubility,predicted_usability\n")
    for i, sid in enumerate(ids):
        f.write(f"{sid},{0.5 + 0.01 * i:.3f},{0.4 + 0.01 * i:.3f}\n")
"""


@pytest.fixture()
def netsolp_dir(tmp_path):
    d = tmp_path / "netsolp"
    d.mkdir()
    (d / "predict.py").write_text(_FAKE_PREDICT)
    return d


@pytest.fixture()
def samples(tmp_path):
    """Writer-format sampled outputs (io/writers.py save_sampled): fasta ids
    are {pdb}_{i} with i counting per pdb; the metrics CSV repeats the bare
    pdb per sample row. Two pdbs so the per-pdb join indices are exercised."""
    fasta = tmp_path / "samples.fasta"
    fasta.write_text(
        ">1ubqA_0\nMQIFVK\n>1ubqA_1\nAQIFVK\n>2xyzB_0\nKVFIQM\n"
    )
    metrics = tmp_path / "samples_metrics.csv"
    with open(metrics, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["pdb", "sequence", "charge"])
        w.writerow(["1ubqA", "MQIFVK", "0.9"])
        w.writerow(["1ubqA", "AQIFVK", "0.9"])
        w.writerow(["2xyzB", "KVFIQM", "0.1"])
    return fasta, metrics


def test_run_netsolp(netsolp_dir, samples):
    fasta, _ = samples
    scores = run_netsolp(fasta, netsolp_dir)
    assert scores["1ubqA_0"]["predicted_solubility"] == pytest.approx(0.5)
    assert scores["1ubqA_1"]["predicted_usability"] == pytest.approx(0.41)


def test_run_netsolp_missing_checkout(tmp_path, samples):
    with pytest.raises(NetSolPNotFoundError):
        run_netsolp(samples[0], tmp_path / "nowhere")


def test_annotate_samples(netsolp_dir, samples):
    fasta, metrics = samples
    out = annotate_samples_with_netsolp(fasta, metrics, netsolp_dir)
    rows = list(csv.DictReader(open(out)))
    assert [r["pdb"] for r in rows] == ["1ubqA", "1ubqA", "2xyzB"]
    assert rows[0]["predicted_solubility"] == "0.5"
    assert rows[1]["predicted_solubility"] == "0.51"
    # second pdb's first sample joins to 2xyzB_0 (per-pdb index reset),
    # i.e. the third fasta id -> score 0.52
    assert rows[2]["predicted_solubility"] == "0.52"
    assert set(rows[0]) >= {"pdb", "sequence", "charge",
                            "predicted_solubility", "predicted_usability"}
