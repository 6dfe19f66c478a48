"""Execute the reference's COMPOSED `analyse_rotamers` pipeline as an oracle.

With predict (tests/test_reference_pipeline_e2e.py) and sample covered, this
closes the trio: the reference's third and last entry point
(/root/reference/analyse_rotamers.py:19-139) runs start-to-finish — dataset
map load, PDB-mirror traversal, crystal-rotamer tagging, the float16 matrix
re-read, sequence extraction, the NEW-datasetmap real-sequence rebuild
(analyse_rotamers.py:69-71), three `calculate_rotamer_metrics` analyses,
two `analyse_with_scwrl` packing passes, packed-structure re-tagging, and
`scwrl_scores.csv` — and its numbers are diffed against our
`cli/analyse_rotamers.py` on identical inputs.

Three seams are bridged identically on both sides, by necessity:

* the ampal boundary — a STRUCTURAL fake backed by our own parser/tagger
  following docs/AMPAL_SPEC.md (reference_shim.build_structural_ampal).
  As with the sampler's PRNG seam, tag VALUES are spec-bridged (exact
  provenance closes via scripts/ampal_parity.py wherever real ampal
  installs); the composition around them is the reference's own code.
* the SCWRL4 boundary — one deterministic fake binary on both sides. It
  strips side-chain atoms beyond CB of every residue whose identity
  differs from the requested sequence (a real repack would REPLACE those
  side chains; dropping them makes the packed-structure re-tag genuinely
  different from the wild-type tag, so analysis 2 has teeth), and scores
  as a function of the packed sequence (so scwrl_scores.csv columns
  differ meaningfully).
* CM plot rendering — stubbed out on the reference side (its 338-label
  figures allocate multi-hundred-MB Agg canvases per call; the plot
  internals are already executed by the slow function-level oracle,
  tests/test_reference_oracle.py). Ours runs without --plot_confusion.

Everything else that runs is the reference's own code, unpatched (except
the inline Pool — forking after JAX init is unsafe and starmap semantics
are unchanged).

Documented deviations asserted here instead of equality (PARITY.md):
  * artifact names: ours uses analysis-role suffixes (results_wt.txt …)
    vs the reference's model-derived ones;
  * scwrl_scores.csv header: `pdb,score_pred,score_real` vs
    `PDB,score_rot,score_real` (same values);
  * float16-residual renormalization precision: the reference assigns the
    float64 correction back INTO its float16 array (analyse_utils.py:
    773-783) so its metrics see re-rounded values; ours renormalizes in
    float64. Rank-based/argmax metrics are identical; AUC agrees to ~1e-4.
"""
from __future__ import annotations

import re
import shutil
import stat
import types
from pathlib import Path

import numpy as np
import pytest

from tests.reference_shim import (
    build_structural_ampal,
    np_int_alias as _np_int_alias,
    reference_available,
    reference_modules,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)

_FAKE_SCWRL = r'''#!/usr/bin/env python3
import sys

AA31 = {"ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C",
        "GLU": "E", "GLN": "Q", "GLY": "G", "HIS": "H", "ILE": "I",
        "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F", "PRO": "P",
        "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V"}
args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
pdb = open(args["-i"]).read()
seq = open(args["-s"]).read().strip()
keep = {"N", "CA", "C", "O", "CB"}
out, res_i, last = [], -1, None
for line in pdb.splitlines():
    if line.startswith(("ATOM  ", "HETATM")):
        rid = (line[21], line[22:27])
        if rid != last:
            last = rid
            res_i += 1
        aa = AA31.get(line[17:20].strip(), "X")
        if (res_i < len(seq) and seq[res_i] != aa
                and line[12:16].strip() not in keep):
            continue
    out.append(line)
with open(args["-o"], "w") as f:
    # real SCWRL4 output opens with a \r\n-terminated line; the
    # reference's parse_scwrl_out DROPS everything before the first \r\n
    # (scwrl_utils.py:35) — reproduce that shape
    f.write("REMARK  99 FAKE SCWRL PACK\r\n")
    f.write("\n".join(out) + "\n")
print("fake preamble chatter")
print("Total minimal energy of the graph = %s"
      % (-(len(seq) + sum(map(ord, seq)) / 97.0)))
'''


@pytest.fixture(scope="module")
def refana():
    with reference_modules(
        extra_shims=build_structural_ampal(),
        entry_modules=("analyse_rotamers",),
    ) as ns:
        yield ns


@pytest.fixture(scope="module")
def ana_data(tmp_path_factory):
    """PDB mirror (two codes, sharded layout), NEW-format datasetmap, and a
    deterministic 338-class prediction matrix where ~1/3 of positions argmax
    to a rotamer of the CORRECT amino acid (the fake packer keeps those side
    chains, so analysis 2's re-tag is non-trivial) and the rest to a rotamer
    of a different one."""
    from timed_design_tpu.constants import AA3_TO_AA1, ROTAMER_CATEGORIES
    from timed_design_tpu.io.datasetmap import SRB_HEADER
    from timed_design_tpu.structure import load_pdb

    d = tmp_path_factory.mktemp("ana_data")
    mirror = d / "pdb"
    shard = mirror / "ub"
    shard.mkdir(parents=True)
    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    shutil.copy(src, shard / "1ubq.pdb1.gz")
    # a second code with identical coordinates: the reference's datasetmap
    # loader wraps SINGLE-row maps in a way its own main can't index
    # (utils.py:223-225 -> analyse_rotamers.py:41), so production maps
    # always carry 2+ structures — match that shape
    shutil.copy(src, shard / "2ubq.pdb1.gz")

    seq = load_pdb(src).sequence1()
    assert len(seq) == 76
    (d / "datasetmap.txt").write_text(
        SRB_HEADER + f"1ubqA {len(seq)}\n2ubqA {len(seq)}\n"
    )

    by_aa: dict[str, list[int]] = {}
    for j, cat in enumerate(ROTAMER_CATEGORIES):
        by_aa.setdefault(AA3_TO_AA1[cat.split("_")[0]], []).append(j)
    letters = sorted(by_aa)
    rng = np.random.default_rng(5)
    P = rng.random((2 * len(seq), 338))
    for i, real in enumerate(seq + seq):
        if i % 3 == 0:
            cls = int(rng.choice(by_aa[real]))
        else:
            other = letters[(letters.index(real) + 1 + i) % len(letters)]
            if other == real:
                other = letters[(letters.index(real) + 2 + i) % len(letters)]
            cls = int(rng.choice(by_aa[other]))
        P[i, cls] += 3.0
    P /= P.sum(1, keepdims=True)
    matrix = d / "TOYROT_rot.csv"
    np.savetxt(matrix, P, delimiter=",")
    return types.SimpleNamespace(
        dir=d, mirror=mirror, dmap=d / "datasetmap.txt", matrix=matrix,
        seq=seq,
    )


@pytest.fixture()
def fake_scwrl(tmp_path):
    exe = tmp_path / "Scwrl4"
    exe.write_text(_FAKE_SCWRL)
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    return exe


class _InlinePool:
    """starmap-compatible in-process Pool (forking after JAX init is
    unsafe; execution order equals the sequential stream either way)."""

    def __init__(self, processes=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def starmap(self, fn, it):
        return [fn(*args) for args in it]

    def close(self):
        pass


_METRIC_RES = {
    "auc_ovr": r"Metrics AUC_OVR: ([-+0-9.e]+|nan)",
    "auc_ovo": r"Metrics AUC_OVO: ([-+0-9.e]+|nan)",
    "precision": r"Metrics Macro-Precision: ([-+0-9.e]+|nan)",
    "recall": r"Metrics Macro-Recall: ([-+0-9.e]+|nan)",
    "accuracy": r"Accuracy: ([-+0-9.e]+|nan)",
    "accuracy_2": r"accuracy_2: ([-+0-9.e]+|nan)",
    "accuracy_3": r"accuracy_3: ([-+0-9.e]+|nan)",
    "accuracy_4": r"accuracy_4: ([-+0-9.e]+|nan)",
    "accuracy_5": r"accuracy_5: ([-+0-9.e]+|nan)",
}


def _parse_results(path: Path) -> dict[str, float]:
    text = path.read_text()
    out = {}
    for key, pat in _METRIC_RES.items():
        m = re.search(pat, text)
        assert m, (key, path, text[:400])
        out[key] = float(m.group(1))
    return out


def _parse_scores_csv(path: Path) -> tuple[str, dict[str, tuple[str, str]]]:
    lines = path.read_text().splitlines()
    rows = {}
    for line in lines[1:]:
        pdb, a, b = line.split(",")
        rows[pdb] = (a, b)
    return lines[0], rows


def test_analyse_rotamers_pipeline_composed(refana, ana_data, fake_scwrl,
                                            tmp_path, monkeypatch):
    monkeypatch.setattr(refana.analyse, "Pool", _InlinePool)
    plotted: list[str] = []
    monkeypatch.setattr(
        refana.analyse, "create_rot_cm",
        lambda cm, cats, mode, output_path: plotted.append(mode),
    )

    # ---- the reference's own composed main -----------------------------
    ref_base = tmp_path / "ref"
    args = types.SimpleNamespace(
        path_to_pred_matrix=str(ana_data.matrix),
        output_path=str(ref_base),
        path_to_pdb=str(ana_data.mirror),
        path_to_datasetmap=str(ana_data.dmap),
        workers=1,
        support_old_datasetmap=False,
        scwrl_path=str(fake_scwrl),
    )
    with _np_int_alias():
        refana.analyse_rotamers.main(args)
    model = ana_data.matrix.stem  # "TOYROT_rot" (the reference's stem rule)
    ref_out = Path(f"{ref_base}_{model}")
    assert ref_out.is_dir()
    assert len(plotted) == 6  # 3 analyses x (unweighted + weighted)

    # ---- ours ------------------------------------------------------------
    from timed_design_tpu.cli.analyse_rotamers import main as our_main

    our_out = tmp_path / "ours"
    our_main([
        "--path_to_pred_matrix", str(ana_data.matrix),
        "--path_to_datasetmap", str(ana_data.dmap),
        "--path_to_pdb", str(ana_data.mirror),
        "--path_to_output", str(our_out),
        "--path_to_scwrl", str(fake_scwrl),
    ])

    # ---- the three analyses' numbers match ------------------------------
    pairs = [
        (f"results_{model}_vs_wt.txt", "results_wt.txt"),
        (f"results_{model}_vs_scwrl_{model}.txt", "results_scwrl_pred.txt"),
        (f"results_{model}_vs_wt_scwrl.txt", "results_scwrl_real.txt"),
    ]
    for ref_name, our_name in pairs:
        ref_m = _parse_results(ref_out / ref_name)
        our_m = _parse_results(our_out / our_name)
        for key in _METRIC_RES:
            if key.startswith("accuracy"):
                # argmax/top-k are ratios of integer counts over identical
                # rankings — exactly equal
                assert ref_m[key] == our_m[key], (ref_name, key)
            else:
                # AUC/precision/recall see the renormalization-precision
                # deviation (module docstring): the reference re-rounds its
                # correction into float16, ours stays float64
                np.testing.assert_allclose(
                    ref_m[key], our_m[key], rtol=0, atol=2e-4,
                    err_msg=f"{ref_name}:{key}",
                )

    # the fake packer echoes wild-type sequences verbatim, so analysis 3
    # must reproduce analysis 1 EXACTLY on each side — a self-consistency
    # pin that the packed-structure re-tag path really re-reads structures
    assert (
        (ref_out / pairs[0][0]).read_bytes()
        == (ref_out / pairs[2][0]).read_bytes()
    )
    assert (
        (our_out / pairs[0][1]).read_bytes()
        == (our_out / pairs[2][1]).read_bytes()
    )
    # ...while analysis 2 (mutated positions stripped) genuinely differs
    assert (
        (ref_out / pairs[0][0]).read_bytes()
        != (ref_out / pairs[1][0]).read_bytes()
    )

    # ---- scwrl_scores.csv: same numbers, documented header/key naming ---
    ref_header, ref_rows = _parse_scores_csv(ref_out / "scwrl_scores.csv")
    our_header, our_rows = _parse_scores_csv(our_out / "scwrl_scores.csv")
    assert ref_header == "PDB,score_rot,score_real"  # PARITY.md deviation
    assert our_header == "pdb,score_pred,score_real"
    assert sorted(ref_rows) == sorted(our_rows) == ["1ubqA", "2ubqA"]
    for pdb in ref_rows:
        assert ref_rows[pdb] == our_rows[pdb], pdb
    # scores are sequence-dependent: pred (mutated) != real (wild-type)
    assert ref_rows["1ubqA"][0] != ref_rows["1ubqA"][1]

    # ---- packed artifacts + error CSVs -----------------------------------
    for pdb in ("1ubqA", "2ubqA"):
        assert (ref_out / f"{pdb}_{model}.pdb").exists()
        assert (ref_out / f"{pdb}_scwrl.pdb").exists()
        assert (our_out / f"{pdb}__pred.pdb").exists()
        assert (our_out / f"{pdb}__real.pdb").exists()
    assert (ref_out / f"errors_scwrl_{model}.csv").read_text() == ""
    assert (our_out / "errors_scwrl_pred.csv").read_text() == ""

    # both sides' packed-pred structures lost the SAME side chains: re-parse
    # the reference's packed file with our parser and compare atom counts
    from timed_design_tpu.structure import load_pdb

    ref_packed = load_pdb(ref_out / f"1ubqA_{model}.pdb")
    our_packed = load_pdb(our_out / "1ubqA__pred.pdb")
    assert ref_packed.coords.shape == our_packed.coords.shape
    assert ref_packed.coords.shape[0] < load_pdb(
        ana_data.mirror / "ub" / "1ubq.pdb1.gz"
    ).coords.shape[0]


def test_new_datasetmap_real_sequences_rebuilt(refana, ana_data, fake_scwrl,
                                               tmp_path, monkeypatch):
    """The defect this oracle surfaced, pinned at the seam: with a
    NEW-format datasetmap our CLI used to pack EMPTY wild-type sequences
    (decode leaves pdb_to_real_sequence blank for SRB maps) — every
    structure failed the packer's length check and analysis 3 silently
    printed 'skipped'. The reference rebuilds the sequences from the parsed
    assemblies (analyse_rotamers.py:69-71); ours now does the same."""
    from timed_design_tpu.cli.analyse_rotamers import main as our_main

    out = tmp_path / "out"
    our_main([
        "--path_to_pred_matrix", str(ana_data.matrix),
        "--path_to_datasetmap", str(ana_data.dmap),
        "--path_to_pdb", str(ana_data.mirror),
        "--path_to_output", str(out),
        "--path_to_scwrl", str(fake_scwrl),
    ])
    assert (out / "results_scwrl_real.txt").exists()
    _, rows = _parse_scores_csv(out / "scwrl_scores.csv")
    # the packed wild-type sequence is the real 76-residue chain: its score
    # is the fake binary's deterministic function of that sequence
    expected = -(len(ana_data.seq) + sum(map(ord, ana_data.seq)) / 97.0)
    assert float(rows["1ubqA"][1]) == pytest.approx(expected)
