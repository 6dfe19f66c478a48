"""Analysis layer: metric parity vs sklearn/scipy, rotamer eval, AF2 eval."""
import numpy as np
import pytest

from timed_design_tpu.analyse import (
    accuracy,
    analyse_refold,
    calculate_metrics,
    calculate_prediction_entropy,
    calculate_rotamer_metrics,
    confusion,
    extract_packdensity_from_structure,
    partition_fastas,
    precision_recall_f1,
    prediction_bias,
    read_fasta,
    renormalize_float16_rows,
    roc_auc_ovo_macro,
    roc_auc_ovr_macro,
    tag_structures_with_rotamers,
    top_k_accuracy,
    structure_packing_density,
)
from timed_design_tpu.structure import load_pdb


@pytest.fixture(scope="module")
def labels_scores():
    rng = np.random.default_rng(0)
    n, c = 400, 7
    y_true = rng.integers(0, c, n)
    scores = rng.random((n, c))
    # make scores informative
    scores[np.arange(n), y_true] += 0.5
    scores /= scores.sum(1, keepdims=True)
    return y_true, scores


def test_metrics_match_sklearn(labels_scores):
    sklearn = pytest.importorskip("sklearn.metrics")
    y_true, scores = labels_scores
    y_pred = scores.argmax(1)
    c = scores.shape[1]
    assert accuracy(y_true, y_pred) == pytest.approx(
        sklearn.accuracy_score(y_true, y_pred)
    )
    for k in (2, 3):
        assert top_k_accuracy(y_true, scores, k) == pytest.approx(
            sklearn.top_k_accuracy_score(y_true, scores, k=k, labels=range(c))
        )
    prec, rec, _, _ = precision_recall_f1(y_true, y_pred, c)
    assert prec.mean() == pytest.approx(
        sklearn.precision_score(y_true, y_pred, average="macro", zero_division=0)
    )
    assert rec.mean() == pytest.approx(
        sklearn.recall_score(y_true, y_pred, average="macro", zero_division=0)
    )
    np.testing.assert_allclose(
        confusion(y_true, y_pred, c, normalize="all"),
        sklearn.confusion_matrix(y_true, y_pred, normalize="all", labels=range(c)),
        atol=1e-12,
    )
    assert roc_auc_ovo_macro(y_true, scores) == pytest.approx(
        sklearn.roc_auc_score(y_true, scores, multi_class="ovo",
                              labels=range(c), average="macro"), abs=1e-9
    )
    assert roc_auc_ovr_macro(y_true, scores) == pytest.approx(
        sklearn.roc_auc_score(y_true, scores, multi_class="ovr",
                              labels=range(c), average="macro"), abs=1e-9
    )


def test_entropy_matches_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(1)
    P = rng.random((50, 20))
    P /= P.sum(1, keepdims=True)
    np.testing.assert_allclose(
        calculate_prediction_entropy(P),
        scipy_stats.entropy(P, base=2, axis=1),
        atol=1e-10,
    )


def test_prediction_bias():
    y_true = np.array([0, 0, 1, 1])
    y_pred = np.array([0, 0, 0, 1])
    b = prediction_bias(y_true, y_pred, ["A", "C"])
    assert b["A"] == pytest.approx(0.25)
    assert b["C"] == pytest.approx(-0.25)


def test_calculate_metrics_end_to_end():
    m = calculate_metrics(
        {"1abcA": "MKVA", "2xyz": "GGGG"},
        {"1abcA": "MKVC", "2xyz": "GGGG"},
    )
    assert m["accuracy_1"] == pytest.approx(7 / 8)
    # top-k on one-hot predictions is tie-inflated (zero-score classes rank
    # by index) — same artifact as the reference's accuracy_2..5 on one-hots
    assert m["accuracy_5"] >= m["accuracy_1"]
    assert "report" in m and m["unweighted_cm"].shape == (20, 20)


def test_renormalize_float16_rows():
    rng = np.random.default_rng(2)
    P = rng.random((10, 338))
    P /= P.sum(1, keepdims=True)
    P16 = P.astype(np.float16).astype(np.float64)
    fixed = renormalize_float16_rows(P16)
    np.testing.assert_allclose(fixed.sum(1), 1.0, atol=2e-5)


def test_rotamer_metrics_on_1ubq(ubq_pdb_gz, tmp_path):
    """End-to-end rotamer evaluation: tag 1ubq, score a near-perfect
    predictor against the crystal rotamers."""
    tags, assemblies = tag_structures_with_rotamers({"1ubq": ubq_pdb_gz})
    assert "1ubqA" in tags and len(tags["1ubqA"]) == 76
    truth = np.array(tags["1ubqA"], float)
    # synthetic predictions: 90% mass on truth, rest spread
    P = np.full((76, 338), 0.1 / 337)
    P[np.arange(76), truth.astype(int)] = 0.9
    m = calculate_rotamer_metrics(
        {"1ubqA": P}, tags, suffix="test", output_path=tmp_path
    )
    assert m["accuracy"] == 1.0
    assert m["auc_ovo"] > 0.99
    assert (tmp_path / "results_test.txt").exists()


def test_packing_density_1ubq(ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    dens = structure_packing_density(s)
    assert dens.shape[0] == s.coords.shape[0]
    assert dens.min() >= 0 and dens.max() < 200
    per_res = extract_packdensity_from_structure(s, atom_filter="ca")
    assert len(per_res) == 76
    assert all(v > 0 for v in per_res)
    # buried residues denser than termini
    assert np.mean(per_res) > per_res[-1] * 0.5


def test_refold_analysis_identity(ubq_pdb_gz):
    r = analyse_refold(ubq_pdb_gz, ubq_pdb_gz, "self")
    assert r.rmsd == pytest.approx(0.0, abs=1e-6)
    assert all(v == 1.0 for v in r.gdt.values())


def test_fasta_partition(tmp_path):
    fasta = tmp_path / "all.fasta"
    fasta.write_text("".join(f">d{i}\nMKV\n" for i in range(7)))
    folders = partition_fastas(fasta, tmp_path / "jobs", per_folder=3)
    assert len(folders) == 3
    assert len(list(folders[0].glob("*.fasta"))) == 3
    assert len(list(folders[2].glob("*.fasta"))) == 1
    rec = read_fasta(folders[0] / "d0.fasta")
    assert rec == {"d0": "MKV"}


def test_packing_density_reference_compat_ewm(ubq_pdb_gz):
    """reference_compat=True reproduces the reference's running-(acc+b)/2
    accumulation (analyse_utils.py:149-234); default is the arithmetic mean.
    Decision recorded in PARITY.md §Deviations."""
    from timed_design_tpu.analyse.structure_analysis import (
        extract_packdensity_from_structure,
    )
    from timed_design_tpu.structure import load_pdb

    s = load_pdb(ubq_pdb_gz)
    mean = extract_packdensity_from_structure(s, atom_filter="backbone")
    ewm = extract_packdensity_from_structure(
        s, atom_filter="backbone", reference_compat=True
    )
    assert len(mean) == len(ewm) == 76
    # CA-only filter: one atom per residue, the two aggregations coincide
    ca_a = extract_packdensity_from_structure(s, atom_filter="ca")
    ca_b = extract_packdensity_from_structure(
        s, atom_filter="ca", reference_compat=True
    )
    assert ca_a == ca_b
    # multi-atom filters differ (EWM overweights later atoms)...
    assert mean != ewm
    # ...and the EWM matches an explicit reimplementation on residue 0
    import numpy as np

    from timed_design_tpu.analyse.structure_analysis import (
        structure_packing_density,
    )

    dens = structure_packing_density(s)
    sel = s.res_index == 0
    keep = np.isin(s.atom_names[sel], ["N", "CA", "C", "O"])
    vals = dens[sel][keep]
    acc = float(vals[0])
    for v in vals[1:]:
        acc = (acc + float(v)) / 2
    assert ewm[0] == acc


def test_analyse_cherrypicked(ubq_pdb_gz, tmp_path):
    """Cherry-picked-design analysis on synthetic refold outputs: two
    'models' refold 1ubq (one translated+rotated — RMSD 0 after alignment;
    one CA-perturbed), plus saved prediction CSVs feeding entropy traces
    (reference scripts/analyse_cherrypicked_samples_af2.py)."""
    import gzip

    import numpy as np

    from timed_design_tpu.analyse import analyse_cherrypicked
    from timed_design_tpu.io import save_prediction_csv, save_srb_datasetmap
    from timed_design_tpu.io.h5frames import create_flat_dataset_map  # noqa: F401
    from timed_design_tpu.structure import load_pdb

    body = gzip.decompress(ubq_pdb_gz.read_bytes()).decode()

    def perturb(text, shift):
        out = []
        for line in text.splitlines():
            if line.startswith(("ATOM", "HETATM")):
                x = float(line[30:38]) + shift
                line = line[:30] + f"{x:8.3f}" + line[38:]
            out.append(line)
        return "\n".join(out) + "\n"

    af2 = tmp_path / "af2"
    for model, shift in (("TIMED", 10.0), ("ProDCoNN", 0.0)):
        d = af2 / model
        d.mkdir(parents=True)
        (d / "1ubq_ranked_0.pdb").write_text(perturb(body, shift))
    # jitter ProDCoNN's CAs so its RMSD is > 0
    p = af2 / "ProDCoNN" / "1ubq_ranked_0.pdb"
    lines = []
    rng = np.random.default_rng(0)
    for line in p.read_text().splitlines():
        if line.startswith("ATOM") and line[12:16].strip() == "CA":
            y = float(line[38:46]) + rng.normal(0, 0.3)
            line = line[:38] + f"{y:8.3f}" + line[46:]
        lines.append(line)
    p.write_text("\n".join(lines) + "\n")

    # prediction outputs for the entropy trace
    preds = tmp_path / "preds"
    preds.mkdir()
    probs = rng.dirichlet(np.ones(20), size=76)
    save_prediction_csv(probs, "TIMED", preds, float16=False)
    from timed_design_tpu.io import DatasetMap

    dmap = DatasetMap(entries=[("1ubq", "A", str(i + 1), "ALA")
                               for i in range(76)])
    save_srb_datasetmap(dmap, "TIMED", preds)

    ref_plain = tmp_path / "1ubq.pdb"
    ref_plain.write_text(body)
    result = analyse_cherrypicked(
        ref_plain, af2, pred_folder=preds, output_dir=tmp_path / "out"
    )
    assert result["models"] == ["ProDCoNN", "TIMED"]
    # pure translation aligns exactly; jittered CAs do not
    assert result["rmsd"]["TIMED"] == pytest.approx(0.0, abs=1e-4)
    assert 0.05 < result["rmsd"]["ProDCoNN"] < 1.0
    pp = result["per_position"]
    assert pp["ca_deviation"].shape == (2, 76)
    assert pp["plddt"].shape == (2, 76)
    # entropy present for TIMED (has csv+txt), NaN for ProDCoNN (absent)
    e = pp["entropy"]
    assert np.isfinite(e[result["models"].index("TIMED")]).all()
    assert np.isnan(e[result["models"].index("ProDCoNN")]).all()
    out = tmp_path / "out"
    assert (out / "1ubq_ca_deviation.png").exists()
    assert (out / "1ubq_entropy.png").exists()
    assert (out / "1ubq_cherrypicked.csv").exists()


def test_calculate_metrics_true_topk_with_probabilities():
    """With probability rows, accuracy_2..5 are true top-k; without them
    the reference's one-hot form is kept (argmax ties broken toward class
    0/'A' — meaningless beyond rank 1, documented)."""
    import numpy as np

    from timed_design_tpu.analyse import calculate_metrics

    # 4 residues; model ranks the true residue 2nd every time
    real = "MKYW"
    pred = "AAAA"  # argmax always A (wrong)
    P = np.full((4, 20), 1e-6)
    from timed_design_tpu.constants import AA1_TO_INT

    for i, r in enumerate(real):
        P[i, AA1_TO_INT["A"]] = 0.6  # rank 1: A
        P[i, AA1_TO_INT[r]] = 0.3    # rank 2: the true residue
    m = calculate_metrics({"x": pred}, {"x": real}, {"x": P})
    assert m["accuracy_1"] == 0.0
    assert m["accuracy_2"] == 1.0
    assert m["accuracy_5"] == 1.0
    # one-hot fallback: sklearn's tie-break ranks the HIGHEST-index zero
    # class ('Y') at rank 2 after the argmax (pinned vs the executed
    # reference, test_reference_oracle.py), so only the 'Y' row of
    # M/K/Y/W scores at k=2
    m0 = calculate_metrics({"x": pred}, {"x": real})
    assert m0["accuracy_2"] == 0.25
    # misaligned probabilities must fail loudly
    import pytest

    with pytest.raises(ValueError, match="align"):
        calculate_metrics({"x": pred}, {"x": real}, {"x": P[:2]})
    # a probability dict missing a scored pdb must raise a descriptive
    # ValueError, not a bare KeyError (sequences_to_labels skips mismatched
    # structures gracefully; the probability path must not crash opaquely)
    with pytest.raises(ValueError, match="missing an entry for 'x'"):
        calculate_metrics({"x": pred}, {"x": real}, {"other": P})
