"""Sampler: statistical recovery, temperature semantics, metrics parity.

Modeled on the reference's most substantive tests
(tests/test_sampling_utils.py:31-62, SURVEY.md §4): a 1e6-draw statistical
test that empirical frequencies recover the true distribution, plus
temperature invariants — extended with metrics correctness and the
end-to-end sampling flow.
"""
import jax
import numpy as np
import pytest

from timed_design_tpu.sample import (
    SampleConfig,
    apply_temperature,
    calculate_seq_metrics,
    main_sample,
    sample_all_structures,
    sample_class_indices,
    sample_structure,
)


def test_statistical_recovery():
    """1e6 draws from a known 20-way distribution recover it to 0.01."""
    rng = np.random.default_rng(7)
    p = rng.random(20)
    p /= p.sum()
    probs = np.asarray([p], np.float32)  # one residue
    idx = np.asarray(
        sample_class_indices(jax.random.key(0), probs, 1_000_000)
    ).ravel()
    freq = np.bincount(idx, minlength=20) / idx.size
    np.testing.assert_allclose(freq, p, rtol=0.01, atol=0.01)


def test_temperature_identity_and_limits():
    rng = np.random.default_rng(0)
    p = rng.random((5, 20))
    p /= p.sum(1, keepdims=True)
    # T=1 identity
    np.testing.assert_allclose(apply_temperature(p, 1.0), p, atol=1e-12)
    # T->0 sharpens to argmax with unchanged argmax
    sharp = apply_temperature(p, 0.001)
    np.testing.assert_array_equal(sharp.argmax(1), p.argmax(1))
    np.testing.assert_allclose(sharp.max(1), 1.0, atol=1e-2)
    # T->inf flattens to uniform
    flat = apply_temperature(p, 100.0)
    np.testing.assert_allclose(flat, 1 / 20, atol=3e-3)


def test_metrics_known_values():
    # Glycine dipeptide: MW = 2*57.0519 + water
    _, _, mw, ext = calculate_seq_metrics("GG")
    assert mw == pytest.approx(2 * 57.0519 + 18.01528, abs=0.01)
    assert ext == 0.0
    # Trp/Tyr/Cys extinction (Gill & von Hippel coefficients)
    _, _, _, ext2 = calculate_seq_metrics("WYC")
    assert ext2 == pytest.approx(5690 + 1280 + 120)
    # Charge signs: poly-K positive, poly-D negative at pH 7.4
    ck, pik, _, _ = calculate_seq_metrics("KKKKK")
    cd, pid, _, _ = calculate_seq_metrics("DDDDD")
    assert ck > 3 and cd < -3
    assert pik > 9 and pid < 5
    # neutral peptide pI between
    _, pia, _, _ = calculate_seq_metrics("AAAA")
    assert 5 < pia < 9


def test_pi_is_zero_charge_point():
    """Charge evaluated at the computed pI must be ~0."""
    from timed_design_tpu.sample import sequence_charge, sequence_isoelectric_point

    for seq in ["MKVDEHRWY", "AAKKDD", "GGDDEEKKRR"]:
        pi = sequence_isoelectric_point(seq)
        assert abs(sequence_charge(seq, ph=pi)) < 1e-4


def test_sample_structure_deterministic():
    rng = np.random.default_rng(1)
    p = rng.random((30, 20))
    p /= p.sum(1, keepdims=True)
    s1 = sample_structure(p, 5, jax.random.key(3))
    s2 = sample_structure(p, 5, jax.random.key(3))
    assert s1 == s2  # explicit keys -> reproducible
    s3 = sample_structure(p, 5, jax.random.key(4))
    assert s1 != s3
    assert len(s1) == 5 and len(s1[0][0]) == 30


def test_sample_rotamer_mode():
    """338-class sampling collapses to residues via the codec."""
    p = np.zeros((4, 338))
    p[:, 68] = 1.0  # LYS_1111 -> K
    out = sample_structure(p, 3, jax.random.key(0), rotamer_mode=True)
    assert all(s[0] == "KKKK" for s in out)


def test_main_sample_end_to_end(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    probs = rng.random((10, 20))
    probs /= probs.sum(1, keepdims=True)
    np.savetxt(tmp_path / "TIMED.csv", probs, delimiter=",")
    with open(tmp_path / "TIMED.txt", "w") as f:
        f.write("ignore_uncommon False\ninclude_pdbs\n##########\n1abcA 6\n2xyzB 4\n")
    paths = main_sample(
        SampleConfig(
            path_to_pred_matrix=tmp_path / "TIMED.csv",
            path_to_datasetmap=tmp_path / "TIMED.txt",
            sample_n=7,
            temperature=0.5,
        )
    )
    assert len(paths) == 3
    fasta = (tmp_path / paths[1]).read_text() if not str(paths[1]).startswith("/") else open(paths[1]).read()
    assert fasta.count(">") == 14  # 7 samples x 2 structures
    metrics = open(paths[2]).read().splitlines()
    assert len(metrics) == 15
    assert metrics[0].startswith("pdb,sequence,charge")


def test_temperature_zero_is_argmax():
    """T=0 = deterministic argmax (README.md:203) — must not crash."""
    rng = np.random.default_rng(3)
    p = rng.random((6, 20))
    p /= p.sum(1, keepdims=True)
    out = apply_temperature(p, 0)
    np.testing.assert_array_equal(out.argmax(1), p.argmax(1))
    np.testing.assert_array_equal(out.max(1), 1.0)
    np.testing.assert_array_equal(out.sum(1), 1.0)
    # sampling at T=0 returns the argmax sequence every time
    import jax

    s = sample_structure(p, 3, jax.random.key(0), temperature=0)
    assert s[0][0] == s[1][0] == s[2][0]


def test_main_sample_rotamer_autodetect(tmp_path, monkeypatch):
    """A 338-class matrix without --predict_rotamers auto-enables rotamer
    decoding (used to IndexError deep in decode); a 20-class matrix WITH the
    flag errors clearly (found driving scripts/run_sampling.py on TPU)."""
    import numpy as np

    from timed_design_tpu.sample import SampleConfig, main_sample

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(338), size=6)
    np.savetxt(tmp_path / "m_rot.csv", P, delimiter=",")
    (tmp_path / "m.txt").write_text(
        "ignore_uncommon False\ninclude_pdbs\n##########\n1abcA 6\n"
    )
    paths = main_sample(SampleConfig(
        path_to_pred_matrix=tmp_path / "m_rot.csv",
        path_to_datasetmap=tmp_path / "m.txt",
        sample_n=4, temperature=1.0,
    ))
    assert any(p.endswith(".fasta") for p in paths)

    P20 = rng.dirichlet(np.ones(20), size=6)
    np.savetxt(tmp_path / "m20.csv", P20, delimiter=",")
    import pytest

    with pytest.raises(ValueError, match="20 classes"):
        main_sample(SampleConfig(
            path_to_pred_matrix=tmp_path / "m20.csv",
            path_to_datasetmap=tmp_path / "m.txt",
            sample_n=4, temperature=1.0, predict_rotamers=True,
        ))


def test_sample_all_structures_bucketed():
    """Length-bucketed batched sampling: deterministic by seed, sequences
    trimmed to true lengths, and device metrics equal to metrics recomputed
    from the decoded sequence strings."""
    from timed_design_tpu.sample.metrics import sequence_metrics

    rng = np.random.default_rng(5)
    d = {
        "aaaA": rng.dirichlet(np.ones(20), size=25),   # pads 25 -> 32
        "bbbA": rng.dirichlet(np.ones(20), size=40),   # pads 40 -> 64
        "cccA": rng.dirichlet(np.ones(20), size=33),   # shares the 64 bucket
    }
    out = sample_all_structures(d, n_samples=6, seed=7)
    out2 = sample_all_structures(d, n_samples=6, seed=7)
    assert out == out2  # bitwise reproducible
    assert set(out) == set(d)
    for pdb, samples in out.items():
        assert len(samples) == 6
        for seq, charge, pi, mw, ext in samples:
            assert len(seq) == d[pdb].shape[0]  # padding trimmed
            m_charge, m_pi, m_mw, m_ext = sequence_metrics(seq)
            assert charge == pytest.approx(m_charge, abs=1e-3)
            assert pi == pytest.approx(m_pi, abs=1e-2)
            assert mw == pytest.approx(m_mw, rel=1e-5)
            assert ext == pytest.approx(m_ext, rel=1e-6)


def test_sample_all_structures_statistics():
    """Empirical class frequencies recover the distribution through the
    bucketed path (reference test_sampling_utils.py:31-44 model)."""
    p = np.array([[0.5, 0.3, 0.2] + [0.0] * 17] * 10)
    out = sample_all_structures({"xA": p}, n_samples=4000, seed=0)
    seqs = [s[0] for s in out["xA"]]
    flat = "".join(seqs)
    from timed_design_tpu.constants import AA1

    freq = np.array([flat.count(AA1[i]) / len(flat) for i in range(3)])
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2], atol=0.01)


def test_metrics_skip_unknown_letters():
    """The 'X' placeholder (decode.py emits it for nonstandard residues)
    must degrade sequence metrics, not crash the report/UI tables."""
    import math

    from timed_design_tpu.sample.metrics import sequence_metrics

    assert sequence_metrics("ACDX") == sequence_metrics("ACD")
    assert all(math.isnan(v) for v in sequence_metrics("XXX"))
    assert all(math.isnan(v) for v in sequence_metrics(""))
