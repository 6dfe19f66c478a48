"""Execute the reference's COMPOSED pipelines end-to-end as oracles.

The function-level oracle (tests/test_reference_oracle.py) proves every
seam matches; this module runs the reference's actual `predict.
load_dataset_and_predict` (/root/reference/predict.py:28-194) and
`sample.main_sample` (/root/reference/sample.py:19-93) from start to
finish on a toy dataset and BYTE-DIFFS the complete artifact trees
against our engine/CLI — composition bugs (batch append ordering, the
float16 CSV round-trip feeding the decode, consensus accumulation,
resume stitching) are exactly what function-level oracles cannot see.

Two boundaries are faked identically on both sides, by necessity:

* the device boundary — `tf.keras.models.load_model` returns a toy model
  whose ``predict`` is an exact table lookup keyed by an ID voxel stored
  in each frame (frame[0,0,0,0]); our engine gets the same table as an
  injected module. Both sides therefore emit bit-identical probabilities
  and the diff isolates the PIPELINE. (The real-model forward is
  separately parity-tested: tests/test_keras_import*.py against live TF,
  and tests/test_engine_keras.py.)
* the process boundary — the reference's `multiprocessing.Pool` is
  replaced by an inline executor (same starmap semantics) so its global-
  numpy-RNG draws are a single reproducible stream (forking a process
  that has initialized JAX is unsafe, and the stream equals sequential
  execution either way).

Everything else that runs is the reference's own code, unpatched
(except ``np.int`` -> ``int``: numpy>=1.24 removed the alias the
reference uses at utils.py:369).

Documented deviations (PARITY.md §Deviations) assert their exact
expected difference instead of byte-equality: the `{model_name}_rot.csv`
literal filename (predict.py:123) and the SRB `_1..` state keys
(utils.py:552-554).
"""
from __future__ import annotations

import contextlib
import os
import types
from pathlib import Path

import h5py
import numpy as np
import pytest

from tests.reference_shim import (
    TableModule as _TableModule,
    make_table as _make_table,
    np_int_alias as _np_int_alias,
    reference_available,
    reference_modules,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not available"
)

V = 9  # toy frame edge (both pipelines read frame_dims from the file)
N_CH = 5


# --------------------------------------------------------------- toy models
class _FakeKerasModel:
    """Reference-side stand-in for a loaded Keras model: exact table lookup
    on the ID voxel (frame[0,0,0,0]) — pure numpy, bit-reproducible."""

    def __init__(self, table: np.ndarray):
        self.table = np.asarray(table, np.float32)

    def predict(self, X):  # noqa: N803 (keras surface)
        X = np.asarray(X)
        ids = X[:, 0, 0, 0, 0].astype(np.int64) % len(self.table)
        return self.table[ids]


def _build_fake_tf(tables_by_stem: dict[str, np.ndarray]) -> dict:
    """sys.modules entries for the surface predict.py touches:
    ``import tensorflow as tf`` + tf.keras.{utils,models} +
    ``from tensorflow.python.keras.metrics import top_k_categorical_accuracy``
    (predict.py:6-8, 88, 121)."""
    tf = types.ModuleType("tensorflow")
    py = types.ModuleType("tensorflow.python")
    pk = types.ModuleType("tensorflow.python.keras")
    pkm = types.ModuleType("tensorflow.python.keras.metrics")
    pkm.top_k_categorical_accuracy = lambda y_true, y_pred, k=5: 0.0
    custom: dict = {}
    tf.python = py
    py.keras = pk
    pk.metrics = pkm
    tf.keras = types.SimpleNamespace(
        utils=types.SimpleNamespace(get_custom_objects=lambda: custom),
        models=types.SimpleNamespace(
            load_model=lambda p: _FakeKerasModel(tables_by_stem[Path(p).stem])
        ),
    )
    return {
        "tensorflow": tf,
        "tensorflow.python": py,
        "tensorflow.python.keras": pk,
        "tensorflow.python.keras.metrics": pkm,
    }


# --------------------------------------------------------------- toy dataset
def _write_tree_h5(path: Path, structures) -> Path:
    """aposteriori-schema tree HDF5 (utils.py:238-251). ``structures``:
    [(pdb, {chain: [(rid, label3, frame_id), ...]}), ...]. The frame_id is
    stored in the ID voxel so both pipelines' model stand-ins emit the same
    probability row for the same residue regardless of traversal code."""
    from timed_design_tpu.constants import AA3, AA3_TO_INT

    with h5py.File(path, "w") as f:
        f.attrs["make_frame_dataset_ver"] = "2.0.0"
        f.attrs["frame_dims"] = (V, V, V, N_CH)
        f.attrs["atom_encoder"] = ["C", "N", "O", "CA", "CB"]
        f.attrs["encode_cb"] = True
        f.attrs["atom_filter_fn"] = "backbone"
        f.attrs["residue_encoder"] = list(AA3)
        f.attrs["frame_edge_length"] = 21.0
        f.attrs["voxels_as_gaussian"] = True
        for pdb, chains in structures:
            g = f.create_group(pdb)
            for chain, residues in chains.items():
                c = g.create_group(chain)
                for rid, label, fid in residues:
                    frame = np.zeros((V, V, V, N_CH), np.float32)
                    frame[0, 0, 0, 0] = fid
                    frame[1, 1, 1, 1] = 0.5  # non-trivial content elsewhere
                    d = c.create_dataset(str(rid), data=frame)
                    d.attrs["label"] = label
                    onehot = np.zeros(20, np.float64)
                    onehot[AA3_TO_INT[label]] = 1.0
                    d.attrs["encoded_residue"] = onehot
    return path


def _residues(rids, labels, first_id):
    from timed_design_tpu.constants import AA3

    return [
        (rid, AA3[lab % 20], first_id + i)
        for i, (rid, lab) in enumerate(zip(rids, labels))
    ]


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_data")
    # 17 residues -> 3 batches of 8 with a partial final batch
    sc20 = _write_tree_h5(
        d / "sc20.hdf5",
        [
            ("1abc", {
                "A": _residues(range(1, 8), range(0, 7), 0),
                "B": _residues(range(1, 6), range(3, 8), 7),
            }),
            ("3xyz", {"A": _residues(range(2, 7), range(10, 15), 12)}),
        ],
    )
    # same 3xyz rows (same frame IDs) without 1abc — the blacklist oracle
    pruned = _write_tree_h5(
        d / "pruned.hdf5",
        [("3xyz", {"A": _residues(range(2, 7), range(10, 15), 12)})],
    )
    # two NMR states, single chain (multi-chain consensus is a documented
    # reference bug our engine fixes — PARITY.md)
    nmr = _write_tree_h5(
        d / "nmr.hdf5",
        [
            ("2nmr_0", {"A": _residues(range(1, 7), range(2, 8), 100)}),
            ("2nmr_1", {"A": _residues(range(1, 7), range(5, 11), 106)}),
        ],
    )
    return types.SimpleNamespace(dir=d, sc20=sc20, pruned=pruned, nmr=nmr)


TABLES = {
    "TOY_A": _make_table(1, 20),
    "TOY_B": _make_table(2, 20),
    "TOYROT": _make_table(3, 338),
}


@pytest.fixture(scope="module")
def refpipe(tmp_path_factory):
    """Reference predict/sample modules under table shims + the fake tf.

    Imported while chdir'd into a dedicated directory: the reference's
    writers bind ``Path.cwd()`` as a default AT IMPORT TIME
    (utils.py:596, predict.py:181-184), so the consensus fasta lands
    there — the test reads it back from ``ns.bind_cwd``."""
    bind_cwd = tmp_path_factory.mktemp("ref_bind_cwd")
    stack = contextlib.ExitStack()
    old = os.getcwd()
    os.chdir(bind_cwd)
    try:
        ns = stack.enter_context(
            reference_modules(
                extra_shims=_build_fake_tf(TABLES),
                entry_modules=("predict", "sample"),
            )
        )
    finally:
        os.chdir(old)
    ns.bind_cwd = bind_cwd
    yield ns
    stack.close()


# --------------------------------------------------------------- helpers
def _run_reference_predict(ns, dataset, out, model_stems, **kw):
    out.mkdir(parents=True, exist_ok=True)
    with _np_int_alias(), contextlib.chdir(out):
        return ns.predict.load_dataset_and_predict(
            [Path(f"{stem}.h5") for stem in model_stems],
            dataset,
            batch_size=kw.pop("batch_size", 8),
            start_batch=kw.pop("start_batch", 0),
            dataset_map_path=kw.pop(
                "dataset_map_path", out / "datasetmap.txt"
            ),
            path_to_output=out,
            **kw,
        )


def _run_our_predict(dataset, out, model_stems, **kw):
    from timed_design_tpu.engine import load_dataset_and_predict

    out.mkdir(parents=True, exist_ok=True)
    models = [(_TableModule(TABLES[stem], stem), {}) for stem in model_stems]
    return load_dataset_and_predict(
        models,
        dataset,
        batch_size=kw.pop("batch_size", 8),
        start_batch=kw.pop("start_batch", 0),
        dataset_map_path=kw.pop("dataset_map_path", out / "datasetmap.txt"),
        path_to_output=out,
        **kw,
    )


def _assert_files_equal(ref_dir: Path, our_dir: Path, names, rename=None):
    """Byte-diff ``names`` across the two trees; ``rename`` maps a
    reference filename to ours where a deviation is documented."""
    rename = rename or {}
    for name in names:
        ref_f = Path(ref_dir) / name
        our_f = Path(our_dir) / rename.get(name, name)
        assert ref_f.exists(), f"reference did not write {name}"
        assert our_f.exists(), f"we did not write {rename.get(name, name)}"
        ref_b, our_b = ref_f.read_bytes(), our_f.read_bytes()
        assert ref_b == our_b, (
            f"{name}: {len(ref_b)}B (reference) != {len(our_b)}B (ours); "
            f"first divergence at byte "
            f"{next((i for i, (a, b) in enumerate(zip(ref_b, our_b)) if a != b), min(len(ref_b), len(our_b)))}"
        )


BASE_20 = ["encoded_labels.csv", "datasetmap.txt", "dataset.fasta"]


# ------------------------------------------------------------------- tests
def test_predict_20class_multimodel_bytediff(refpipe, datasets, tmp_path):
    """Two models over three batches (partial final): the complete artifact
    tree byte-matches — per-model float16 CSVs, labels, datasetmap, SRB
    maps, fastas from the f16-roundtrip decode."""
    ref_out, our_out = tmp_path / "ref", tmp_path / "ours"
    _run_reference_predict(refpipe, datasets.sc20, ref_out, ["TOY_A", "TOY_B"])
    _run_our_predict(datasets.sc20, our_out, ["TOY_A", "TOY_B"])
    _assert_files_equal(
        ref_out,
        our_out,
        BASE_20
        + ["TOY_A.csv", "TOY_B.csv", "TOY_A.txt", "TOY_B.txt",
           "TOY_A.fasta", "TOY_B.fasta"],
    )


def test_predict_rotamer_mode_bytediff(refpipe, datasets, tmp_path):
    """338-class mode: the raw full-precision rotamer matrix, the argmax-
    collapsed 20-class one-hot CSV, and the fasta decoded from the float16
    round-trip of the 338 matrix (predict.py:143-149,163) all match. The
    reference emits the rotamer CSV under the literal filename
    '{model_name}_rot.csv' (missing f-prefix, predict.py:123); ours under
    the interpolated name its own downstream scripts expect (PARITY.md)."""
    ref_out, our_out = tmp_path / "ref", tmp_path / "ours"
    _run_reference_predict(
        refpipe, datasets.sc20, ref_out, ["TOYROT"], predict_rotamers=True
    )
    _run_our_predict(
        datasets.sc20, our_out, ["TOYROT"], predict_rotamers=True
    )
    _assert_files_equal(
        ref_out,
        our_out,
        BASE_20
        + ["TOYROT.csv", "TOYROT.txt", "TOYROT.fasta",
           "{model_name}_rot.csv"],
        rename={"{model_name}_rot.csv": "TOYROT_rot.csv"},
    )


def test_predict_nmr_consensus_bytediff(refpipe, datasets, tmp_path):
    """NMR consensus (is_consensus=True): per-state fastas, the (prev+cur)/2
    consensus probabilities (utils.py:694-721), the consensus fasta (the
    reference writes it to its import-time CWD — predict.py:181-184), and
    the consensus CSV (runtime CWD, utils.py:586-588). The SRB map pins the
    documented deviation: the reference's '_0' substring test leaves state
    _1 under a chainless key (utils.py:552-554); ours groups all states
    under one pdb+chain key."""
    ref_out, our_out = tmp_path / "ref", tmp_path / "ours"
    _run_reference_predict(
        refpipe, datasets.nmr, ref_out, ["TOY_A"], is_consensus=True
    )
    _run_our_predict(datasets.nmr, our_out, ["TOY_A"], is_consensus=True)
    _assert_files_equal(
        ref_out,
        our_out,
        BASE_20 + ["TOY_A.csv", "TOY_A.fasta", "TOY_A_consensus.txt",
                   "TOY_A_consensus.csv"],
    )
    # consensus fasta: the reference binds Path.cwd() at import time
    ref_fasta = (refpipe.bind_cwd / "TOY_A_consensus.fasta").read_bytes()
    assert ref_fasta == (our_out / "TOY_A_consensus.fasta").read_bytes()
    # SRB deviation, pinned exactly (PARITY.md "SRB datasetmap NMR state strip")
    ref_srb = (ref_out / "TOY_A.txt").read_text().splitlines()
    our_srb = (our_out / "TOY_A.txt").read_text().splitlines()
    assert ref_srb[:3] == our_srb[:3]  # header
    assert ref_srb[3:] == ["2nmrA 6", "2nmr_1 6"]
    assert our_srb[3:] == ["2nmrA 12"]


def test_predict_blacklist(refpipe, datasets, tmp_path):
    """Blacklist: the reference REFUSES a dataset containing blacklisted
    structures (create_flat_dataset_map raises, utils.py:401-405 — predict.py
    never passes remove_blacklist_silently); our engine filters them with a
    warning. Equivalence proof: our filtered run over the full dataset byte-
    matches the reference run over a pre-pruned dataset with identical
    frames."""
    bl = tmp_path / "blacklist"
    bl.mkdir()
    # two rows: the reference's genfromtxt returns a 0-d array for a
    # single-line file and crashes its own loop (utils.py:309-311)
    (bl / "training_set.txt").write_text("1abcA\n9zzzB\n")

    with pytest.raises(ValueError, match="1abc"):
        _run_reference_predict(
            refpipe, datasets.sc20, tmp_path / "ref_fail", ["TOY_A"],
            blacklist=bl,
        )

    ref_out, our_out = tmp_path / "ref", tmp_path / "ours"
    _run_reference_predict(refpipe, datasets.pruned, ref_out, ["TOY_A"])
    with pytest.warns(UserWarning, match="1abc"):
        _run_our_predict(datasets.sc20, our_out, ["TOY_A"], blacklist=bl)
    _assert_files_equal(
        ref_out, our_out,
        BASE_20 + ["TOY_A.csv", "TOY_A.txt", "TOY_A.fasta"],
    )


def test_predict_start_batch_resume_bytediff(refpipe, datasets, tmp_path):
    """--start_batch resume: both pipelines resume a 'crashed after batch 0'
    state (8 of 17 rows in the append-mode CSVs) and reproduce the golden
    full run byte-for-byte — appends, the read-back of the full matrix for
    decoding (predict.py:163), and the fasta regeneration."""
    golden = tmp_path / "golden"
    _run_reference_predict(refpipe, datasets.sc20, golden, ["TOY_A"])

    def _prepare_crashed(dst: Path):
        dst.mkdir()
        for name, rows in (("TOY_A.csv", 8), ("encoded_labels.csv", 8)):
            lines = (golden / name).read_bytes().splitlines(keepends=True)
            (dst / name).write_bytes(b"".join(lines[:rows]))
        (dst / "datasetmap.txt").write_bytes(
            (golden / "datasetmap.txt").read_bytes()
        )

    ref_resume, our_resume = tmp_path / "ref_resume", tmp_path / "ours_resume"
    _prepare_crashed(ref_resume)
    _prepare_crashed(our_resume)
    _run_reference_predict(
        refpipe, datasets.sc20, ref_resume, ["TOY_A"], start_batch=1,
        dataset_map_path=ref_resume / "datasetmap.txt",
    )
    _run_our_predict(
        datasets.sc20, our_resume, ["TOY_A"], start_batch=1,
        dataset_map_path=our_resume / "datasetmap.txt",
    )
    names = BASE_20 + ["TOY_A.csv", "TOY_A.txt", "TOY_A.fasta"]
    _assert_files_equal(golden, ref_resume, names)
    _assert_files_equal(golden, our_resume, names)


class _InlinePool:
    """Pool stand-in: same starmap surface, in-process execution (a single
    sequential RNG stream; forking after JAX init is unsafe)."""

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


def test_sample_pipeline_bytediff(refpipe, datasets, tmp_path, monkeypatch):
    """The reference's composed main_sample (sample.py:19-93): float64 CSV
    load -> temperature -> decode -> per-structure inverse-CDF draws ->
    metrics -> fasta/json/metrics-CSV writers, byte-diffed against our
    composed equivalents fed the SAME uniform stream. The PRNG seam is
    bridged (our production sampler keys a JAX PRNG by design — the
    reference's --seed is dead code, sample.py:21, PARITY.md); per-draw
    semantics on shared uniforms are oracle-matched in
    test_reference_oracle.py. Metric VALUES are computed by our functions
    on both sides (ampal absent — shimmed), so their equality is
    structural, not evidential; the f-string/json serialization paths ARE
    the reference's."""
    golden = tmp_path / "golden"
    _run_reference_predict(refpipe, datasets.sc20, golden, ["TOY_A"])

    monkeypatch.setattr(refpipe.sampling, "Pool", _InlinePool)
    args = types.SimpleNamespace(
        seed=42,
        path_to_pred_matrix=golden / "TOY_A.csv",
        path_to_datasetmap=golden / "datasetmap.txt",
        temperature=0.5,
        predict_rotamers=False,
        sample_n=3,
        workers=1,
        save_as="all",
        support_old_datasetmap=True,
    )
    ref_cwd = tmp_path / "ref_sample"
    ref_cwd.mkdir()
    with contextlib.chdir(ref_cwd):
        np.random.seed(1234)  # the stream the Pool draws from
        refpipe.sample.main_sample(args)

    # ---- ours: same composition, same uniforms ----
    from timed_design_tpu.constants import AA1, ROTAMER_CATEGORIES  # noqa: F401
    from timed_design_tpu.io import (
        extract_sequences,
        load_datasetmap,
        load_prediction_matrix,
    )
    from timed_design_tpu.io.writers import save_sampled
    from timed_design_tpu.sample.metrics import calculate_seq_metrics
    from timed_design_tpu.sample.sampler import apply_temperature

    probs = load_prediction_matrix(golden / "TOY_A.csv", dtype=np.float64)
    probs = apply_temperature(probs, 0.5)
    dmap = load_datasetmap(golden / "datasetmap.txt", is_old=True)
    decoded = extract_sequences(dmap, probs)
    aa = np.array(list(AA1))
    np.random.seed(1234)
    pdb_to_sample: dict[str, list[tuple]] = {}
    for pdb, p in decoded.pdb_to_probability.items():
        p = np.asarray(p)
        rows = []
        for _ in range(3):
            u = np.random.rand(p.shape[0])[:, None]
            idx = (p.cumsum(axis=1) > u).argmax(axis=1)
            seq = "".join(aa[idx])
            rows.append((seq, *calculate_seq_metrics(seq)))
        pdb_to_sample[pdb] = rows
    our_cwd = tmp_path / "our_sample"
    our_cwd.mkdir()
    with contextlib.chdir(our_cwd):
        save_sampled(
            pdb_to_sample, filename="TOY_A_temp_0.5_n_3_1abcA", mode="all"
        )

    names = [
        "TOY_A_temp_0.5_n_3_1abcA.json",
        "TOY_A_temp_0.5_n_3_1abcA.fasta",
        "TOY_A_temp_0.5_n_3_1abcA_metrics.csv",
    ]
    _assert_files_equal(ref_cwd, our_cwd, names)


def test_sample_production_path_structure(refpipe, datasets, tmp_path, monkeypatch):
    """Our PRODUCTION sampler (device draws, JAX PRNG) against the executed
    reference run: identical artifact names, fasta header sets, json keys,
    metrics header/row count, and per-value numeric closeness of the
    metric COLUMNS' ranges (sequences legitimately differ — independent
    PRNG streams by design)."""
    golden = tmp_path / "golden"
    _run_reference_predict(refpipe, datasets.sc20, golden, ["TOY_A"])

    monkeypatch.setattr(refpipe.sampling, "Pool", _InlinePool)
    args = types.SimpleNamespace(
        seed=42,
        path_to_pred_matrix=golden / "TOY_A.csv",
        path_to_datasetmap=golden / "datasetmap.txt",
        temperature=1.0,
        predict_rotamers=False,
        sample_n=4,
        workers=1,
        save_as="all",
        support_old_datasetmap=True,
    )
    ref_cwd = tmp_path / "ref_sample"
    ref_cwd.mkdir()
    with contextlib.chdir(ref_cwd):
        np.random.seed(7)
        refpipe.sample.main_sample(args)

    from timed_design_tpu.sample import SampleConfig, main_sample

    our_cwd = tmp_path / "our_sample"
    our_cwd.mkdir()
    with contextlib.chdir(our_cwd):
        main_sample(
            SampleConfig(
                path_to_pred_matrix=golden / "TOY_A.csv",
                path_to_datasetmap=golden / "datasetmap.txt",
                sample_n=4,
                temperature=1.0,
                support_old_datasetmap=True,
                seed=42,
            )
        )

    ref_files = sorted(p.name for p in ref_cwd.iterdir())
    our_files = sorted(p.name for p in our_cwd.iterdir())
    assert ref_files == our_files
    stem = "TOY_A_temp_1.0_n_4_1abcA"
    for name in ref_files:
        assert name.startswith(stem)

    def _headers(d):
        return sorted(
            line for line in (d / f"{stem}.fasta").read_text().splitlines()
            if line.startswith(">")
        )

    assert _headers(ref_cwd) == _headers(our_cwd)
    import json

    ref_json = json.loads((ref_cwd / f"{stem}.json").read_text())
    our_json = json.loads((our_cwd / f"{stem}.json").read_text())
    assert sorted(ref_json) == sorted(our_json)
    for pdb in ref_json:
        assert len(ref_json[pdb]) == len(our_json[pdb]) == 4
        for r, o in zip(ref_json[pdb], our_json[pdb]):
            assert len(r[0]) == len(o[0])  # sequence lengths
            # the DRAWS are independent streams by design, so values differ;
            # both must be finite and physically plausible (mw ~ 110/res)
            for row in (r, o):
                charge, iso, mw, ext = row[1:]
                assert np.isfinite([charge, iso, mw, ext]).all()
                assert 0 < iso < 14
                assert 0.5 * 110 * len(row[0]) < mw < 2.5 * 110 * len(row[0])
                assert ext >= 0
    ref_csv = (ref_cwd / f"{stem}_metrics.csv").read_text().splitlines()
    our_csv = (our_cwd / f"{stem}_metrics.csv").read_text().splitlines()
    assert ref_csv[0] == our_csv[0]
    assert len(ref_csv) == len(our_csv)
