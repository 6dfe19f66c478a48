"""Engine: end-to-end prediction pipeline on the 1ubq fixture.

This is the minimum end-to-end slice (SURVEY.md §7 step 3): HDF5 frames ->
jitted CNN -> probability CSV + fasta, with the full reference artifact set.
Runs on the 8-virtual-device CPU mesh so batch sharding is exercised.
"""
from pathlib import Path

import numpy as np
import pytest

from timed_design_tpu.engine import (
    Predictor,
    load_dataset_and_predict,
    predict_structure,
)
from timed_design_tpu.io import load_prediction_matrix
from timed_design_tpu.voxel import make_frame_dataset


@pytest.fixture(scope="module")
def ubq_h5(tmp_path_factory):
    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    out = tmp_path_factory.mktemp("h5") / "data.hdf5"
    return make_frame_dataset([src], out, codec="CNOCACB")


def test_predictor_batching_and_sharding():
    """Padding + mesh sharding give identical results to a plain forward."""
    import jax
    import jax.numpy as jnp
    from timed_design_tpu.models import timed
    from timed_design_tpu.parallel import make_mesh

    model = timed(filters=(8,))
    x = np.random.default_rng(0).random((19, 21, 21, 21, 5)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:1]))
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.shape["data"] == 8
    pred = Predictor((model, variables), batch_size=8, mesh=mesh)
    probs = pred.predict_probs(x)
    assert probs.shape == (19, 20)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(probs, ref, atol=1e-5)


def test_empty_models_list_errors(ubq_h5, tmp_path):
    with pytest.raises(ValueError, match="no models"):
        load_dataset_and_predict(
            [], ubq_h5, path_to_output=tmp_path,
            dataset_map_path=tmp_path / "datasetmap.txt",
        )


@pytest.mark.slow
def test_load_dataset_and_predict_artifacts(tmp_path, monkeypatch, ubq_h5):
    monkeypatch.chdir(tmp_path)
    result = load_dataset_and_predict(
        ["TIMED_rotamer_not_so_deep"],
        ubq_h5,
        batch_size=32,
        path_to_output=tmp_path,
        predict_rotamers=True,
        allow_random_weights=True,
    )
    # artifact set (reference README.md:119-131)
    name = "TIMED_rotamer_not_so_deep"
    assert (tmp_path / f"{name}_rot.csv").exists()
    assert (tmp_path / f"{name}.csv").exists()
    assert (tmp_path / f"{name}.fasta").exists()
    assert (tmp_path / "dataset.fasta").exists()
    assert (tmp_path / "datasetmap.txt").exists()
    assert (tmp_path / "encoded_labels.csv").exists()
    assert (tmp_path / f"{name}.txt").exists()

    rot = load_prediction_matrix(tmp_path / f"{name}_rot.csv")
    assert rot.shape == (76, 338)
    np.testing.assert_allclose(rot.sum(axis=1), 1.0, atol=1e-4)
    onehot = load_prediction_matrix(tmp_path / f"{name}.csv")
    assert onehot.shape == (76, 20)
    np.testing.assert_array_equal(onehot.sum(axis=1), 1.0)

    # decoded sequences: 76 residues, real sequence recovered from labels
    seq = result.pdb_to_sequence["1ubqA"]
    assert len(seq) == 76
    assert result.pdb_to_real_sequence["1ubqA"].startswith("MQIFVKTLTG")

    # fasta round-trip
    fasta = (tmp_path / f"{name}.fasta").read_text()
    assert fasta == f">1ubqA\n{seq}\n"

    # SRB datasetmap
    srb = (tmp_path / f"{name}.txt").read_text()
    assert srb.endswith("1ubqA 76\n")


def test_engine_bf16_flat_storage_bitwise_equal(ubq_h5, tmp_path):
    """bf16 flat storage through the full engine produces artifacts
    byte-identical to f32 storage under the production bf16 compute path —
    the storage cast IS the wire cast (Predictor.to_device), just moved to
    dataset-build time. This is what makes the 2x loader win free."""
    import jax.numpy as jnp

    from timed_design_tpu.io import convert_to_flat

    f32 = convert_to_flat(ubq_h5, tmp_path / "f32.hdf5")
    b16 = convert_to_flat(ubq_h5, tmp_path / "b16.hdf5",
                          frame_dtype="bfloat16")
    outs = {}
    for tag, ds in (("f32", f32), ("b16", b16)):
        out = tmp_path / f"out_{tag}"
        out.mkdir()
        load_dataset_and_predict(
            ["TIMED"], ds, batch_size=32, path_to_output=out,
            dataset_map_path=out / "datasetmap.txt",
            compute_dtype=jnp.bfloat16, allow_random_weights=True,
        )
        outs[tag] = out
    for name in ("TIMED.csv", "TIMED.fasta", "dataset.fasta",
                 "encoded_labels.csv"):
        assert (outs["f32"] / name).read_bytes() == (
            outs["b16"] / name
        ).read_bytes(), f"{name} differs between f32 and bf16 storage"


def test_registry_name_without_weights_hard_errors(ubq_h5, tmp_path):
    """A bare registry name (no weights) must refuse to predict: silently
    random outputs are indistinguishable from real designs (VERDICT r1 weak
    #2; the reference always loads real weights, predict.py:121)."""
    with pytest.raises(ValueError, match="NO weights"):
        load_dataset_and_predict(
            ["TIMED"], ubq_h5, batch_size=32, path_to_output=tmp_path
        )
    from timed_design_tpu.engine import DesignSession

    with pytest.raises(ValueError, match="NO weights"):
        DesignSession("TIMED")


@pytest.mark.slow
def test_predict_structure_no_h5(ubq_pdb_gz):
    """PDB -> frames -> probs entirely on device (no intermediate file)."""
    probs, fa = predict_structure(
        ubq_pdb_gz, "TIMED", codec="CNOCACB", allow_random_weights=True
    )
    assert probs.shape == (76, 20)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)
    assert len(fa.labels) == 76


@pytest.mark.slow
def test_predict_structure_reuses_compiled_predictor(ubq_pdb_gz, monkeypatch):
    """Two consecutive predict_structure calls with the same (model,
    batch_size, mesh) construct ONE Predictor (VERDICT r3 weak #5: the
    documented no-HDF5 loop paid a full jit recompile per call). A new
    batch_size is a different compiled program and must miss."""
    import timed_design_tpu.engine.predictor as pred_mod

    pred_mod._STRUCTURE_PREDICTOR_CACHE.clear()
    built = []
    real_init = pred_mod.Predictor.__init__

    def counting_init(self, *a, **kw):
        built.append(kw.get("batch_size"))
        return real_init(self, *a, **kw)

    monkeypatch.setattr(pred_mod.Predictor, "__init__", counting_init)
    kw = dict(codec="CNOCACB", allow_random_weights=True, batch_size=128)
    p1, _ = pred_mod.predict_structure(ubq_pdb_gz, "TIMED", **kw)
    p2, _ = pred_mod.predict_structure(ubq_pdb_gz, "TIMED", **kw)
    assert built == [128], "second call must reuse the cached Predictor"
    # identical inputs + SAME weights (the cached random init) => identical
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    pred_mod.predict_structure(
        ubq_pdb_gz, "TIMED", codec="CNOCACB", allow_random_weights=True,
        batch_size=64,
    )
    assert built == [128, 64], "a new batch shape is a genuine miss"
    pred_mod._STRUCTURE_PREDICTOR_CACHE.clear()


def test_predict_structure_cache_respects_random_weight_opt_in(
    ubq_pdb_gz, monkeypatch
):
    """A cache entry built under allow_random_weights=True must NOT satisfy
    a later call that didn't opt in — that caller is owed _resolve_model's
    ValueError, not silently-served random-weight predictions (round-4
    review finding on the predict_structure LRU)."""
    import timed_design_tpu.engine.predictor as pred_mod

    pred_mod._STRUCTURE_PREDICTOR_CACHE.clear()

    class _StubPredictor:  # no jit — this pins lookup logic, not compute
        def __init__(self, model, batch_size=512, mesh=None, model_name=None,
                     **kw):
            self.n_classes = 20

        def predict_probs(self, frames):
            return np.full((frames.shape[0], 20), 1 / 20, np.float32)

    monkeypatch.setattr(pred_mod, "Predictor", _StubPredictor)
    probs, _ = pred_mod.predict_structure(
        ubq_pdb_gz, "TIMED", codec="CNOCACB", allow_random_weights=True
    )
    assert probs.shape == (76, 20)
    with pytest.raises(ValueError, match="random"):
        pred_mod.predict_structure(ubq_pdb_gz, "TIMED", codec="CNOCACB")
    pred_mod._STRUCTURE_PREDICTOR_CACHE.clear()


def test_filters_override_checkpoint_roundtrip(tmp_path):
    """Checkpoints trained with a non-default conv stack (td-train
    --filters) record it, and Name@ckpt.npz resolution rebuilds the SAME
    module — with registry defaults the weights pair with a mismatched
    parameter tree and fail at apply time (round-4 review finding)."""
    import jax
    import optax

    from timed_design_tpu.engine.predictor import _resolve_model
    from timed_design_tpu.models import get_model_spec
    from timed_design_tpu.train import init_train_state, save_checkpoint

    spec = get_model_spec("TIMED")
    module = spec.build(filters=(8, 16))
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optax.adam(1e-3), None
    )
    ckpt = tmp_path / "small.npz"
    save_checkpoint(state, ckpt, build_kwargs={"filters": (8, 16)})
    (mod, variables), name = _resolve_model(f"TIMED@{ckpt}")
    assert name == "TIMED"
    assert tuple(mod.filters) == (8, 16)
    out = mod.apply(variables, np.zeros((2, 21, 21, 21, 5), np.float32))
    assert out.shape == (2, 20)
    # metadata entries never leak into the weight tree
    assert set(variables) == {"params", "batch_stats"}


def test_resume_start_batch(ubq_h5):
    """start_batch resume support (reference predict.py:54-57): the loader
    skips already-processed batches."""
    from timed_design_tpu.io import FrameBatchLoader, create_flat_dataset_map

    dmap, _ = create_flat_dataset_map(ubq_h5)
    full = list(FrameBatchLoader(ubq_h5, dmap, batch_size=32))
    resumed = list(FrameBatchLoader(ubq_h5, dmap, batch_size=32, start_batch=2))
    assert len(full) == 3 and len(resumed) == 1
    np.testing.assert_array_equal(full[2][0], resumed[0][0])


@pytest.mark.slow
def test_design_session(ubq_pdb_gz):
    """Persistent session: repeated designs reuse the compiled executable."""
    from timed_design_tpu.engine import DesignSession

    sess = DesignSession(
        "TIMED_rotamer_not_so_deep", batch_size=128, allow_random_weights=True
    )
    assert sess.n_classes == 338
    probs, fa = sess.design(ubq_pdb_gz)
    assert probs.shape == (76, 338)
    seq = sess.design_sequence(ubq_pdb_gz)
    assert len(seq) == 76
    # second call, same compiled path
    probs2, _ = sess.design(ubq_pdb_gz)
    np.testing.assert_allclose(probs, probs2, atol=1e-6)


@pytest.mark.slow
def test_trained_checkpoint_roundtrip(tmp_path, ubq_pdb_gz):
    """td-train output feeds td-predict: MODEL@checkpoint.npz resolution."""
    import jax
    import optax
    from timed_design_tpu.models import timed_rotamer_not_so_deep
    from timed_design_tpu.train import init_train_state, save_checkpoint

    module = timed_rotamer_not_so_deep()
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optax.adam(1e-3), None
    )
    ckpt = tmp_path / "ckpt.npz"
    save_checkpoint(state, ckpt)
    probs, _ = predict_structure(
        ubq_pdb_gz, f"TIMED_rotamer_not_so_deep@{ckpt}", codec="CNOCACB",
        batch_size=128,
    )
    assert probs.shape == (76, 338)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-3)


@pytest.mark.slow
def test_start_batch_resume_end_to_end(tmp_path, ubq_h5):
    """Crashed-run resume (reference predict.py:54-57): a run resumed with
    --start_batch must stitch the appended CSVs into the FULL matrix and
    produce byte-identical artifacts to an uninterrupted run (it used to
    crash decoding partial rows against the full map — found driving the
    CLI on hardware)."""
    name = "TIMED_rotamer_not_so_deep"
    full_dir = tmp_path / "full"
    res_dir = tmp_path / "resume"
    for d in (full_dir, res_dir):
        d.mkdir()
    kw = dict(batch_size=32, predict_rotamers=True, allow_random_weights=True)
    load_dataset_and_predict([name], ubq_h5, path_to_output=full_dir,
                             dataset_map_path=full_dir / "dm.txt", **kw)
    # simulate the crash: run fully, then truncate artifacts to batch 1 —
    # and the derived one-hot {name}.csv to a MISALIGNED shorter count
    # (the crash can land between the two sequential per-batch writes;
    # resume must regenerate the derived file from the validated matrix
    # rather than append to the short one)
    load_dataset_and_predict([name], ubq_h5, path_to_output=res_dir,
                             dataset_map_path=res_dir / "dm.txt", **kw)
    for f, keep in ((f"{name}_rot.csv", 32), (f"{name}.csv", 20),
                    ("encoded_labels.csv", 32)):
        rows = (res_dir / f).read_text().splitlines()[:keep]
        (res_dir / f).write_text("\n".join(rows) + "\n")
    load_dataset_and_predict([name], ubq_h5, path_to_output=res_dir,
                             dataset_map_path=res_dir / "dm.txt",
                             start_batch=1, **kw)
    for f in (f"{name}_rot.csv", f"{name}.csv", f"{name}.fasta",
              "encoded_labels.csv"):
        assert (res_dir / f).read_text() == (full_dir / f).read_text(), f

    # inconsistent resume (map larger than csv rows) -> clear error
    for f in (f"{name}_rot.csv",):
        rows = (res_dir / f).read_text().splitlines()[:10]
        (res_dir / f).write_text("\n".join(rows) + "\n")
    with pytest.raises(ValueError, match="Resume mismatch"):
        load_dataset_and_predict([name], ubq_h5, path_to_output=res_dir,
                                 dataset_map_path=res_dir / "dm.txt",
                                 start_batch=2, **kw)


@pytest.mark.slow
def test_ensemble_resume_byte_identical(tmp_path, ubq_h5):
    """A crash-resumed --ensemble run must emit byte-identical ensemble
    artifacts to an uninterrupted one: the fresh path accumulates the
    streamed rows at CSV (float16) precision precisely so the resumed
    path's CSV read-backs sum to the same values — near-tied argmaxes
    cannot flip on whether the run was resumed."""
    names = ["TIMED", "TIMED_Deep"]
    kw = dict(batch_size=32, allow_random_weights=True, ensemble=True)
    fresh = tmp_path / "fresh"
    res = tmp_path / "res"
    for d in (fresh, res):
        d.mkdir()
    load_dataset_and_predict(names, ubq_h5, path_to_output=fresh,
                             dataset_map_path=fresh / "dm.txt", **kw)
    load_dataset_and_predict(names, ubq_h5, path_to_output=res,
                             dataset_map_path=res / "dm.txt", **kw)
    for f in ("TIMED.csv", "TIMED_Deep.csv", "encoded_labels.csv"):
        rows = (res / f).read_text().splitlines()[:32]
        (res / f).write_text("\n".join(rows) + "\n")
    load_dataset_and_predict(names, ubq_h5, path_to_output=res,
                             dataset_map_path=res / "dm.txt",
                             start_batch=1, **kw)
    for f in ("ensemble.csv", "ensemble.fasta", "TIMED.csv",
              "TIMED_Deep.csv"):
        assert (res / f).read_bytes() == (fresh / f).read_bytes(), f


@pytest.mark.slow
def test_multi_model_single_pass_matches_separate_runs(tmp_path, ubq_h5):
    """Two models in one call stream the dataset once; per-model artifacts
    must equal two single-model runs (random init is keyed deterministically,
    so outputs are reproducible across calls)."""
    from timed_design_tpu.io import load_prediction_matrix

    fused = tmp_path / "fused"
    fused.mkdir()
    load_dataset_and_predict(
        ["TIMED", "TIMED_Deep"], ubq_h5, batch_size=32,
        path_to_output=fused, dataset_map_path=fused / "datasetmap.txt",
        allow_random_weights=True,
    )
    for name in ("TIMED", "TIMED_Deep"):
        solo = tmp_path / f"solo_{name}"
        solo.mkdir()
        load_dataset_and_predict(
            [name], ubq_h5, batch_size=32, path_to_output=solo,
            dataset_map_path=solo / "datasetmap.txt",
            allow_random_weights=True,
        )
        got = load_prediction_matrix(fused / f"{name}.csv")
        want = load_prediction_matrix(solo / f"{name}.csv")
        np.testing.assert_array_equal(got, want)
        assert (fused / f"{name}.fasta").read_text() == (
            (solo / f"{name}.fasta").read_text()
        )
    # shared artifacts written once
    assert (fused / "encoded_labels.csv").exists()
    assert (fused / "dataset.fasta").exists()


def test_compiler_options_per_architecture():
    """Per-arch tuned scoped-VMEM values (utils/xla_opts.py table):
    ProDCoNN disables the option (-7% measured), Dense* use 96 MiB, and
    on non-TPU backends everything is None."""
    from timed_design_tpu.utils import xla_opts
    from timed_design_tpu.utils.xla_opts import tpu_compiler_options

    assert tpu_compiler_options(model_name="ProDCoNN") is None
    assert tpu_compiler_options(model_name="ProDCoNN_suffixed") is None
    assert tpu_compiler_options(model_name="prodconn") is None  # .h5 stem
    # CPU backend (this test mesh): None regardless of model
    assert tpu_compiler_options(model_name="TIMED") is None
    assert tpu_compiler_options() is None
    # value selection is testable backend-independently via the table
    assert xla_opts._MODEL_KIB["DenseCPD"] == "98304"
    assert xla_opts._MODEL_KIB["DenseNet"] == "98304"
    assert xla_opts._MODEL_KIB["ProDCoNN"] is None
    assert xla_opts._DEFAULT_KIB == "131072"


def test_datasetmap_default_found_in_output_dir(tmp_path, monkeypatch, ubq_h5):
    """The engine saves the generated map to path_to_output; a second run
    keeping the default CWD-relative 'datasetmap.txt' must FIND that saved
    map instead of regenerating forever (the CWD never gets one)."""
    import jax

    import timed_design_tpu.engine.predictor as pred_mod
    from timed_design_tpu.models import timed

    module = timed(filters=(4,))
    variables = module.init(
        jax.random.key(0), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    out = tmp_path / "out"
    out.mkdir()
    cwd = tmp_path / "cwd"
    cwd.mkdir()
    monkeypatch.chdir(cwd)
    r1 = load_dataset_and_predict(
        [(module, variables)], ubq_h5, batch_size=32, path_to_output=out,
        allow_random_weights=True,
    )
    assert (out / "datasetmap.txt").exists()
    assert not (cwd / "datasetmap.txt").exists()

    def boom(*a, **k):
        raise AssertionError("run 2 regenerated the datasetmap")

    monkeypatch.setattr(pred_mod, "save_datasetmap", boom)
    r2 = load_dataset_and_predict(
        [(module, variables)], ubq_h5, batch_size=32, path_to_output=out,
        allow_random_weights=True,
    )
    assert r2.pdb_to_sequence == r1.pdb_to_sequence


def test_stale_datasetmap_regenerated(tmp_path, ubq_h5):
    """A leftover map describing a DIFFERENT dataset must be detected and
    regenerated, not silently used to index this dataset's frames."""
    import jax

    from timed_design_tpu.io import save_datasetmap
    from timed_design_tpu.io.datasetmap import DatasetMap
    from timed_design_tpu.models import timed

    module = timed(filters=(4,))
    variables = module.init(
        jax.random.key(0), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    out = tmp_path / "out"
    out.mkdir()
    stale = DatasetMap(entries=[("9zzz", "Q", str(i), "ALA")
                                for i in range(10)])
    save_datasetmap(stale, out / "datasetmap.txt")
    r = load_dataset_and_predict(
        [(module, variables)], ubq_h5, batch_size=32, path_to_output=out,
        dataset_map_path=out / "datasetmap.txt",
        allow_random_weights=True,
    )
    # the real 1ubq rows were predicted, not the stale 9zzz ones
    assert set(r.pdb_to_sequence) == {"1ubqA"}
    assert len(r.pdb_to_sequence["1ubqA"]) == 76


def test_ensemble_validation_fails_fast(tmp_path, ubq_h5):
    """--ensemble preconditions raise BEFORE any frame streams: one model
    is not an ensemble, and a 20-class head cannot average with a
    338-rotamer head."""
    with pytest.raises(ValueError, match="at least two"):
        load_dataset_and_predict(
            ["TIMED"], ubq_h5, batch_size=32, path_to_output=tmp_path,
            dataset_map_path=tmp_path / "dm.txt",
            allow_random_weights=True, ensemble=True,
        )
    with pytest.raises(ValueError, match="matching heads"):
        load_dataset_and_predict(
            ["TIMED", "TIMED_rotamer_not_so_deep"], ubq_h5, batch_size=32,
            path_to_output=tmp_path, dataset_map_path=tmp_path / "dm.txt",
            allow_random_weights=True, ensemble=True,
        )


def test_head_vs_rotamer_flag_fails_fast(tmp_path, ubq_h5):
    """The emit path is head-global: a 338-head model without
    predict_rotamers (or a 20-head model with it) must raise BEFORE any
    frame streams instead of crashing in decode / silently mis-mapping
    argmaxes through ROTAMER_TO_AA_ONEHOT."""
    with pytest.raises(ValueError, match="338-rotamer head"):
        load_dataset_and_predict(
            ["TIMED", "TIMED_rotamer_not_so_deep"], ubq_h5, batch_size=32,
            path_to_output=tmp_path, dataset_map_path=tmp_path / "dm.txt",
            allow_random_weights=True,
        )
    with pytest.raises(ValueError, match="expected 338"):
        load_dataset_and_predict(
            ["TIMED"], ubq_h5, batch_size=32, predict_rotamers=True,
            path_to_output=tmp_path, dataset_map_path=tmp_path / "dm.txt",
            allow_random_weights=True,
        )


@pytest.mark.slow
def test_ensemble_outputs_mean_of_members(tmp_path, ubq_h5):
    """ensemble=True emits the full artifact set under 'ensemble', whose
    matrix is the float32 mean of the member matrices (the per-model CSVs
    are float16-quantized, so compare at float16 tolerance), and the
    returned bundle is the ensemble's decode."""
    result = load_dataset_and_predict(
        ["TIMED", "TIMED_Deep"], ubq_h5, batch_size=32,
        path_to_output=tmp_path, dataset_map_path=tmp_path / "dm.txt",
        allow_random_weights=True, ensemble=True,
    )
    ens = load_prediction_matrix(tmp_path / "ensemble.csv")
    m1 = load_prediction_matrix(tmp_path / "TIMED.csv")
    m2 = load_prediction_matrix(tmp_path / "TIMED_Deep.csv")
    assert ens.shape == m1.shape == m2.shape
    np.testing.assert_allclose(ens, (m1 + m2) / 2.0, atol=2e-3)
    # the ensemble is a probability matrix: rows ~ 1 (members each sum to 1)
    np.testing.assert_allclose(ens.sum(axis=1), 1.0, atol=5e-2)
    # returned bundle decodes the MEAN matrix, not the last member's
    assert (tmp_path / "ensemble.fasta").exists()
    fasta_seq = (tmp_path / "ensemble.fasta").read_text().splitlines()[1]
    (pdb,) = result.pdb_to_sequence
    assert result.pdb_to_sequence[pdb] == fasta_seq
    probs = np.asarray(result.pdb_to_probability[pdb], dtype=np.float64)
    np.testing.assert_allclose(probs, ens, atol=2e-3)
    # SRB map for downstream PDBench tooling
    assert (tmp_path / "ensemble.txt").exists()
