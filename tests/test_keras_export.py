"""Keras-h5 export: round-trip through our importer and real TF load."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timed_design_tpu.models import export_timed_to_h5, load_keras_model, timed


@pytest.fixture(scope="module")
def trained_timed():
    model = timed(filters=(8, 16))
    x = jnp.asarray(np.random.default_rng(0).random((2, 21, 21, 21, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    # perturb batch stats so BN is non-trivial
    bs = jax.tree.map(lambda a: a + 0.1, variables["batch_stats"])
    return model, variables["params"], bs, x


def test_export_roundtrip_own_importer(tmp_path, trained_timed):
    model, params, batch_stats, x = trained_timed
    path = export_timed_to_h5(params, batch_stats, tmp_path / "TIMED_export.h5")
    ref = np.asarray(model.apply({"params": params, "batch_stats": batch_stats}, x))
    imported = load_keras_model(path)
    out = np.asarray(imported(x))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_import_timed_params_roundtrip(tmp_path, trained_timed):
    """h5 -> Flax param tree (the fine-tune warm-start path): applying the
    imported tree through the TIMED module must reproduce the original
    forward pass exactly — a transposed kernel or swapped BN stat would
    show up here."""
    from timed_design_tpu.models.keras_import import import_timed_params

    model, params, batch_stats, x = trained_timed
    path = export_timed_to_h5(params, batch_stats, tmp_path / "TIMED_export.h5")
    ref = np.asarray(model.apply({"params": params, "batch_stats": batch_stats}, x))
    variables = import_timed_params(path)
    assert set(variables) == {"params", "batch_stats"}
    out = np.asarray(model.apply(variables, x))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_import_timed_params_rejects_nonlinear(tmp_path, trained_timed):
    """Branching graphs (DenseNet-style Add/Concatenate) cannot map onto the
    linear TIMED tree — the importer must name the offending layer instead
    of silently dropping weights."""
    import h5py
    import json

    from timed_design_tpu.models.keras_import import import_timed_params

    model, params, batch_stats, x = trained_timed
    path = export_timed_to_h5(params, batch_stats, tmp_path / "bad.h5")
    with h5py.File(path, "r+") as f:
        cfg = json.loads(f.attrs["model_config"])
        cfg["config"]["layers"].append(
            {"class_name": "Add", "config": {"name": "add_0"}}
        )
        f.attrs["model_config"] = json.dumps(cfg)
    with pytest.raises(ValueError, match="add_0"):
        import_timed_params(path)


def test_export_loads_in_tensorflow(tmp_path, trained_timed):
    tf = pytest.importorskip("tensorflow")
    model, params, batch_stats, x = trained_timed
    path = export_timed_to_h5(params, batch_stats, tmp_path / "TIMED_export.h5")
    kmodel = tf.keras.models.load_model(path, compile=False)
    ref = np.asarray(model.apply({"params": params, "batch_stats": batch_stats}, x))
    out = kmodel.predict(np.asarray(x), verbose=0)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
