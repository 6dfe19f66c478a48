"""Native Flax model zoo: shapes, probabilities, registry, train mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timed_design_tpu.models import (
    MODEL_REGISTRY,
    densecpd,
    densenet,
    get_model_spec,
    prodconn,
    timed,
    timed_rotamer_not_so_deep,
)


@pytest.mark.parametrize(
    "ctor,n_classes,kw",
    [
        (timed, 20, dict(filters=(8, 16))),
        (timed_rotamer_not_so_deep, 338, {}),
        (prodconn, 20, {}),
        (densenet, 20, dict(growth_rate=8, block_layers=(2, 2), init_features=8)),
    ],
)
def test_forward_shapes_and_probs(ctor, n_classes, kw):
    model = ctor(**kw)
    x = jnp.asarray(np.random.default_rng(0).random((2, 21, 21, 21, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out.shape == (2, n_classes)
    np.testing.assert_allclose(np.asarray(out.sum(axis=1)), 1.0, atol=1e-5)
    assert (np.asarray(out) >= 0).all()


def test_registry_complete():
    # every reference zoo name resolves (ui.py:732-748)
    for name in [
        "TIMED", "TIMED_Deep", "TIMED_Charge", "TIMED_Polar", "TIMED_rotamer",
        "TIMED_rotamer_balanced", "TIMED_rotamer_not_so_deep",
        "TIMED_rotamer_deep", "ProDCoNN", "DenseNet", "DenseCPD",
    ]:
        spec = get_model_spec(name)
        assert spec.n_classes in (20, 338)
    assert get_model_spec("timed").name == "TIMED"  # case-insensitive
    with pytest.raises(KeyError):
        get_model_spec("nope")
    # property models carry property codecs
    assert get_model_spec("TIMED_Charge").codec.endswith("Q")
    assert get_model_spec("TIMED_Polar").codec.endswith("P")


def test_train_mode_runs_with_dropout_and_bn():
    model = timed(filters=(8, 8))
    x = jnp.ones((2, 21, 21, 21, 5), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out, mutated = model.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 20)
    assert "batch_stats" in mutated


def test_densecpd_deeper_than_densenet():
    # compare param counts via shape-only eval (no compile)
    x = jnp.ones((1, 21, 21, 21, 5), jnp.float32)
    shapes_dn = jax.eval_shape(densenet().init, jax.random.key(0), x)
    shapes_cpd = jax.eval_shape(densecpd().init, jax.random.key(0), x)
    n_dn = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes_dn))
    n_cpd = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes_cpd))
    assert n_cpd > n_dn


def test_bn_folding_parity():
    """BN-folded inference equals the full model to float rounding."""
    from timed_design_tpu.models.optimize import fold_timed_bn, timed_inference_apply

    model = timed(filters=(8, 16))
    x = jnp.asarray(np.random.default_rng(0).random((2, 21, 21, 21, 5)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    bs = jax.tree.map(lambda a: a + 0.15, variables["batch_stats"])
    ref = np.asarray(model.apply({"params": variables["params"], "batch_stats": bs}, x))
    folded, n_blocks = fold_timed_bn(variables["params"], bs)
    out = np.asarray(timed_inference_apply(folded, x, n_blocks))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_load_model_missing_weights_path_errors(tmp_path):
    """A Keras-looking path that does not exist must FileNotFoundError —
    not fall through to a misleading 'Unknown model' registry KeyError."""
    from timed_design_tpu.models import load_model

    with pytest.raises(FileNotFoundError, match="weights file"):
        load_model(tmp_path / "typo.h5")
    with pytest.raises(FileNotFoundError, match="weights file"):
        load_model(str(tmp_path / "typo.hdf5"))


def test_prodconn_bf16_head_is_fp32():
    """Under compute_dtype=bfloat16 the class head still emits fp32
    logits that are NOT bf16-quantized (a bf16 Dense would round them
    before softmax)."""
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import prodconn

    m = prodconn(compute_dtype=jnp.bfloat16)
    x = np.random.default_rng(0).random((2, 21, 21, 21, 5)).astype(np.float32)
    v = m.init(jax.random.key(0), x[:1])
    logits = m.apply(v, x, logits=True)
    assert logits.dtype == jnp.float32
    # fp32 logits must carry sub-bf16 precision (bf16 has 8 mantissa bits;
    # a value round-tripped through bf16 would equal its own cast)
    roundtrip = np.asarray(logits).astype(jnp.bfloat16).astype(np.float32)
    assert not np.array_equal(np.asarray(logits), roundtrip)
