"""Training subsystem: loss decreases, sharding layouts, checkpoint roundtrip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from timed_design_tpu.models import timed
from timed_design_tpu.parallel import make_mesh
from timed_design_tpu.train import (
    fit,
    init_train_state,
    load_checkpoint_params,
    make_train_step,
    param_shardings,
    save_checkpoint,
)


def _toy_batches(n_batches=6, batch=16, channels=5, n_classes=20, seed=0):
    """Learnable toy task: label = channel with max total density."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        X = rng.random((batch, 21, 21, 21, channels)).astype(np.float32)
        lab = X.sum(axis=(1, 2, 3)).argmax(-1) % n_classes
        y = np.eye(n_classes, dtype=np.float32)[lab]
        out.append((X, y, batch))
    return out


def test_loss_decreases():
    module = timed(filters=(8,))
    batches = _toy_batches(n_batches=8)
    mesh = make_mesh()
    optimizer = optax.adam(3e-3)
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optimizer, mesh
    )
    step_fn = jax.jit(make_train_step(module, optimizer))
    losses = []
    rng = jax.random.key(1)
    for X, y, _ in batches * 4:
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, jnp.asarray(X), jnp.asarray(y), sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 32


def test_param_shardings_tensor_parallel():
    module = timed(filters=(16, 32))
    mesh = make_mesh(n_data=4, n_model=2)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 21, 21, 21, 5)))
    sh = param_shardings(variables["params"], mesh)
    leaves = jax.tree_util.tree_leaves_with_path(sh)
    kernel_specs = [
        (p, s.spec) for p, s in leaves if "kernel" in str(p[-1])
    ]
    # conv kernels with 16/32 output channels shard on 'model'
    assert any(spec[-1] == "model" for _, spec in kernel_specs)
    bias_specs = [s.spec for p, s in leaves if "bias" in str(p[-1])]
    assert all(spec == () for spec in bias_specs)


def test_sharded_train_step_runs():
    """Full dp+tp train step executes on the 8-device virtual mesh."""
    module = timed(filters=(8, 16))
    mesh = make_mesh(n_data=4, n_model=2)
    optimizer = optax.adam(1e-3)
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optimizer, mesh
    )
    step_fn = jax.jit(make_train_step(module, optimizer))
    X, y, _ = _toy_batches(1, batch=8)[0]
    state, metrics = step_fn(state, jnp.asarray(X), jnp.asarray(y), jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path):
    module = timed(filters=(8,))
    optimizer = optax.adam(1e-3)
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optimizer, None
    )
    path = tmp_path / "ckpt.npz"
    save_checkpoint(state, path)
    restored = load_checkpoint_params(path)
    x = jnp.ones((2, 21, 21, 21, 5))
    out1 = module.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x
    )
    out2 = module.apply(restored, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_distributed_helpers_single_host():
    """Multi-host helpers degenerate correctly on one host."""
    from timed_design_tpu.parallel import (
        barrier,
        gather_host_arrays,
        initialize_distributed,
        shard_work_for_host,
    )

    pi, pc = initialize_distributed()
    assert (pi, pc) == (0, 1)
    assert shard_work_for_host(["a", "b", "c"]) == ["a", "b", "c"]
    assert shard_work_for_host(["a", "b", "c"], 1, 2) == ["b"]
    x = np.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(gather_host_arrays(x), x)
    barrier()
