"""Training subsystem: sharded train step + fit loop for the model zoo.

The reference ships NO training code — models arrive as `.h5` releases
(README.md:100-104, SURVEY.md intro). This module adds the missing
capability TPU-first so users can (re)train TIMED-family models on frame
datasets:

  * softmax cross-entropy over 20/338 classes with top-1/top-3 accuracy
    (the reference's monitored metric, predict.py:24-25);
  * BatchNorm running stats + SpatialDropout handled functionally;
  * hybrid data/tensor parallelism over a (data, model) mesh: the batch
    shards across ``data``; conv/dense kernels with output channels
    divisible by the ``model`` axis shard on their last axis, and XLA/GSPMD
    inserts the collectives;
  * `jax.checkpoint` on the conv trunk is unnecessary at 21^3 activations,
    so the step stays simple — rematerialization hooks can wrap the model
    apply when frames grow.
"""
from __future__ import annotations

import dataclasses
import typing as t

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import batch_sharding, make_mesh


@dataclasses.dataclass
class TrainState:
    params: t.Any
    batch_stats: t.Any
    opt_state: t.Any
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "batch_stats", "opt_state", "step"],
    meta_fields=[],
)


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout: shard the output-channel (last) axis of any
    kernel whose size divides the ``model`` axis; replicate the rest."""
    n_model = mesh.shape["model"]

    def rule(path, x):
        if (
            n_model > 1
            and x.ndim >= 2
            and x.shape[-1] % n_model == 0
            and path[-1].key == "kernel"
        ):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def balanced_class_weights(labels, n_classes: int) -> np.ndarray:
    """Inverse-frequency class weights, sklearn ``compute_class_weight(
    'balanced')`` convention: ``n_samples / (n_present_classes * count_c)``
    for each class present in ``labels``; absent classes get weight 0
    (they contribute no loss terms anyway, and 0 avoids an inf that would
    poison the weighted mean if a padding row ever carried one).

    This is the training-side capability behind the reference's
    ``TIMED_rotamer_balanced`` release family (ui.py:732-748) — the
    balancing itself happened outside the reference repo, which ships no
    training code (README.md:100-104).
    """
    counts = np.bincount(np.asarray(labels, np.int64), minlength=n_classes)
    counts = counts.astype(np.float64)
    present = counts > 0
    if not present.any():
        raise ValueError("no labels to balance")
    w = np.zeros(n_classes, np.float64)
    w[present] = counts.sum() / (present.sum() * counts[present])
    return w


def make_train_step(module, optimizer, class_weights=None):
    """Build the jittable (state, x, y, rng) -> (state, metrics) step.

    ``class_weights`` (shape ``(n_classes,)``) switches the loss to a
    weighted cross-entropy: each row weighted by its label's weight,
    normalized by the batch's total weight (so the LR scale is unchanged
    vs the unweighted mean). top1/top3 metrics stay unweighted.
    """
    cw = (
        None
        if class_weights is None
        else jnp.asarray(class_weights, jnp.float32)
    )

    def loss_fn(params, batch_stats, x, y, rng):
        out, mutated = module.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            logits=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        ce = optax.softmax_cross_entropy(out, y)
        if cw is None:
            loss = ce.mean()
        else:
            w = y @ cw
            loss = (ce * w).sum() / jnp.maximum(w.sum(), 1e-9)
        return loss, (mutated["batch_stats"], out)

    def train_step(state: TrainState, x, y, rng):
        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, x, y, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        labels = y.argmax(-1)
        top1 = (logits.argmax(-1) == labels).mean()
        top3 = (
            (jax.lax.top_k(logits, 3)[1] == labels[:, None]).any(-1).mean()
        )  # the reference's monitored top_3_cat_acc (predict.py:24-25)
        metrics = {"loss": loss, "top1": top1, "top3": top3}
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(module):
    """Build the jittable eval step: ``(params, batch_stats, x, y, n_valid)
    -> dict of SUMS`` (loss/top1/top3 summed over the first ``n_valid`` rows,
    plus the row count) so the host can weight partial final batches
    correctly. Eval mode: running BatchNorm stats, no dropout — the same
    inference semantics the engine uses (predict.py:24-25 monitors
    categorical accuracy and top_3_cat_acc on this path)."""

    def eval_step(params, batch_stats, x, y, n_valid):
        logits = module.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            logits=True,
        )
        mask = (jnp.arange(x.shape[0]) < n_valid).astype(jnp.float32)
        loss = optax.softmax_cross_entropy(logits, y) * mask
        labels = y.argmax(-1)
        top1 = (logits.argmax(-1) == labels).astype(jnp.float32) * mask
        top3 = (
            (jax.lax.top_k(logits, 3)[1] == labels[:, None]).any(-1)
        ).astype(jnp.float32) * mask
        return {
            "loss_sum": loss.sum(),
            "top1_sum": top1.sum(),
            "top3_sum": top3.sum(),
            "n": mask.sum(),
        }

    return eval_step


def evaluate(
    module,
    loader: t.Iterable,
    params,
    batch_stats,
    mesh: Mesh | None = None,
    step_fn=None,
) -> dict:
    """Run eval-mode metrics over a loader of ``(X, y, n_valid)`` batches.

    Returns ``{"loss", "top1", "top3", "n"}`` averaged over the valid rows
    only (loader padding rows are masked out on device). Pass ``step_fn``
    (a prebuilt ``jax.jit(make_eval_step(module))``) when calling in a loop
    — a fresh closure per call would miss the jit cache and recompile the
    forward pass every epoch (minutes each on the tunnel)."""
    mesh = mesh if mesh is not None else make_mesh()
    step_fn = step_fn if step_fn is not None else jax.jit(make_eval_step(module))
    bsh = batch_sharding(mesh)
    n_data = mesh.shape["data"]
    totals = {"loss_sum": 0.0, "top1_sum": 0.0, "top3_sum": 0.0, "n": 0.0}
    for X, y, n_valid in loader:
        # round the batch up to a data-axis multiple with zero rows — unlike
        # fit()'s repeat-fill (which protects BN batch statistics), eval is
        # stateless and the n_valid mask already excludes every padding row
        keep = -(-X.shape[0] // n_data) * n_data
        if keep != X.shape[0]:
            X = np.concatenate(
                [X, np.zeros((keep - X.shape[0], *X.shape[1:]), np.float32)]
            )
            y = np.concatenate(
                [y, np.zeros((keep - y.shape[0], y.shape[1]), np.float32)]
            )
        x_dev = jax.device_put(jnp.asarray(X, jnp.float32), bsh)
        y_dev = jax.device_put(jnp.asarray(y, jnp.float32), bsh)
        out = step_fn(params, batch_stats, x_dev, y_dev, jnp.int32(n_valid))
        for k in totals:
            totals[k] += float(out[k])
    if totals["n"] == 0:
        # an empty loader must not report a perfect val_loss=0.0 — fit()'s
        # early stopping would pin "best" to a bogus score forever. NaN
        # never compares as an improvement (see the NaN-divergence path).
        return {"loss": float("nan"), "top1": float("nan"),
                "top3": float("nan"), "n": 0}
    n = totals["n"]
    return {
        "loss": totals["loss_sum"] / n,
        "top1": totals["top1_sum"] / n,
        "top3": totals["top3_sum"] / n,
        "n": int(totals["n"]),
    }


def make_lr_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
):
    """Optax learning-rate schedule by name: ``constant`` | ``cosine``
    (optional linear warmup to ``base_lr`` over ``warmup_steps``, then
    cosine decay to 0 over the remaining steps)."""
    if name == "constant":
        if warmup_steps:
            return optax.linear_schedule(0.0, base_lr, warmup_steps)
        return base_lr
    if name == "cosine":
        if warmup_steps >= total_steps:
            raise ValueError(
                f"warmup_steps={warmup_steps} must be < total training "
                f"steps ({total_steps}) for a cosine schedule — nothing "
                f"would be left to decay over"
            )
        decay_steps = max(1, total_steps - warmup_steps)
        if warmup_steps:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=base_lr,
                warmup_steps=warmup_steps,
                decay_steps=total_steps,
            )
        return optax.cosine_decay_schedule(base_lr, decay_steps)
    raise ValueError(f"unknown lr schedule {name!r} (constant | cosine)")


def _check_tree_shapes(fresh, given, what: str):
    """Structural + shape validation of a warm-start tree against a fresh
    init — a transposed kernel or wrong-head checkpoint must fail loudly
    here, not as a silent garbage-training run."""
    fresh_leaves = jax.tree_util.tree_flatten_with_path(fresh)[0]
    given_flat = {
        "/".join(str(getattr(k, "key", k)) for k in pk): leaf
        for pk, leaf in jax.tree_util.tree_flatten_with_path(given)[0]
    }
    fresh_keys = {
        "/".join(str(getattr(k, "key", k)) for k in pk) for pk, _ in fresh_leaves
    }
    if set(given_flat) != fresh_keys:
        missing = sorted(fresh_keys - set(given_flat))[:4]
        extra = sorted(set(given_flat) - fresh_keys)[:4]
        raise ValueError(
            f"init_weights {what} tree does not match the model: "
            f"missing={missing} extra={extra} — wrong architecture for "
            f"this warm start?"
        )
    for pk, leaf in fresh_leaves:
        key = "/".join(str(getattr(k, "key", k)) for k in pk)
        got = jnp.shape(given_flat[key])
        if tuple(got) != tuple(jnp.shape(leaf)):
            raise ValueError(
                f"init_weights {what}[{key}] has shape {tuple(got)}, model "
                f"expects {tuple(jnp.shape(leaf))} (e.g. a different head "
                f"size or input channel count)"
            )


def init_train_state(
    module,
    rng: jax.Array,
    input_shape: tuple[int, ...],
    optimizer,
    mesh: Mesh | None = None,
    init_weights: dict | None = None,
) -> tuple[TrainState, t.Any]:
    """Initialize params/batch_stats/optimizer, placed per the mesh layout.

    ``init_weights`` (a ``{"params", "batch_stats"}`` tree from
    load_checkpoint_params or keras_import.import_timed_params) warm-starts
    training from those weights instead of random init — the fine-tuning
    path the reference has no equivalent for (it ships fixed .h5 releases,
    README.md:100-104). Shapes are validated against the fresh init so a
    mismatched checkpoint fails with a named leaf, not NaNs.
    """
    variables = module.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if init_weights is not None:
        given_p = init_weights.get("params")
        if given_p is None:
            raise ValueError("init_weights must contain a 'params' tree")
        _check_tree_shapes(params, given_p, "params")
        params = jax.tree.map(
            lambda f, g: jnp.asarray(g, jnp.asarray(f).dtype), params, given_p
        )
        given_bs = init_weights.get("batch_stats")
        if batch_stats and given_bs:
            _check_tree_shapes(batch_stats, given_bs, "batch_stats")
            batch_stats = jax.tree.map(
                lambda f, g: jnp.asarray(g, jnp.asarray(f).dtype),
                batch_stats, given_bs,
            )
    if mesh is not None:
        shardings = param_shardings(params, mesh)
        params = jax.tree.map(jax.device_put, params, shardings)
        batch_stats = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), batch_stats
        )
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32)), None


def fit(
    module,
    loader: t.Iterable,
    n_classes: int,
    input_channels: int = 5,
    learning_rate: float = 1e-3,
    epochs: int = 1,
    mesh: Mesh | None = None,
    seed: int = 0,
    log_every: int = 10,
    val_loader: t.Iterable | None = None,
    patience: int | None = None,
    min_delta: float = 0.0,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    init_weights: dict | None = None,
    class_weights=None,
) -> TrainState:
    """Host training loop over a FrameBatchLoader-style iterable of
    (X, y, n_valid) batches.

    ``init_weights`` warm-starts from a ``{"params", "batch_stats"}`` tree
    (checkpoint npz or an imported Keras release via
    keras_import.import_timed_params) — see init_train_state.

    ``class_weights`` (``(n_classes,)``, e.g. from balanced_class_weights)
    trains with weighted cross-entropy; validation metrics (and therefore
    early stopping) stay unweighted so epochs are compared on the same
    scale users evaluate with.

    With ``val_loader``, eval-mode metrics run after every epoch; with
    ``patience`` as well, training stops after that many epochs without a
    ``min_delta`` improvement in validation loss and the best epoch's
    params/batch_stats are restored (Keras ``EarlyStopping(restore_best_
    weights=True)`` semantics — the regime the released reference models
    were trained under, monitored via top_3_cat_acc, predict.py:24-25).
    ``lr_schedule='cosine'`` decays over ``epochs * len(loader)`` steps
    with an optional linear ``warmup_steps``.
    """
    if patience is not None and val_loader is None:
        raise ValueError("patience requires a val_loader to monitor")
    mesh = mesh if mesh is not None else make_mesh()
    n_batches = getattr(loader, "n_batches", None)
    if lr_schedule != "constant" and n_batches is None:
        raise ValueError(
            "a decaying lr_schedule needs loader.n_batches to size the decay"
        )
    lr = make_lr_schedule(
        lr_schedule, learning_rate, (n_batches or 1) * epochs, warmup_steps
    )
    optimizer = optax.adam(lr)
    # distinct keys for init and the per-step dropout stream — passing one
    # key to both would correlate the init draw with the dropout masks
    init_rng, rng = jax.random.split(jax.random.key(seed))
    state, _ = init_train_state(
        module, init_rng, (1, 21, 21, 21, input_channels), optimizer, mesh,
        init_weights=init_weights,
    )
    step_fn = jax.jit(make_train_step(module, optimizer, class_weights))
    eval_step = (
        jax.jit(make_eval_step(module)) if val_loader is not None else None
    )
    bsh = batch_sharding(mesh)
    n_data = mesh.shape["data"]
    step = 0
    best_val = float("inf")
    best_weights = None
    epochs_since_best = 0
    for epoch in range(epochs):
        for X, y, n_valid in loader:
            if step == 0 and y.shape[1] != n_classes:
                raise ValueError(
                    f"loader yields {y.shape[1]}-class labels but "
                    f"n_classes={n_classes} — wrong dataset for this head?"
                )
            # Drop loader padding: zero frames with zero labels contribute no
            # gradient but DO pollute BatchNorm batch statistics (and dilute
            # the metrics) — with small datasets badly enough to wreck
            # eval-mode predictions. The batch can only shrink to a multiple
            # of the data-axis size, so fill the up-to-(n_data-1) rows that
            # must remain with REPEATS of valid rows: real frames with real
            # labels keep BN statistics clean (repeats only slightly
            # overweight those frames). Costs at most one extra compile for
            # the final partial batch shape.
            # The same mechanism also fixes a FULL batch whose size isn't
            # divisible by the data axis (e.g. a 38-frame loader on an
            # 8-device mesh): round up to the next multiple and fill with
            # repeats.
            keep = max(n_data, -(-n_valid // n_data) * n_data)
            if n_valid < X.shape[0] or keep != X.shape[0]:
                Xn = np.empty((keep, *X.shape[1:]), dtype=np.asarray(X).dtype)
                yn = np.empty((keep, y.shape[1]), dtype=np.asarray(y).dtype)
                Xn[:n_valid], yn[:n_valid] = X[:n_valid], y[:n_valid]
                if keep > n_valid:
                    src = np.arange(keep - n_valid) % n_valid
                    Xn[n_valid:] = X[src]
                    yn[n_valid:] = y[src]
                X, y = Xn, yn
            rng, sub = jax.random.split(rng)
            x_dev = jax.device_put(jnp.asarray(X, jnp.float32), bsh)
            y_dev = jax.device_put(jnp.asarray(y, jnp.float32), bsh)
            state, metrics = step_fn(state, x_dev, y_dev, sub)
            if step % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step}: loss={m['loss']:.4f} top1={m['top1']:.3f} top3={m['top3']:.3f}")
            step += 1
        if val_loader is not None:
            vm = evaluate(
                module, val_loader, state.params, state.batch_stats, mesh,
                step_fn=eval_step,
            )
            print(
                f"epoch {epoch}: val_loss={vm['loss']:.4f} "
                f"val_top1={vm['top1']:.3f} val_top3={vm['top3']:.3f} "
                f"({vm['n']} residues)"
            )
            if vm["loss"] < best_val - min_delta:
                best_val = vm["loss"]
                epochs_since_best = 0
                if patience is not None:
                    best_weights = jax.tree.map(
                        lambda x: x, (state.params, state.batch_stats)
                    )
            else:
                epochs_since_best += 1
                if patience is not None and epochs_since_best >= patience:
                    # NaN divergence means no epoch ever improved on inf:
                    # there is nothing to restore, and saying "restoring
                    # best" while returning the diverged weights would lie
                    restored = (
                        f"restoring best (val_loss={best_val:.4f})"
                        if best_weights is not None
                        else "no finite val_loss ever recorded — keeping "
                             "final weights (training diverged?)"
                    )
                    print(
                        f"early stop at epoch {epoch}: no val_loss "
                        f"improvement > {min_delta} for {patience} "
                        f"epoch(s); {restored}"
                    )
                    break
    if best_weights is not None:
        state = TrainState(
            best_weights[0], best_weights[1], state.opt_state, state.step
        )
    return state


def save_checkpoint(state: TrainState, path, build_kwargs=None):
    """Orbax-free minimal checkpointing: flat npz of params + batch_stats.

    ``build_kwargs`` (architecture overrides like a non-default ``filters``
    stack) are stored as a JSON sidecar entry so ``Name@ckpt.npz`` loading
    can rebuild the EXACT module the weights were trained in — without it a
    reduced-width checkpoint pairs with the registry's default widths and
    fails at apply time.

    (The reference has no model checkpointing at all — SURVEY.md §5; this plus
    orbax integration in utils gives train/resume capability.)
    """
    flat = {}
    for prefix, tree in (("params", state.params), ("batch_stats", state.batch_stats)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path_keys, leaf in leaves:
            key = prefix + "/" + "/".join(str(getattr(k, "key", k)) for k in path_keys)
            flat[key] = np.asarray(leaf)
    if build_kwargs:
        import json

        flat["__build_kwargs__"] = np.asarray(json.dumps(build_kwargs))
    np.savez(path, **flat)


def load_checkpoint_params(path) -> dict:
    """Load a save_checkpoint npz back into nested {params, batch_stats}."""
    flat = np.load(path)
    out: dict = {}
    for key in flat.files:
        if key.startswith("__"):  # metadata entries, not weight leaves
            continue
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return out


def load_checkpoint_build_kwargs(path) -> dict:
    """Architecture overrides stored by save_checkpoint (empty for
    checkpoints trained with registry defaults, including all pre-existing
    files). JSON round-trip turns tuples into lists; restore tuples so
    flax module fields hash/compare as the originals did."""
    import json

    flat = np.load(path)
    if "__build_kwargs__" not in flat.files:
        return {}
    kw = json.loads(str(flat["__build_kwargs__"]))
    return {k: tuple(v) if isinstance(v, list) else v for k, v in kw.items()}


def save_checkpoint_orbax(state: TrainState, path) -> bool:
    """Orbax checkpoint (full TrainState incl. optimizer) when orbax is
    installed; returns False otherwise (npz fallback covers params)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    from pathlib import Path

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            Path(path).absolute(),
            {"params": state.params, "batch_stats": state.batch_stats,
             "step": state.step},
        )
    return True


def load_checkpoint_orbax(path, target=None):
    """Restore an orbax checkpoint; pass ``target`` (a pytree of like-shaped
    arrays, e.g. a fresh ``init_train_state`` result's {params, batch_stats,
    step}) to get shape/dtype validation and correct sharding placement
    instead of a blind dict restore."""
    import orbax.checkpoint as ocp
    from pathlib import Path

    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(Path(path).absolute(), target=target)
        return ckptr.restore(Path(path).absolute())
