"""Post-training quantized inference for the conv stacks.

The reference has no quantization (its forward is fp32 Keras,
predict.py:142); this is a TPU-native performance lever targeting the two
throughput regimes of BASELINE.md's rooflines at once: the compute-bound
TIMED family (int8 MXU throughput is nominally ~2x bf16) and the HBM-bound
Dense models (int8 activations halve the dense-block concat traffic).

Design: one interception point — ``jax.lax.conv_general_dilated`` — wrapped
under a trace-scoped context manager. Every model in the zoo reaches its
convs through that call (Flax ``nn.Conv`` and the Keras-h5 graph executor,
models/keras_import.py:263), so a single transform quantizes the whole zoo
with zero per-model code and exactly reproduces the unquantized graph when
inactive (the patch consults a contextvar at TRACE time only; traced
programs bake in whichever path was active).

Schemes (``mode``):
  * ``"int8"``        weights per-output-channel symmetric int8 + dynamic
                      per-tensor symmetric int8 activations; real integer
                      convolution with int32 accumulation (the SPEED
                      measurement path).
  * ``"int8-fake"``   identical quantize->dequantize numerics but float
                      convolution (isolates int8 ACCURACY from XLA's int8
                      kernel support; accumulation differs: f32 vs int32).
  * ``"w8"``          weight-only int8 quantize->dequantize, float conv
                      (halves weight bytes; activations untouched).

Measured verdict on this chip/XLA build (v5e, see BASELINE.md
"Quantized inference"): XLA exposes no fast int8 conv path — int8 convs run
SLOWER than bf16 — so none of these modes is the production default; they
are maintained as a measured negative result plus an accuracy
characterization, re-certified per round by ``bench.py`` device checks.
"""
from __future__ import annotations

import contextlib
import contextvars
import typing as t

import jax
import jax.numpy as jnp

MODES = ("int8", "int8-fake", "w8")

_MODE: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "td_quantize_mode", default=None
)
_orig_conv = None


def _install() -> None:
    """Idempotently swap ``jax.lax.conv_general_dilated`` for the gate.

    Both call sites resolve the attribute at call time (``lax.conv_...``),
    so patching the module attribute reaches Flax and the Keras executor
    alike. With the contextvar unset the gate delegates immediately — the
    only overhead is one ``ContextVar.get`` per conv at TRACE time.
    """
    global _orig_conv
    if _orig_conv is not None:
        return
    _orig_conv = jax.lax.conv_general_dilated
    jax.lax.conv_general_dilated = _gated_conv


def _gated_conv(lhs, rhs, *args, **kwargs):
    mode = _MODE.get()
    if mode is None:
        return _orig_conv(lhs, rhs, *args, **kwargs)
    # normalize positional/keyword forms once (dimension_numbers is the 7th
    # positional parameter — Flax and the Keras executor both pass keywords,
    # but the gate must be correct for any caller)
    import inspect

    bound = inspect.signature(_orig_conv).bind(lhs, rhs, *args, **kwargs)
    bound.apply_defaults()
    return _quantized_conv(mode, dict(bound.arguments))


def _quantized_conv(mode: str, call: dict):
    lhs, rhs = call["lhs"], call["rhs"]
    quantizable = (
        call.get("feature_group_count", 1) == 1
        and call.get("batch_group_count", 1) == 1
        and jnp.issubdtype(jnp.result_type(lhs), jnp.floating)
    )
    if quantizable:
        try:
            dn = jax.lax.conv_dimension_numbers(
                lhs.shape, rhs.shape, call.get("dimension_numbers")
            )
        except Exception:
            quantizable = False
    if not quantizable:
        return _orig_conv(**call)
    # rhs_spec: (out_feature, in_feature, *spatial) axis positions
    out_ax = int(dn.rhs_spec[0])

    f32 = jnp.float32
    # per-output-channel symmetric weight scale: max|w| over every axis
    # except the output-feature axis, mapped onto 127
    red = tuple(i for i in range(rhs.ndim) if i != out_ax)
    w32 = rhs.astype(f32)
    s_w = jnp.max(jnp.abs(w32), axis=red, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, jnp.finfo(f32).tiny)
    wq = jnp.clip(jnp.round(w32 / s_w), -127, 127)

    if mode == "w8":
        return _orig_conv(**{**call, "rhs": (wq * s_w).astype(rhs.dtype)})

    # dynamic per-tensor symmetric activation scale (no calibration pass;
    # the max is one fused reduction over an array the conv reads anyway)
    x32 = lhs.astype(f32)
    s_x = jnp.max(jnp.abs(x32)) / 127.0
    s_x = jnp.maximum(s_x, jnp.finfo(f32).tiny)
    xq = jnp.clip(jnp.round(x32 / s_x), -127, 127)

    if mode == "int8-fake":
        return _orig_conv(**{
            **call,
            "lhs": (xq * s_x).astype(lhs.dtype),
            "rhs": (wq * s_w).astype(rhs.dtype),
        })

    # real integer convolution, int32 accumulation
    acc = _orig_conv(**{
        **call,
        "lhs": xq.astype(jnp.int8),
        "rhs": wq.astype(jnp.int8),
        "preferred_element_type": jnp.int32,
    })
    # map the kernel's out-feature scale onto the OUTPUT layout's feature
    # axis (out_spec: (batch, feature, *spatial) positions)
    out_feat_ax = int(dn.out_spec[1])
    shape = [1] * acc.ndim
    shape[out_feat_ax] = acc.shape[out_feat_ax]
    scale = (s_x * jnp.reshape(s_w, (-1,))).reshape(shape)
    return (acc.astype(f32) * scale).astype(lhs.dtype)


@contextlib.contextmanager
def quantized_convs(mode: str | None):
    """Trace-scope: convs traced inside run in the given quantized scheme.

    Must be active while the forward is TRACED (jit caches whatever was
    traced); wrap the jitted callable with ``quantize_fn`` so retraces get
    the same treatment.
    """
    if mode is None:
        yield
        return
    if mode not in MODES:
        raise ValueError(f"quantize mode must be one of {MODES}, got {mode!r}")
    _install()
    token = _MODE.set(mode)
    try:
        yield
    finally:
        _MODE.reset(token)


def quantize_fn(fn: t.Callable, mode: str | None) -> t.Callable:
    """Wrap a forward callable so every trace runs under ``mode``."""
    if mode is None:
        return fn
    if mode not in MODES:
        raise ValueError(f"quantize mode must be one of {MODES}, got {mode!r}")

    def wrapped(*args, **kwargs):
        with quantized_convs(mode):
            return fn(*args, **kwargs)

    return wrapped
