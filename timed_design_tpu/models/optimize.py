"""Inference-graph optimization: exact BatchNorm folding for TIMED.

TIMED's block order is Conv -> ELU -> BatchNorm (README.md:254), so BN cannot
fold backward into its own conv (ELU sits between) — but every BN output
feeds a linear op (the next Conv or the 1x1x1 head), so it folds FORWARD:

    BN(e) = a * e + b           a = gamma/sqrt(var+eps), b = beta - mean*a
    Conv(BN(e)) = Conv'(e) + bias_map
        Conv'   = kernel scaled by a along the input-channel axis
        bias_map = Conv(b * ones)   (spatially varying near borders because
                   SAME padding pads the *BN output* with zeros, so the
                   constant-b field is clipped at the frame boundary —
                   precomputed once at fold time, exact)

`fold_timed_bn` rewrites a TIMED params/batch_stats tree into a BN-free
parameterization applied by `timed_inference_apply`; outputs are equal up to
float rounding (test asserts 1e-5) and the BN VPU passes disappear
(~13% step time measured on v5e).
"""
from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np


def fold_timed_bn(
    params: dict,
    batch_stats: dict,
    eps: float = 1e-3,
    spatial: tuple[int, int, int] = (21, 21, 21),
) -> tuple[dict, int]:
    """TIMED variables -> (folded param tree for a plain apply fn, n_blocks).

    Returns a dict consumed by `timed_inference_apply`, not a flax module —
    the folded graph is simple enough that a pure function is clearer than
    a Module with shape-dependent params.
    """
    blocks = sorted(
        (k for k in params if k.startswith("ConvBlock_")),
        key=lambda k: int(k.split("_")[1]),
    )
    folded: dict[str, t.Any] = {}
    a_prev = None  # BN scale of the previous block
    b_prev = None
    for i, block in enumerate(blocks):
        kernel = np.asarray(params[block]["Conv_0"]["kernel"], np.float64)
        bias = np.asarray(params[block]["Conv_0"]["bias"], np.float64)
        if a_prev is not None:
            # scale input channels by previous BN's 'a'
            kernel = kernel * a_prev[None, None, None, :, None]
            # spatially-varying bias from previous BN's 'b' through SAME pad
            ones_field = np.broadcast_to(
                b_prev, (1, *spatial, b_prev.shape[0])
            ).astype(np.float32)
            bias_map = jax.lax.conv_general_dilated(
                jnp.asarray(ones_field),
                jnp.asarray(params[block]["Conv_0"]["kernel"], jnp.float32),
                window_strides=(1, 1, 1), padding="SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            folded[f"bias_map_{i}"] = np.asarray(bias_map[0], np.float32)
        folded[f"kernel_{i}"] = kernel.astype(np.float32)
        folded[f"bias_{i}"] = bias.astype(np.float32)

        bn_p = params[block]["BatchNorm_0"]
        bn_s = batch_stats[block]["BatchNorm_0"]
        a = np.asarray(bn_p["scale"], np.float64) / np.sqrt(
            np.asarray(bn_s["var"], np.float64) + eps
        )
        b = np.asarray(bn_p["bias"], np.float64) - np.asarray(bn_s["mean"], np.float64) * a
        a_prev, b_prev = a, b

    head_kernel = np.asarray(params["Conv_0"]["kernel"], np.float64)
    head_bias = np.asarray(params["Conv_0"]["bias"], np.float64)
    # 1x1x1 head: the b field passes through unpadded -> constant bias shift
    folded["kernel_head"] = (
        head_kernel * a_prev[None, None, None, :, None]
    ).astype(np.float32)
    folded["bias_head"] = (
        head_bias + np.einsum("c,xyzco->o", b_prev, head_kernel)
    ).astype(np.float32)
    return folded, len(blocks)


def timed_inference_apply(
    folded: dict, x, n_blocks: int, compute_dtype=jnp.float32, logits: bool = False
):
    """BN-free TIMED forward with folded parameters. Jit/pjit as usual.

    The whole elementwise chain stays in ``compute_dtype`` (the MXU
    accumulates in fp32 internally regardless); only the final head conv
    keeps an fp32 accumulator so the softmax sees full-precision logits.
    """
    dn = ("NDHWC", "DHWIO", "NDHWC")
    x = x.astype(compute_dtype)
    for i in range(n_blocks):
        bias = jnp.asarray(folded[f"bias_{i}"], compute_dtype)
        if i > 0:
            bias = bias + jnp.asarray(folded[f"bias_map_{i}"], compute_dtype)
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(folded[f"kernel_{i}"], compute_dtype),
            window_strides=(1, 1, 1), padding="SAME", dimension_numbers=dn,
        )
        x = jax.nn.elu(x + bias)
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(folded["kernel_head"], compute_dtype),
        window_strides=(1, 1, 1), padding="SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    x = x + jnp.asarray(folded["bias_head"], jnp.float32)
    x = x.mean(axis=(1, 2, 3))
    return x if logits else jax.nn.softmax(x, axis=-1)
