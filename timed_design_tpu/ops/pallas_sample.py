"""Pallas TPU kernel: fused categorical sampling with on-core PRNG.

The hot op of the MC sampler (sample/sampler.py) drawn as a single Pallas
kernel: each grid program seeds the per-core PRNG (`pltpu.prng_seed`),
generates its block of uniforms with `pltpu.prng_random_bits`, and converts
them to class indices by counting CDF entries <= u — the same inverse-CDF
semantics as the reference sampler (sampling_utils.py:81-82) and the XLA
path, so the 1e6-draw statistical test applies to both.

Uniforms never leave VMEM: for S samples x L residues x C classes the kernel
reads the (L, C) CDF once per program and writes only the (block, L) int32
indices — no (S, L, C) intermediate materializes anywhere, which is what
bounds the XLA formulation at large S.

Layout: C pads to a multiple of 128 (lanes) with CDF=2.0 so padded classes
are never selected; L pads to a multiple of 8 (sublanes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SAMPLE_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sample_kernel(seed_ref, cdf_ref, out_ref):
    # One seed per grid program -> independent streams per sample block.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    block, L = out_ref.shape
    bits = pltpu.prng_random_bits((block, L))
    # uint32 -> uniform [0, 1) with 24 bits of mantissa. Mosaic has no
    # uint32->f32 cast, so shift into the int32-safe range first.
    bits24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    cdf = cdf_ref[:]  # (L, C)
    # idx = #classes with cdf <= u  == first index where cdf > u
    le = (cdf[None, :, :] <= u[:, :, None]).astype(jnp.int32)
    out_ref[:] = le.sum(axis=-1)


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def pallas_sample_class_indices(
    seed: jax.Array, probs: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    """Draw (n_samples, L) class indices from per-residue distributions.

    ``probs``: (L, C) float32 rows (need not be exactly normalized — same
    unnormalized-row behavior as the reference: u beyond total mass selects
    the last class complement, matching count-of-<=u semantics).
    """
    L, C = probs.shape
    Lp = _round_up(max(L, 8), 8)
    Cp = _round_up(max(C, 128), 128)
    cdf = jnp.cumsum(probs.astype(jnp.float32), axis=-1)
    cdf = jnp.pad(cdf, ((0, Lp - L), (0, Cp - C)), constant_values=2.0)

    n_blocks = -(-n_samples // _SAMPLE_BLOCK)
    out = pl.pallas_call(
        _sample_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Lp, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_SAMPLE_BLOCK, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * _SAMPLE_BLOCK, Lp), jnp.int32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), cdf)
    return out[:n_samples, :L]
