"""Pallas TPU kernel: fused categorical sampling with on-core PRNG.

The hot op of the MC sampler (sample/sampler.py) drawn as a single Pallas
kernel: each grid program seeds the per-core PRNG (`pltpu.prng_seed`),
generates its block of uniforms with `pltpu.prng_random_bits`, and converts
them to class indices by counting CDF entries <= u — the same inverse-CDF
semantics as the reference sampler (sampling_utils.py:81-82) and the XLA
path, so the 1e6-draw statistical test applies to both.

VMEM discipline: the naive (block, L, C) compare tensor OOMs scoped VMEM
already at L~80, C=384 (16 MB limit). The kernel streams BOTH wide axes:
classes are accumulated over 128-lane chunks with a `fori_loop`, and the
grid carries a second dimension over length blocks of `_L_BLOCK` positions,
so arbitrarily long multi-chain designs (BASELINE config #4) keep the fused
path instead of falling back to XLA. The sample-block size adapts to the
length block so the live (block, Lb, 128) chunk stays under ~4 MB.

Layout: C pads to a multiple of 128 (lanes) with CDF=2.0 so padded classes
are never selected; L pads to a multiple of 8 (sublanes), then to a multiple
of `_L_BLOCK` when length-chunking engages (Lp > _L_BLOCK).

Determinism: draws are a pure function of (seed, shape). Each grid program
seeds its PRNG with murmur3(seed, flat_program_index); for Lp <= _L_BLOCK
there is a single length block, the flat index equals the sample-block
index, and the streams are bit-identical to the pre-chunking kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLASS_CHUNK = 128
_L_BLOCK = 1024  # length-block: equals the old single-block viability bound
_VMEM_BUDGET = 4 * 1024 * 1024  # bytes for the live compare chunk


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block(Lb: int) -> int:
    """Largest multiple-of-8 sample block whose (block, Lb, 128) compare
    chunk fits the VMEM budget; clamped to [8, 256]."""
    block = _VMEM_BUDGET // (Lb * _CLASS_CHUNK * 4)
    return max(8, min(256, (block // 8) * 8))


def pallas_sampling_viable(L: int, C: int) -> bool:
    """True when the kernel's per-program VMEM working set fits. Length no
    longer bounds viability (the grid chunks L in `_L_BLOCK` blocks); only a
    class width whose (Lb, Cp) CDF block would overflow the resident budget
    disqualifies — far beyond the domain's 338-class maximum."""
    Lb = min(_round_up(max(L, 8), 8), _L_BLOCK)
    Cp = _round_up(max(C, _CLASS_CHUNK), _CLASS_CHUNK)
    return Lb * Cp * 4 <= 2 * _VMEM_BUDGET  # resident (Lb, Cp) cdf block


def _make_kernel(Lb: int, block: int, n_classes: int, n_chunks: int, n_l: int):
    def kernel(seed_ref, cdf_ref, out_ref):
        flat = pl.program_id(0) * n_l + pl.program_id(1)
        pltpu.prng_seed(seed_ref[flat])
        bits = pltpu.prng_random_bits((block, Lb))
        # uint32 -> uniform [0, 1) with 24 bits of mantissa. Mosaic has no
        # uint32->f32 cast, so shift into the int32-safe range first.
        bits24 = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 8, jnp.int32)
        u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))  # (block, Lb)

        def body(c, acc):
            cdf_chunk = cdf_ref[:, pl.ds(c * _CLASS_CHUNK, _CLASS_CHUNK)]
            le = (cdf_chunk[None, :, :] <= u[:, :, None]).astype(jnp.int32)
            return acc + le.sum(axis=-1)

        acc = jnp.zeros((block, Lb), jnp.int32)
        acc = jax.lax.fori_loop(0, n_chunks, body, acc)
        # float32 row sums often end below 1.0 (~2e-7 short): u landing in
        # that gap counts ALL n_classes entries. The XLA/reference argmax
        # form returns class 0 there — match it (and stay in range).
        out_ref[:] = jnp.where(acc >= n_classes, 0, acc)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def pallas_sample_class_indices(
    seed: jax.Array, probs: jax.Array, n_samples: int, interpret: bool = False
) -> jax.Array:
    """Draw (n_samples, L) class indices from per-residue distributions.

    ``probs``: (L, C) float32 rows (need not be exactly normalized — same
    unnormalized-row behavior as the reference: count-of-<=u semantics).
    """
    L, C = probs.shape
    Lp = _round_up(max(L, 8), 8)
    Lb = min(Lp, _L_BLOCK)
    n_l = -(-Lp // Lb)
    Lp = n_l * Lb  # grid blocks must tile evenly
    Cp = _round_up(max(C, _CLASS_CHUNK), _CLASS_CHUNK)
    block = _pick_block(Lb)
    cdf = jnp.cumsum(probs.astype(jnp.float32), axis=-1)
    cdf = jnp.pad(cdf, ((0, Lp - L), (0, Cp - C)), constant_values=2.0)

    n_blocks = -(-n_samples // block)
    # Per-program seeds: hash (seed, flat_program_index) with the murmur3
    # finalizer so nearby master seeds get unrelated streams (seed+index
    # would alias program i of seed s with program i-1 of seed s+1).
    z = jax.lax.bitcast_convert_type(
        jnp.asarray(seed, jnp.int32), jnp.uint32
    ) + jnp.arange(n_blocks * n_l, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    z = (z ^ (z >> 16)) * jnp.uint32(0x85EBCA6B)
    z = (z ^ (z >> 13)) * jnp.uint32(0xC2B2AE35)
    z = z ^ (z >> 16)
    program_seeds = jax.lax.bitcast_convert_type(z, jnp.int32)
    out = pl.pallas_call(
        _make_kernel(Lb, block, C, Cp // _CLASS_CHUNK, n_l),
        grid=(n_blocks, n_l),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Lb, Cp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, Lb), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks * block, Lp), jnp.int32),
        interpret=interpret,
    )(program_seeds, cdf)
    return out[:n_samples, :L]
