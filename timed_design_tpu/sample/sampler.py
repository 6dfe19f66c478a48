"""Monte-Carlo sequence sampling on device.

TPU-native redesign of the reference sampler (sample.py + design_utils/
sampling_utils.py): the reference draws ``sample_n`` sequences per structure
in a Python loop (one cumsum per draw, sampling_utils.py:123-133) fanned out
over a process pool. Here the whole (samples x residues) grid is one jitted
program: temperature scaling, inverse-CDF categorical draws, rotamer->residue
collapse, and all four sequence metrics run on device; explicit PRNG keys
make every draw reproducible (the reference's seed at sample.py:21 is dead —
it seeds a Generator it never uses).

Sampling semantics match the reference exactly (inverse CDF: first class
whose cumulative probability exceeds an independent uniform per residue,
sampling_utils.py:81-82), so the statistical recovery test
(tests/test_sampling_utils.py model, SURVEY.md §4) carries over.
"""
from __future__ import annotations

import functools
import typing as t
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AA1, ROTAMER_TO_AA
from .metrics import batched_metrics_from_counts, counts_from_codes


def apply_temperature(probs, temperature: float = 1.0):
    """``probs ** (1/T)`` renormalized row-wise — the reference's power form
    (sampling_utils.py:139-161), not logit scaling. Works on np or jnp."""
    xp = jnp if isinstance(probs, jax.Array) else np
    p = xp.asarray(probs)
    if temperature == 0:
        # T=0 is deterministic argmax (README.md:203 "equivalent to taking
        # the most probable token every time") — one-hot on the row max.
        idx = p.argmax(axis=-1)
        eye = xp.eye(p.shape[-1], dtype=p.dtype)
        return eye[idx]
    # Rescale by the row max before the power: identical after renormalization
    # but immune to the underflow the naive ``p ** (1/T)`` hits at low T.
    p = p / p.max(axis=-1, keepdims=True)
    p = p ** (1.0 / temperature)
    return p / p.sum(axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n_samples",))
def sample_class_indices(
    key: jax.Array, probs: jax.Array, n_samples: int
) -> jax.Array:
    """Draw (n_samples, L) class indices from per-residue distributions.

    ``probs``: (L, C). Inverse-CDF with an independent uniform per (sample,
    residue) — identical semantics to the reference's
    ``(cumsum(p) > u).argmax()`` (sampling_utils.py:81-82), including its
    behavior on unnormalized rows (u beyond the total mass selects class 0).

    This is the XLA formulation; on real TPUs `sample_class_indices_auto`
    dispatches to the fused Pallas kernel (ops/pallas_sample.py), which keeps
    the (S, L, C) uniform/compare intermediates in VMEM.
    """
    L, C = probs.shape
    u = jax.random.uniform(key, (n_samples, L, 1))
    cdf = jnp.cumsum(probs, axis=-1)[None, :, :]
    return jnp.argmax(cdf > u, axis=-1)


def sample_class_indices_auto(
    key: jax.Array, probs: jax.Array, n_samples: int
) -> jax.Array:
    """Backend dispatch: Pallas kernel on TPU, XLA elsewhere.

    The two backends draw from the same distribution but different PRNG
    streams (threefry vs the TPU core PRNG), so sequences differ for the
    same key; both are deterministic in (key, shape).
    """
    if jax.default_backend() == "tpu":
        from ..ops.pallas_sample import (
            _L_BLOCK,
            pallas_sample_class_indices,
            pallas_sampling_viable,
        )

        # The kernel length-chunks its grid (round 4), so it HANDLES any
        # length — but beyond its 1024-position length block XLA's fused
        # compare/argmax is measurably faster (L=4096, C=338, n=2000:
        # XLA 5.9 ms vs kernel 30.6 ms per draw batch, device-side
        # amortized loop — BASELINE.md §samplers). Dispatch is therefore a
        # measured policy, not a capability bound: Pallas at production
        # design lengths, XLA for long multi-chain biounits.
        if probs.shape[0] <= _L_BLOCK and pallas_sampling_viable(*probs.shape):
            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            return pallas_sample_class_indices(seed, probs, n_samples)
    return sample_class_indices(key, probs, n_samples)


@functools.partial(jax.jit, static_argnames=("n_samples", "rotamer_mode"))
def sample_sequences_with_metrics(
    key: jax.Array,
    probs: jax.Array,
    n_samples: int,
    rotamer_mode: bool = False,
    mask: jax.Array | None = None,
    ph: float = 7.4,
):
    """One fused program: draws + residue collapse + metrics.

    Returns (codes (n_samples, L) int32 amino-acid indices, metrics dict of
    (n_samples,) arrays). ``mask``: (L,) 1.0 for real residues (padding
    support for batched multi-structure sampling).
    """
    idx = sample_class_indices(key, probs, n_samples)
    codes = jnp.asarray(ROTAMER_TO_AA)[idx] if rotamer_mode else idx
    counts = counts_from_codes(codes, None if mask is None else mask[None, :])
    metrics = batched_metrics_from_counts(counts, ph=ph)
    return codes, metrics


def sample_structure(
    probs: np.ndarray,
    n_samples: int,
    key: jax.Array,
    rotamer_mode: bool = False,
    temperature: float = 1.0,
    backend: str = "auto",
) -> list[tuple]:
    """Sample one structure -> reference-shaped result list
    [(seq, charge, pI, MW, ext), ...] (sampling_utils.py:93-136).

    ``backend='auto'`` uses the fused Pallas PRNG kernel on TPU.
    """
    p = jnp.asarray(probs, jnp.float32)
    if temperature != 1.0:
        p = apply_temperature(p, temperature)
    if backend == "auto" and jax.default_backend() == "tpu":
        idx = sample_class_indices_auto(key, p, n_samples)
        codes = jnp.asarray(ROTAMER_TO_AA)[idx] if rotamer_mode else idx
        from .metrics import batched_metrics_from_counts, counts_from_codes

        metrics = batched_metrics_from_counts(counts_from_codes(codes))
    else:
        codes, metrics = sample_sequences_with_metrics(
            key, p, n_samples, rotamer_mode=rotamer_mode
        )
    codes = np.asarray(codes)
    out = []
    aa = np.array(list(AA1))
    for i in range(n_samples):
        seq = "".join(aa[codes[i]])
        out.append(
            (
                seq,
                float(metrics["charge"][i]),
                float(metrics["isoelectric_point"][i]),
                float(metrics["molecular_weight"][i]),
                float(metrics["molar_extinction_280"][i]),
            )
        )
    return out


@functools.partial(jax.jit, static_argnames=("n_samples", "rotamer_mode"))
def _sample_bucket(keys, probs, mask, n_samples: int, rotamer_mode: bool):
    """vmap of the fused draw+metrics program over a (B, Lp, C) bucket.

    Codes come back as uint8 (AA indices < 20): 4x fewer wire bytes on the
    fetch, and the host decodes sequences by byte-table lookup.
    """
    codes, metrics = jax.vmap(
        lambda k, p, m: sample_sequences_with_metrics(
            k, p, n_samples, rotamer_mode=rotamer_mode, mask=m
        )
    )(keys, probs, mask)
    return codes.astype(jnp.uint8), metrics


def sample_all_structures(
    pdb_to_probability: dict[str, np.ndarray],
    n_samples: int,
    seed: int = 42,
    rotamer_mode: bool = False,
    temperature: float = 1.0,
    pad_to: int = 32,
) -> dict[str, list[tuple]]:
    """Sample every structure — the `sample_with_multiprocessing` replacement
    (sampling_utils.py:164-197): structures are zero-padded to a common
    length (multiples of ``pad_to``) and processed as ONE batched device
    program per length bucket — a 59-structure production sweep is a handful
    of dispatches instead of 59 (per-dispatch latency dominates small
    programs). No process pool; results bitwise-reproducible from ``seed``
    (each structure keeps its own PRNG key; padded rows are masked out of the
    metrics and trimmed from the sequences). Note the padded draw shape means
    the stream differs from an unpadded single-structure call with the same
    key — determinism is per (seed, pad_to), as with any shape-keyed PRNG.
    """
    items = list(pdb_to_probability.items())
    if not items:
        return {}
    keys = jax.random.split(jax.random.key(seed), len(items))
    buckets: dict[tuple[int, int], list[int]] = {}
    arrays: list[np.ndarray] = []
    for i, (_, probs) in enumerate(items):
        # host-side prep: temperature on numpy (a per-structure device
        # roundtrip here costs more than the whole bucket's sampling on
        # high-RTT transports)
        arr = np.asarray(probs, np.float32)
        if temperature != 1.0:
            arr = np.asarray(apply_temperature(arr, temperature))
        arrays.append(arr)
        padded_len = -(-arr.shape[0] // pad_to) * pad_to
        buckets.setdefault((padded_len, arr.shape[1]), []).append(i)

    aa_ascii = np.frombuffer("".join(AA1).encode("ascii"), np.uint8)
    out: dict[str, list[tuple]] = {}
    for (padded_len, n_classes), idxs in buckets.items():
        P = np.zeros((len(idxs), padded_len, n_classes), np.float32)
        M = np.zeros((len(idxs), padded_len), np.float32)
        for j, i in enumerate(idxs):
            P[j, : arrays[i].shape[0]] = arrays[i]
            M[j, : arrays[i].shape[0]] = 1.0
        codes, metrics = _sample_bucket(
            keys[np.asarray(idxs)], jnp.asarray(P), jnp.asarray(M),
            n_samples, rotamer_mode,
        )
        # one vectorized byte-table lookup decodes every sequence at once
        ascii_mat = aa_ascii[np.asarray(codes)]  # (B, S, Lp) uint8
        metrics = {k: np.asarray(v) for k, v in metrics.items()}
        for j, i in enumerate(idxs):
            pdb, length = items[i][0], arrays[i].shape[0]
            row_bytes = ascii_mat[j, :, :length].tobytes()
            charge = metrics["charge"][j]
            iso = metrics["isoelectric_point"][j]
            mw = metrics["molecular_weight"][j]
            ext = metrics["molar_extinction_280"][j]
            out[pdb] = [
                (
                    row_bytes[s * length : (s + 1) * length].decode("ascii"),
                    float(charge[s]),
                    float(iso[s]),
                    float(mw[s]),
                    float(ext[s]),
                )
                for s in range(n_samples)
            ]
    return out
