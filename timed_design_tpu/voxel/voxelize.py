"""On-device voxelizer: atom arrays -> (R, V, V, V, C) frame tensors.

The TPU-native replacement for aposteriori's NumPy voxelization inner loop
(SURVEY.md §2.3): all residues of a structure are voxelized in one XLA
program. For every (residue, atom) pair the atom is expressed in the
residue's frame, spread over a 3x3x3 voxel neighborhood (Gaussian mode) or
its nearest voxel (boolean mode), and accumulated with a single scatter-add —
XLA lowers this to a sorted segment-sum on TPU. Work is chunked over
residues with `lax.map` to bound memory at (chunk, A, 27) intermediates.

Gaussian spreading (documented convention; exact parity with aposteriori is
guaranteed only on the HDF5 ingest path, see io/h5frames.py): each atom's
unit density is distributed over the 27 neighboring voxels proportionally to
the product of per-axis Gaussian integrals over each voxel extent, with
sigma = the element's van der Waals radius, then renormalized to sum to 1 so
every atom contributes exactly one unit of density; out-of-frame voxels are
dropped after normalization. Property codecs (P/Q) additionally accumulate
(density x property-of-parent-residue) into the property channel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erf

from .codec import Codec
from .frames import FrameAtoms

_SQRT2 = 1.4142135623730951

# Static 27-point neighborhood offsets.
_NEIGHBORHOOD = np.stack(
    np.meshgrid(np.arange(-1, 2), np.arange(-1, 2), np.arange(-1, 2), indexing="ij"),
    axis=-1,
).reshape(27, 3)


def _phi_integral(lo, hi, sigma):
    """Integral of a unit Gaussian N(0, sigma^2) over [lo, hi]."""
    return 0.5 * (erf(hi / (sigma * _SQRT2)) - erf(lo / (sigma * _SQRT2)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_channels", "prop_channel", "voxels_per_side", "voxel_size",
        "gaussian", "chunk", "spread",
    ),
)
def voxelize(
    atoms_xyz: jax.Array,  # (A, 3)
    atom_channel: jax.Array,  # (A,) int32, -1 = dropped
    atom_sigma: jax.Array,  # (A,)
    atom_prop: jax.Array,  # (A,)
    ca: jax.Array,  # (R, 3)
    rot: jax.Array,  # (R, 3, 3)
    *,
    n_channels: int,
    prop_channel: int = -1,
    voxels_per_side: int = 21,
    voxel_size: float = 1.0,
    gaussian: bool = True,
    chunk: int = 32,
    spread: str = "integral",
) -> jax.Array:
    """Voxelize all residues of one structure. Returns (R, V, V, V, C) float32.

    ``spread`` (gaussian mode): 'integral' = per-axis N(0, sigma^2) integral
    over each voxel extent (default), 'pdf' = pdf evaluated at voxel centers;
    both renormalize to unit sum over the 27-neighborhood. The two candidate
    aposteriori conventions — see docs/VOXELIZER_SPEC.md §4 and
    scripts/voxel_parity.py.
    """
    V = voxels_per_side
    C = n_channels
    R = ca.shape[0]
    center = (V - 1) / 2.0

    n_chunks = -(-R // chunk)
    pad_r = n_chunks * chunk - R
    ca_p = jnp.pad(ca, ((0, pad_r), (0, 0)))
    rot_p = jnp.pad(rot, ((0, pad_r), (0, 0), (0, 0)))

    def do_chunk(args):
        ca_c, rot_c = args  # (chunk,3), (chunk,3,3)
        rel = atoms_xyz[None, :, :] - ca_c[:, None, :]  # (chunk, A, 3)
        f = jnp.einsum("rij,raj->rai", rot_c, rel)  # frame coords, Angstrom
        g = f / voxel_size + center  # continuous voxel coords

        if gaussian:
            n0 = jnp.round(g)  # (chunk, A, 3)
            v = n0[:, :, None, :] + _NEIGHBORHOOD[None, None, :, :]  # (chunk,A,27,3)
            if spread == "integral":
                lo = (v - 0.5 - g[:, :, None, :]) * voxel_size
                hi = lo + voxel_size
                w_axes = _phi_integral(lo, hi, atom_sigma[None, :, None, None])
            elif spread == "pdf":
                d = (v - g[:, :, None, :]) * voxel_size
                s = atom_sigma[None, :, None, None]
                w_axes = jnp.exp(-0.5 * (d / s) ** 2)  # pdf up to a constant
            else:
                raise ValueError(f"Unknown spread {spread!r}")
            w = jnp.prod(w_axes, axis=-1)  # (chunk, A, 27)
            w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
        else:
            v = jnp.round(g)[:, :, None, :]  # (chunk, A, 1, 3)
            w = jnp.ones(v.shape[:3], jnp.float32)

        vi = v.astype(jnp.int32)
        in_bounds = ((vi >= 0) & (vi < V)).all(-1)  # (chunk, A, K)
        ch = atom_channel[None, :, None]
        valid = in_bounds & (ch >= 0)

        # flat index into (chunk, V, V, V, C)
        r_idx = jnp.arange(chunk, dtype=jnp.int32)[:, None, None]
        size = chunk * V * V * V * C
        flat = (((r_idx * V + vi[..., 0]) * V + vi[..., 1]) * V + vi[..., 2]) * C + ch
        # drop sentinel must be positive out-of-bounds: jnp .at[] wraps
        # negative indices numpy-style, so -1 would alias the LAST element
        flat = jnp.where(valid, flat, size)

        out = jnp.zeros((size,), jnp.float32)
        out = out.at[flat.reshape(-1)].add(
            w.reshape(-1), mode="drop", indices_are_sorted=False, unique_indices=False
        )
        if prop_channel >= 0:
            flat_p = (
                ((r_idx * V + vi[..., 0]) * V + vi[..., 1]) * V + vi[..., 2]
            ) * C + prop_channel
            flat_p = jnp.where(valid, flat_p, size)
            wp = w * atom_prop[None, :, None]
            out = out.at[flat_p.reshape(-1)].add(wp.reshape(-1), mode="drop")
        return out.reshape(chunk, V, V, V, C)

    frames = jax.lax.map(
        do_chunk,
        (ca_p.reshape(n_chunks, chunk, 3), rot_p.reshape(n_chunks, chunk, 3, 3)),
    )
    frames = frames.reshape(n_chunks * chunk, V, V, V, C)[:R]
    if not gaussian:
        # boolean mode: occupancy saturates at 1 (presence, not counts —
        # spec §3). The property channel carries SIGNED values, so the
        # clamp must be symmetric: min() alone would cap two +1-charge
        # collisions at 1 while letting two -1 collisions stack to -2
        # ([RECONSTRUCTED] corner — the reference never voxelizes
        # boolean+property; released property models are gaussian-trained)
        frames = jnp.minimum(frames, 1.0)
        if prop_channel >= 0:
            frames = frames.at[..., prop_channel].set(
                jnp.maximum(frames[..., prop_channel], -1.0)
            )
    return frames


def voxelize_frame_atoms(
    fa: FrameAtoms,
    codec: Codec,
    voxels_per_side: int = 21,
    frame_edge_length: float = 21.0,
    gaussian: bool = True,
    chunk: int = 16,
    impl: str = "matmul",
    spread: str = "integral",
) -> jax.Array:
    """Host wrapper: FrameAtoms + Codec -> (R, V, V, V, C) device frames.

    ``impl``: 'matmul' (default — MXU-native separable-GEMM formulation,
    ops/matmul_voxelize.py) or 'scatter' (the segment-sum formulation here).
    Both are numerically equivalent; tests assert parity.
    """
    prop = codec.property_channel
    prop_idx = codec.channels.index(prop) if prop else -1
    voxel_size = frame_edge_length / voxels_per_side
    if spread != "integral" and impl == "matmul":
        impl = "scatter"  # only the scatter path implements the pdf variant
    if impl == "matmul":
        from ..ops.matmul_voxelize import voxelize_matmul as fn
    elif impl == "scatter":
        fn = functools.partial(voxelize, spread=spread)
    else:
        raise ValueError(f"Unknown voxelizer impl {impl!r}")
    return fn(
        jnp.asarray(fa.atoms_xyz),
        jnp.asarray(fa.atom_channel),
        jnp.asarray(fa.atom_sigma),
        jnp.asarray(fa.atom_prop),
        jnp.asarray(fa.ca),
        jnp.asarray(fa.rot),
        n_channels=codec.n_channels,
        prop_channel=prop_idx,
        voxels_per_side=voxels_per_side,
        voxel_size=voxel_size,
        gaussian=gaussian,
        chunk=chunk,
    )
