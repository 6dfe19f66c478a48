"""Device mesh + sharding helpers.

The reference's only parallelism is host multiprocessing + a single-device TF
loop (SURVEY.md §2.4). Here scale-out is expressed the TPU way: a
`jax.sharding.Mesh` with a ``data`` axis (frames are embarrassingly parallel
— the batch axis shards across chips, riding ICI) and a ``model`` axis
reserved for tensor-parallel channel sharding of the wider convolutions.
Weights for these CNNs are ~1-10 MB, so the default layout replicates them
and shards only activations.
"""
from __future__ import annotations

import typing as t

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: t.Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model) mesh over available devices.

    Defaults to all devices on the data axis — the right layout for batched
    frame inference/training with replicated weights.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        # an empty (0, n_model) mesh reshapes fine but crashes far away
        # (ZeroDivisionError on mesh.shape['data'] in fit/evaluate)
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model) needs "
            f"{max(n_data, 1) * n_model} devices; only {len(devices)} "
            f"available"
        )
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (frames/batch)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a host batch onto the mesh, sharded along axis 0.

    The batch dimension must divide the data-axis size; the engine pads
    batches to a fixed size for single-compile execution, so this holds by
    construction.
    """
    return jax.device_put(x, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
