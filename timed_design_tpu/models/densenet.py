"""3D DenseNet + DenseCPD re-implementations (native Flax).

The reference ships Keras re-implementations of DenseNet-style sequence
design models and DenseCPD (Qi & Zhang 2020, "DenseCPD: improving the
accuracy of neural-network-based computational protein sequence design with
DenseNet") as release `.h5` files (README.md:11, ui.py:732-748).

Structure: dense blocks where each layer's input is the concatenation of all
previous feature maps (growth-rate convs, BN-ReLU-Conv ordering), separated
by transition layers (1x1x1 conv + average pool), ending in GAP + softmax.
DenseCPD is the deeper configuration operating on the same residue frames.

Released weights load via models/keras_import.py; these are the trainable
TPU-native definitions.
"""
from __future__ import annotations

import typing as t

import jax.numpy as jnp
from flax import linen as nn

from .layers import global_average_pool_3d


class _DenseLayer(nn.Module):
    growth_rate: int
    compute_dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x.astype(jnp.float32))
        h = nn.relu(h).astype(self.compute_dtype)
        h = nn.Conv(4 * self.growth_rate, (1, 1, 1), dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(h.astype(jnp.float32))
        h = nn.relu(h).astype(self.compute_dtype)
        h = nn.Conv(self.growth_rate, (3, 3, 3), padding="SAME",
                    dtype=self.compute_dtype, param_dtype=jnp.float32)(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    features: int
    compute_dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.relu(x).astype(self.compute_dtype)
        x = nn.Conv(self.features, (1, 1, 1), dtype=self.compute_dtype,
                    param_dtype=jnp.float32)(x)
        return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))


class DenseNet3D(nn.Module):
    n_classes: int = 20
    growth_rate: int = 12
    block_layers: tuple[int, ...] = (4, 4, 4)
    init_features: int = 24
    compute_dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, logits: bool = False):
        x = x.astype(self.compute_dtype)
        x = nn.Conv(self.init_features, (3, 3, 3), padding="SAME",
                    dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        for bi, n_layers in enumerate(self.block_layers):
            for _ in range(n_layers):
                x = _DenseLayer(self.growth_rate, self.compute_dtype)(x, train=train)
            if bi != len(self.block_layers) - 1:
                x = _Transition(x.shape[-1] // 2, self.compute_dtype)(x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.relu(x)
        x = global_average_pool_3d(x)
        x = nn.Dense(self.n_classes, param_dtype=jnp.float32)(x)
        return x if logits else nn.softmax(x, axis=-1)


def densenet(n_classes: int = 20, **kw) -> DenseNet3D:
    return DenseNet3D(n_classes=n_classes, **kw)


def densecpd(n_classes: int = 20, **kw) -> DenseNet3D:
    """DenseCPD: the deeper DenseNet configuration."""
    return DenseNet3D(
        n_classes=n_classes, growth_rate=16, block_layers=(6, 6, 6),
        init_features=32, **kw,
    )
