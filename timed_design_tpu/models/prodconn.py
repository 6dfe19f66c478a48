"""ProDCoNN re-implementation (native Flax).

The reference ships a Keras re-implementation of ProDCoNN (Zhang et al. 2020,
"ProDCoNN: Protein design using a convolutional neural network") as a release
`.h5` (README.md:11, ui.py:732-748). Architecture per the paper: parallel
small-kernel 3D convolutions capturing local chemistry, a pooled deeper
stack, flatten, two dense layers, softmax(20).

Exact released weights load via models/keras_import.py; this module is the
trainable definition.
"""
from __future__ import annotations

import typing as t

import jax.numpy as jnp
from flax import linen as nn


class ProDCoNN(nn.Module):
    n_classes: int = 20
    compute_dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, logits: bool = False):
        x = x.astype(self.compute_dtype)
        dt = dict(dtype=self.compute_dtype, param_dtype=jnp.float32)
        # Two parallel feature extractors with different receptive fields
        a = nn.relu(nn.Conv(16, (3, 3, 3), padding="VALID", **dt)(x))
        b = nn.relu(nn.Conv(16, (4, 4, 4), padding="VALID", **dt)(x))
        b = jnp.pad(b, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))  # match 19^3
        x = jnp.concatenate([a, b], axis=-1)
        x = nn.relu(nn.Conv(32, (3, 3, 3), padding="VALID", **dt)(x))
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding="VALID", **dt)(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, **dt)(x))
        if train:
            x = nn.Dropout(0.2, deterministic=False)(x, rng=self.make_rng("dropout"))
        # the class head runs in fp32 regardless of compute_dtype: **dt
        # here would cast the input straight back to bf16 and quantize the
        # logits before softmax (param_dtype is fp32 throughout the zoo)
        x = nn.Dense(self.n_classes, dtype=jnp.float32)(x.astype(jnp.float32))
        return x if logits else nn.softmax(x, axis=-1)


def prodconn(n_classes: int = 20, **kw) -> ProDCoNN:
    return ProDCoNN(n_classes=n_classes, **kw)
