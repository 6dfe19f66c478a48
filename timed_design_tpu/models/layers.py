"""Shared building blocks for the 3D-CNN zoo (Flax linen).

Frames are NDHWC (batch, 21, 21, 21, channels) — channels-last is both the
Keras convention (easing weight import) and the layout XLA prefers on TPU,
where the channel dim maps onto lanes. Convs run in bfloat16 with float32
accumulation when ``compute_dtype=bfloat16`` (MXU-native).
"""
from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBlock(nn.Module):
    """[Conv3D -> ELU -> BatchNorm] — the TIMED convolutional block
    (reference README.md:254: "3D Convolution Operation, followed by ELU
    Activation and Batch Normalisation")."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: str = "SAME"
    compute_dtype: t.Any = jnp.float32
    bn_momentum: float = 0.99  # Keras default; lower for short training runs
                               # (running stats lag the train-mode batch
                               # stats by ~1/(1-momentum) steps)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.elu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,  # Keras default epsilon
            dtype=jnp.float32,
        )(x.astype(jnp.float32)).astype(self.compute_dtype)
        return x


def spatial_dropout_3d(x, rate: float, deterministic: bool, rng=None):
    """SpatialDropout3D: drops whole channels (Keras semantics).

    The noise shape is (B, 1, 1, 1, C) so entire feature maps are zeroed,
    matching tf.keras.layers.SpatialDropout3D used by TIMED (README.md:254).
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0], 1, 1, 1, x.shape[-1])
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def global_average_pool_3d(x):
    """(B, D, H, W, C) -> (B, C) mean over spatial dims."""
    return x.mean(axis=(1, 2, 3))
