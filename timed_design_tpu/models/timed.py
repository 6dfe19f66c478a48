"""TIMED model family (native Flax implementation).

Architecture per the reference description (README.md:254 and the TIMED
paper): repeated [Conv3D -> ELU -> BatchNorm] blocks, SpatialDropout, a 1x1x1
projection to the class count, Global Average Pooling instead of a dense
head, softmax over 20 residues or 338 rotamers.

Variants (reference model zoo, ui.py:732-748 / SURVEY.md §2.2):
  TIMED                  standard widths, 20 classes
  TIMED_Deep             more/wider blocks, 20 classes
  TIMED_rotamer*         338-class head (balanced/not_so_deep/deep differ in
                         training data balance / depth, same block structure)
  TIMED_Charge/Polar     identical network, 6-channel input (property codec)

Released `.h5` weights load through models/keras_import.py; this module is
the trainable TPU-native definition.
"""
from __future__ import annotations

import typing as t

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBlock, global_average_pool_3d, spatial_dropout_3d


class TIMED(nn.Module):
    n_classes: int = 20
    filters: tuple[int, ...] = (16, 32, 64, 128)
    dropout_rate: float = 0.1
    compute_dtype: t.Any = jnp.float32
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False, logits: bool = False):
        x = x.astype(self.compute_dtype)
        for f in self.filters:
            x = ConvBlock(
                f, compute_dtype=self.compute_dtype,
                bn_momentum=self.bn_momentum,
            )(x, train=train)
        if train and self.dropout_rate > 0:
            x = spatial_dropout_3d(
                x, self.dropout_rate, deterministic=not train,
                rng=self.make_rng("dropout"),
            )
        # 1x1x1 projection to classes, then GAP (no dense head)
        x = nn.Conv(
            self.n_classes, (1, 1, 1), dtype=self.compute_dtype,
            param_dtype=jnp.float32,
        )(x)
        x = global_average_pool_3d(x.astype(jnp.float32))
        return x if logits else nn.softmax(x, axis=-1)


def timed(n_classes: int = 20, **kw) -> TIMED:
    return TIMED(n_classes=n_classes, **kw)


def timed_deep(n_classes: int = 20, **kw) -> TIMED:
    return TIMED(n_classes=n_classes, filters=(32, 64, 128, 128, 256, 256), **kw)


def timed_rotamer(**kw) -> TIMED:
    return TIMED(n_classes=338, **kw)


def timed_rotamer_deep(**kw) -> TIMED:
    return TIMED(n_classes=338, filters=(32, 64, 128, 128, 256, 256), **kw)


def timed_rotamer_not_so_deep(**kw) -> TIMED:
    return TIMED(n_classes=338, filters=(16, 32, 64), **kw)
