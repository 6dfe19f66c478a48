"""Bounded experiment: bf16 BatchNorm for the memory-bound Dense models.

The roofline table (BASELINE.md) shows DenseCPD HBM-bound at 48% of its
bandwidth roofline with 16.9 GB accessed per batch-512 step. Every dense
layer round-trips the FULL concatenated feature tensor through float32 for
BatchNorm (`x.astype(jnp.float32)` + `BatchNorm(dtype=f32)`,
models/densenet.py) — on a memory-bound model that doubles the bytes of
every BN read/write that XLA fails to fuse away. Inference BN is just an
affine scale+shift, so bf16 compute with fp32 params/stats should be
numerically harmless.

This measures DenseCPD throughput with (a) the production fp32-BN model,
(b) a bf16-BN variant, and reports the probability max-delta between them
on identical inputs. Decision rule: adopt (b) for inference if it is
>3% faster and the argmax predictions are identical.

Usage: python scripts/dense_bn_experiment.py
"""
from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import functools
import json
import time
import typing as t

import numpy as np


def build_bf16bn_densecpd():
    """DenseCPD with BN computed in compute_dtype (params/stats fp32)."""
    import jax.numpy as jnp
    from flax import linen as nn

    from timed_design_tpu.models.layers import global_average_pool_3d

    class _DenseLayer(nn.Module):
        growth_rate: int
        compute_dtype: t.Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.compute_dtype)(x)
            h = nn.relu(h)
            h = nn.Conv(4 * self.growth_rate, (1, 1, 1),
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.compute_dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(self.growth_rate, (3, 3, 3), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(h)
            return jnp.concatenate([x, h], axis=-1)

    class _Transition(nn.Module):
        features: int
        compute_dtype: t.Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.compute_dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(self.features, (1, 1, 1), dtype=self.compute_dtype,
                        param_dtype=jnp.float32)(x)
            return nn.avg_pool(x, (2, 2, 2), strides=(2, 2, 2))

    class DenseNet3D(nn.Module):
        n_classes: int = 20
        growth_rate: int = 16
        block_layers: tuple = (6, 6, 6)
        init_features: int = 32
        compute_dtype: t.Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False, logits: bool = False):
            x = x.astype(self.compute_dtype)
            x = nn.Conv(self.init_features, (3, 3, 3), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            for bi, n_layers in enumerate(self.block_layers):
                for _ in range(n_layers):
                    x = _DenseLayer(self.growth_rate, self.compute_dtype)(
                        x, train=train)
                if bi != len(self.block_layers) - 1:
                    x = _Transition(x.shape[-1] // 2, self.compute_dtype)(
                        x, train=train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(
                x.astype(jnp.float32))
            x = nn.relu(x)
            x = global_average_pool_3d(x)
            x = nn.Dense(self.n_classes, param_dtype=jnp.float32)(x)
            return x if logits else nn.softmax(x, axis=-1)

    return DenseNet3D()


def measure(module, variables, x, tag, base):
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.utils.xla_opts import tpu_compiler_options

    @functools.partial(
        jax.jit,
        compiler_options=tpu_compiler_options(model_name="DenseCPD"),
    )
    def step(v, x, i):
        return module.apply(v, x + (i % 251).astype(jnp.bfloat16)).sum()

    def round_(n, b):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(b + i + 1))
        float(out)
        return time.perf_counter() - t0

    round_(5, base)  # warm; disjoint (base+i+1)%251 ranges per variant
    dt = (round_(40, base + 60) - round_(10, base + 10)) / 30
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import densecpd

    batch = 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 21, 21, 21, 5)), jnp.bfloat16)

    prod = densecpd(compute_dtype=jnp.bfloat16)
    variables = jax.jit(prod.init)(jax.random.key(0), x[:1])
    bf16bn = build_bf16bn_densecpd()
    # identical parameters: the variant has the same tree structure
    dt_prod = measure(prod, variables, x, "fp32bn", 0)
    dt_b = measure(bf16bn, variables, x, "bf16bn", 120)

    p1 = np.asarray(jax.jit(prod.apply)(variables, x[:64]), np.float64)
    p2 = np.asarray(jax.jit(bf16bn.apply)(variables, x[:64]), np.float64)
    print(json.dumps({
        "fp32bn_ms": round(1e3 * dt_prod, 2),
        "bf16bn_ms": round(1e3 * dt_b, 2),
        "speedup": round(dt_prod / dt_b, 3),
        "fp32bn_frames_per_s": round(batch / dt_prod, 0),
        "bf16bn_frames_per_s": round(batch / dt_b, 0),
        "argmax_disagreement_rate": round(
            float((p1.argmax(1) != p2.argmax(1)).mean()), 4),
        "prob_max_abs_delta": round(float(np.abs(p1 - p2).max()), 6),
    }))


if __name__ == "__main__":
    main()
