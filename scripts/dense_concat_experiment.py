"""Bounded experiment: concat-free dense blocks for DenseCPD.

The roofline table shows DenseCPD HBM-bound (16.9 GB/batch, 48% of its
bandwidth roofline), and the bf16-BN experiment proved the traffic is
concat materialization: every dense layer writes a fresh (C_in + g)-wide
tensor. This variant pre-allocates the block's final channel width once
and writes each layer's g new channels with an in-place channel-slice
update (`buf.at[..., off:off+g].set(h)` — XLA can alias the dead buffer
and update in place), reading each layer's input as a static channel
slice. Write traffic per block drops from sum(C_in + g) to sum(g)
channels IF XLA aliases; the measurement decides.

Parameter tree is identical to the production model (same submodule
names), so the same variables run both variants and outputs must match.

Usage: python scripts/dense_concat_experiment.py
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


def build_buffered_densecpd():
    import jax.numpy as jnp
    from flax import linen as nn

    from timed_design_tpu.models.layers import global_average_pool_3d

    class _DenseLayer(nn.Module):
        """Same submodule structure as models/densenet.py:_DenseLayer but
        returns ONLY the g new channels; the block writes them into the
        pre-allocated buffer."""

        growth_rate: int
        compute_dtype: t.Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(
                x.astype(jnp.float32))
            h = nn.relu(h).astype(self.compute_dtype)
            h = nn.Conv(4 * self.growth_rate, (1, 1, 1),
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(
                h.astype(jnp.float32))
            h = nn.relu(h).astype(self.compute_dtype)
            h = nn.Conv(self.growth_rate, (3, 3, 3), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(h)
            return h

    class _Transition(nn.Module):
        features: int
        compute_dtype: t.Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32)(
                x.astype(jnp.float32))
            x = nn.relu(x).astype(self.compute_dtype)
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
            import jax.numpy as jnp

            x = x.astype(self.compute_dtype)
            x = nn.Conv(self.init_features, (3, 3, 3), padding="SAME",
                        dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            g = self.growth_rate
            for bi, n_layers in enumerate(self.block_layers):
                c0 = x.shape[-1]
                c_fin = c0 + n_layers * g
                buf = jnp.zeros((*x.shape[:-1], c_fin), self.compute_dtype)
                buf = buf.at[..., :c0].set(x)
                off = c0
                for _ in range(n_layers):
                    h = _DenseLayer(g, self.compute_dtype)(
                        buf[..., :off], train=train)
                    buf = buf.at[..., off:off + g].set(h)
                    off += g
                x = buf
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


def measure(module, variables, x, base):
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
    buffered = build_buffered_densecpd()
    dt_prod = measure(prod, variables, x, 0)
    dt_buf = measure(buffered, variables, x, 120)

    p1 = np.asarray(jax.jit(prod.apply)(variables, x[:64]), np.float64)
    p2 = np.asarray(jax.jit(buffered.apply)(variables, x[:64]), np.float64)
    print(json.dumps({
        "concat_ms": round(1e3 * dt_prod, 2),
        "buffered_ms": round(1e3 * dt_buf, 2),
        "speedup": round(dt_prod / dt_buf, 3),
        "concat_frames_per_s": round(batch / dt_prod, 0),
        "buffered_frames_per_s": round(batch / dt_buf, 0),
        "argmax_disagreement_rate": round(
            float((p1.argmax(1) != p2.argmax(1)).mean()), 4),
        "prob_max_abs_delta": round(float(np.abs(p1 - p2).max()), 6),
    }))


if __name__ == "__main__":
    main()
