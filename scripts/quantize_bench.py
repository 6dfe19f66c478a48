"""Measure quantized vs bf16 inference for every architecture (VERDICT r4
next #1): the model-level verdict on int8/w8 for this chip's XLA build.

Round-2 micro-measurements (TODO.md "Quantization was MEASURED") showed XLA
exposes no fast int8 MXU path (int8 4096^3 dot: 2.2x SLOWER than bf16;
int8 L4-shape conv3d 15.3 ms vs bf16 12.0 ms). This script closes the
model-level question for all 5 architectures through the REAL quantized
execution path (models/quantize.py via the engine's Predictor), using the
same marginal-throughput methodology as bench.py (unique bf16-exact input
perturbations per step; value fetch as the completion barrier).

Usage: python scripts/quantize_bench.py [--models TIMED,DenseNet,...]
Writes a markdown table to stdout; paste the verdict into BASELINE.md.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MODELS = ["TIMED", "TIMED_rotamer", "ProDCoNN", "DenseNet", "DenseCPD"]


def bench_model(name: str, quantize: str | None, batch: int = 512,
                salt: int = 0) -> float:
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import get_model_spec
    from timed_design_tpu.models.quantize import quantize_fn
    from timed_design_tpu.utils.xla_opts import tpu_compiler_options
    from timed_design_tpu.voxel import Codec

    spec = get_model_spec(name)
    module = spec.build(compute_dtype=jnp.bfloat16)
    codec = Codec.from_string(spec.codec)
    c = codec.n_channels
    x = jnp.asarray(
        np.random.default_rng(salt).random((batch, 21, 21, 21, c)),
        jnp.bfloat16,
    )
    variables = jax.jit(module.init)(jax.random.key(0), x[:1])

    fn = quantize_fn(lambda v, x: module.apply(v, x), quantize)

    @functools.partial(
        jax.jit,
        compiler_options=tpu_compiler_options(model_name=name),
    )
    def step(v, x, i):
        probs = fn(v, x + (i % 251).astype(jnp.bfloat16))
        return probs.astype(jnp.float32).sum() + i.astype(jnp.float32)

    float(step(variables, x, jnp.int32(0)))  # compile + sync

    def timed_round(n: int, base: int) -> float:
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(base + i + 1))
        float(out)
        return time.perf_counter() - t0

    timed_round(3, 0)
    n_small, n_large = 10, 40
    dt_small = timed_round(n_small, 10)
    dt_large = timed_round(n_large, 100)
    return (n_large - n_small) * batch / max(dt_large - dt_small, 1e-6)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default=",".join(MODELS))
    ap.add_argument("--modes", type=str, default="bf16,int8,w8")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    modes = [m if m != "bf16" else None for m in args.modes.split(",")]
    names = args.models.split(",")
    rows = []
    for i, name in enumerate(names):
        row = {"model": name}
        for j, mode in enumerate(modes):
            tag = mode or "bf16"
            rate = bench_model(name, mode, batch=args.batch,
                               salt=i * 31 + j * 7)
            row[tag] = rate
            print(f"# {name} {tag}: {rate:,.0f} frames/s", file=sys.stderr)
        rows.append(row)

    tags = [m or "bf16" for m in modes]
    print("| Model | " + " | ".join(f"{t} frames/s" for t in tags)
          + " | int8/bf16 |")
    print("|---|" + "---|" * (len(tags) + 1))
    for row in rows:
        ratio = (
            f"{row['int8'] / row['bf16']:.2f}x"
            if "int8" in row and "bf16" in row else "—"
        )
        print(f"| {row['model']} | "
              + " | ".join(f"{row[t]:,.0f}" for t in tags)
              + f" | {ratio} |")


if __name__ == "__main__":
    main()
