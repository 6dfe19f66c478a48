"""Per-model roofline table for the zoo (VERDICT r2 item 5).

For every architecture: XLA-compiled FLOPs and HBM bytes per batch-512
bf16 step (``compiled.cost_analysis()`` on the production program,
per-arch compiler options), measured ms/step (marginal-throughput
methodology with disjoint unique-input ranges — survives the tunneled
transport's execution cache), achieved TFLOP/s, and the percent of the
binding roofline: max(flops/peak_flops, bytes/peak_bw) is the physical
floor for the step time; "% of roofline" = floor / measured.

v5e peaks used: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python scripts/rooflines.py [--models TIMED,DenseCPD] [--quick]
Prints one JSON line per model; the table lands in BASELINE.md.
"""
from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import argparse
import functools
import json
import time

import numpy as np

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9

DEFAULT_MODELS = ["TIMED", "TIMED_rotamer", "DenseNet", "DenseCPD", "ProDCoNN"]


def roofline_one(name: str, batch: int, quick: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import get_model_spec
    from timed_design_tpu.utils.xla_opts import tpu_compiler_options

    spec = get_model_spec(name)
    module = spec.build(compute_dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 21, 21, 21, 5)), jnp.bfloat16
    )
    variables = jax.jit(module.init)(jax.random.key(0), x[:1])
    opts = tpu_compiler_options(model_name=name)

    @functools.partial(jax.jit, compiler_options=opts)
    def step(v, x, i):
        return module.apply(v, x + (i % 251).astype(jnp.bfloat16)).sum()

    lowered = step.lower(variables, x, jnp.int32(0))
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", float("nan")))
    bytes_acc = float(cost.get("bytes accessed", float("nan")))

    def round_(n, base):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(base + i + 1))
        float(out)
        return time.perf_counter() - t0

    # disjoint (base+i+1)%251 ranges: warm 1..5, small 11..30, large 101..180
    round_(5, 0)
    n_small, n_large = (5, 20) if quick else (20, 80)
    dt = (round_(n_large, 100) - round_(n_small, 10)) / (n_large - n_small)

    t_flops = flops / V5E_PEAK_BF16_FLOPS
    t_bytes = bytes_acc / V5E_PEAK_HBM_BPS
    floor = max(t_flops, t_bytes)
    return {
        "model": name,
        "batch": batch,
        "params_m": round(
            sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
            / 1e6, 3,
        ),
        "gflops_per_batch": round(flops / 1e9, 2),
        "mflops_per_frame": round(flops / batch / 1e6, 2),
        "hbm_mb_per_batch": round(bytes_acc / 1e6, 1),
        "measured_ms": round(1e3 * dt, 2),
        "frames_per_sec": round(batch / dt, 0),
        "achieved_tflops": round(flops / dt / 1e12, 1),
        "pct_bf16_peak": round(100 * flops / dt / V5E_PEAK_BF16_FLOPS, 1),
        "bound": "compute" if t_flops >= t_bytes else "memory",
        "roofline_floor_ms": round(1e3 * floor, 2),
        "pct_of_roofline": round(100 * floor / dt, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, default=",".join(DEFAULT_MODELS))
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    for name in args.models.split(","):
        for attempt in range(3):
            try:
                print(json.dumps(roofline_one(name.strip(), args.batch,
                                              args.quick)), flush=True)
                break
            except Exception as e:  # noqa: BLE001 - tunnel flakes
                print(f"# {name} attempt {attempt + 1} failed: {e}",
                      file=sys.stderr, flush=True)
                if attempt == 2:
                    raise
                time.sleep(10)


if __name__ == "__main__":
    main()
