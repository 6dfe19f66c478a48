"""Training-step throughput on one chip (frames/s, TIMED bf16 batch 512).

The reference has no training path at all (its models were trained in an
external TF workflow); this framework trains natively, so the number to
record is absolute: frames/s through one optimizer step (fwd + bwd + adam
update + BN stats), marginal-throughput methodology (disjoint unique-input
ranges, value-fetch barrier — bench.py).

Usage: python scripts/train_bench.py [--batch 512] [--model TIMED]
"""
from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--model", type=str, default="TIMED")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from timed_design_tpu.models import get_model_spec
    from timed_design_tpu.train import init_train_state, make_train_step
    from timed_design_tpu.utils.xla_opts import tpu_compiler_options

    spec = get_model_spec(args.model)
    module = spec.build(compute_dtype=jnp.bfloat16)
    optimizer = optax.adam(1e-3)
    state, _ = init_train_state(
        module, jax.random.key(0), (1, 21, 21, 21, 5), optimizer, None
    )
    base_step = make_train_step(module, optimizer)

    def perturbed_step(state, x, y, i, key):
        # the uniqueness perturbation is folded INSIDE the jit (bench.py
        # methodology): an eager `x + scalar` outside would add a full
        # 93 MB batch materialization to every measured step
        return base_step(state, x + (i % 251).astype(x.dtype), y, key)

    step = jax.jit(
        perturbed_step,
        compiler_options=tpu_compiler_options(model_name=args.model),
        donate_argnums=(0,),  # reuse the train-state buffers in place
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, 21, 21, 21, 5)), jnp.float32)
    y = jnp.asarray(np.eye(20, dtype=np.float32)[
        rng.integers(0, 20, args.batch)])

    def round_(n, base):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for i in range(n):
            # unique per-step inputs: fold the step index into the PRNG key
            # AND the frames (i%251 exact in bf16/f32, added on device)
            state, m = step(state, x, y, jnp.int32(base + i),
                            jax.random.key(base + i))
        float(m["loss"])
        return time.perf_counter() - t0

    # disjoint (base+i)%251 ranges: warm 0..4, small 10..29, large 40..119
    round_(5, 0)
    n_small, n_large = 20, 80
    dt = (round_(n_large, 40) - round_(n_small, 10)) / (n_large - n_small)
    print(json.dumps({
        "model": args.model,
        "batch": args.batch,
        "train_ms_per_step": round(1e3 * dt, 2),
        "train_frames_per_sec": round(args.batch / dt, 0),
    }))


if __name__ == "__main__":
    main()
