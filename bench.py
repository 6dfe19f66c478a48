"""Benchmark: TIMED inference throughput (frames/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's TF/Keras CPU path — the same TIMED-scale
architecture (conv blocks 16/32/64/128 + GAP head, 296k params,
reference README.md:254) run via model.predict(batch_size=500) on this
host's CPU measured at 23.54 frames/sec (see BASELINE.md). The reference
publishes no numeric benchmarks (BASELINE.json: "published": {}), so the
operational TF path is the comparison target per BASELINE.md §"Numbers to
measure".

Methodology: batch 512, bfloat16 activations, fp32 accumulation. Every step
gets a UNIQUE input perturbation (a step-index scalar mixed into the frames)
so no execution can be cached/elided; all steps are dispatched and the wall
clock covers completion of every one (device execution is serial per chip).
This measured ~40% of v5e bf16 peak on the conv stack — physically
consistent, unlike naive same-input loops which measure as impossibly fast
through the execution cache.
"""
from __future__ import annotations

import json
import time

import numpy as np

TF_CPU_BASELINE_FRAMES_PER_SEC = 23.54  # measured in-image; BASELINE.md


def main() -> None:
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import timed

    # flagship: real-scale TIMED (296k params), bf16 MXU path (1.7x vs f32)
    model = timed(compute_dtype=jnp.bfloat16)
    batch = 512
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 21, 21, 21, 5)), jnp.bfloat16
    )
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    @jax.jit
    def step(v, x, i):
        probs = model.apply(v, x + i.astype(jnp.bfloat16) * 1e-6)
        return probs.sum() + i.astype(jnp.float32)

    float(step(variables, x, jnp.int32(0)))  # compile + true sync

    def timed_round(n: int, base: int) -> float:
        """Run n unique steps and return wall time INCLUDING a value fetch of
        the last output — on remote PJRT transports only a value fetch is a
        reliable completion barrier (block_until_ready can report eagerly)."""
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(base + i + 1))
        float(out)
        return time.perf_counter() - t0

    timed_round(5, 50_000)  # warmup
    # Marginal throughput: (dt_large - dt_small) removes the constant fetch
    # RTT, leaving pure per-step device time.
    n_small, n_large = 20, 80
    dt_small = timed_round(n_small, 10_000)
    dt_large = timed_round(n_large, 20_000)
    frames_per_sec = (n_large - n_small) * batch / max(dt_large - dt_small, 1e-6)
    print(
        json.dumps(
            {
                "metric": "timed_inference_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 1),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / TF_CPU_BASELINE_FRAMES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
