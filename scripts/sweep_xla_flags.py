"""Sweep TPU compiler options for the TIMED forward step (bench.py shapes).

Measures marginal throughput (unique inputs, value-fetch barrier — the
bench.py methodology, which survives the remote-execution cache of the
tunneled transport) for each candidate `jax.jit(compiler_options=...)`
set against the current production options from `utils/xla_opts.py`.

Usage:  python scripts/sweep_xla_flags.py            # full sweep
        python scripts/sweep_xla_flags.py --quick    # fewer steps/option

Results land on stdout as one line per option set; transfer the winner to
timed_design_tpu/utils/xla_opts.py (with the measured number in the
docstring) — this script is a lab notebook, not a production path.
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import numpy as np


def measure(step, variables, x, n_small=10, n_large=40, base=0) -> float:
    """Return frames/sec via marginal-throughput timing."""
    import jax.numpy as jnp

    def round_(n, b):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(b + i + 1))
        float(out)
        return time.perf_counter() - t0

    round_(3, base + 90_000)  # warm
    dt_s = round_(n_small, base + 30_000)
    dt_l = round_(n_large, base + 60_000)
    return (n_large - n_small) * x.shape[0] / max(dt_l - dt_s, 1e-6)


def main() -> None:
    import jax
    import jax.numpy as jnp

    quick = "--quick" in sys.argv
    # --model NAME: sweep any registry architecture (default: TIMED).
    # Round-3 use: the roofline table (scripts/rooflines.py) showed the
    # Dense models HBM-bound at ~44-48% of roofline, so they get their own
    # bounded pass here.
    model_name = "TIMED"
    if "--model" in sys.argv:
        model_name = sys.argv[sys.argv.index("--model") + 1]
    from timed_design_tpu.models import get_model_spec

    spec = get_model_spec(model_name)
    model = spec.build(compute_dtype=jnp.bfloat16)
    batch = 512
    x = jnp.asarray(
        np.random.default_rng(0).random((batch, 21, 21, 21, 5)), jnp.bfloat16
    )
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    def fwd(v, x, i):
        # bitwise-distinct inputs per step (bench.py methodology: i % 251
        # is exact in bf16; a tiny *1e-6 perturbation would collapse)
        probs = model.apply(v, x + (i % 251).astype(jnp.bfloat16))
        return probs.sum() + i.astype(jnp.float32)

    candidates: list[tuple[str, dict | None]] = [
        ("default", None),
        ("vmem128M(prod)", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
        ("vmem96M", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
        ("vmem160M", {"xla_tpu_scoped_vmem_limit_kib": "163840"}),
        ("vmem192M", {"xla_tpu_scoped_vmem_limit_kib": "196608"}),
        ("vmem128M+no_lhs", {"xla_tpu_scoped_vmem_limit_kib": "131072",
                             "xla_tpu_enable_latency_hiding_scheduler": "false"}),
        ("vmem128M+aggr_fusion", {
            "xla_tpu_scoped_vmem_limit_kib": "131072",
            "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
        ("vmem128M+flash", {"xla_tpu_scoped_vmem_limit_kib": "131072",
                            "xla_tpu_enable_experimental_fusion_cost_model": "true"}),
    ]
    results = []
    for cand_idx, (name, opts) in enumerate(candidates):
        try:
            step = (
                jax.jit(fwd)
                if opts is None
                else functools.partial(jax.jit, compiler_options=opts)(fwd)
            )
            # fresh base tensor PER CANDIDATE: a shared x with only a base
            # offset is not collision-safe (offsets collapse mod 251 — a
            # +200k increment is ≡204, so candidate k+2's residue range
            # lands inside candidate k's and the transport's value-keyed
            # cache can serve those steps). A new random array makes every
            # candidate's steps bitwise-new regardless of residues.
            x_c = jnp.asarray(
                np.random.default_rng(1 + cand_idx).random(x.shape),
                jnp.bfloat16,
            )
            fps = measure(step, variables, x_c,
                          n_small=5 if quick else 10,
                          n_large=20 if quick else 40, base=0)
            results.append((fps, name))
            print(f"{name:26s} {fps:10.1f} frames/s", flush=True)
        except Exception as e:  # unknown flags fail compilation — that's data
            print(f"{name:26s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    if not results:
        print("\nno candidate compiled successfully")
        return
    results.sort(reverse=True)
    print("\nbest:", results[0][1], f"{results[0][0]:.1f} frames/s")


if __name__ == "__main__":
    main()
