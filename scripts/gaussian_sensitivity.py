"""Gaussian-convention sensitivity study (VOXELIZER_SPEC.md §4).

The one [RECONSTRUCTED] ambiguity in the voxelizer is whether aposteriori's
per-atom 3x3x3 gaussian kernel uses per-axis *integrals* over each voxel
extent (`spread='integral'`, our default) or the *pdf at voxel centers*
(`spread='pdf'`); exact parity needs real aposteriori output, which a
zero-egress image cannot produce. This study bounds what the ambiguity does
to PREDICTIONS instead:

1. voxelize 1ubq under both conventions (scatter impl for both) and report
   the raw frame delta;
2. train the small overfit model on convention-A frames, evaluate it on
   convention-B frames (and vice versa): argmax disagreement rate + max
   probability delta;
3. forward a set of random-init zoo architectures on both conventions and
   report the same.

If disagreement ~ 0 everywhere, the remaining risk is formally bounded: a
model trained on either convention designs the same sequences on the other.
Prints one JSON line per result; docs/VOXELIZER_SPEC.md §4 records the
measured numbers.

Usage: python scripts/gaussian_sensitivity.py [--steps 150]
"""
from __future__ import annotations

import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).parent.parent))  # repo root

import argparse
import json
from pathlib import Path


def frames_both_conventions():
    import numpy as np

    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.voxel import (
        Codec,
        structure_to_frame_atoms,
        voxelize_frame_atoms,
    )

    ubq = Path(__file__).parent.parent / "tests/testing_files/1ubq.pdb1.gz"
    codec = Codec.from_string("CNOCACB")
    fa = structure_to_frame_atoms(load_pdb(ubq), codec)
    frames = {
        spread: np.asarray(
            voxelize_frame_atoms(fa, codec, impl="scatter", spread=spread)
        )
        for spread in ("integral", "pdf")
    }
    return fa, frames


def compare_probs(pa, pb) -> dict:
    import numpy as np

    pa, pb = np.asarray(pa, np.float64), np.asarray(pb, np.float64)
    return {
        "argmax_disagreement_rate": round(
            float((pa.argmax(1) != pb.argmax(1)).mean()), 4
        ),
        "prob_max_abs_delta": round(float(np.abs(pa - pb).max()), 6),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    # default ON (the study is deterministic and fast on host); pass
    # --no-cpu to run it on the TPU build it nominally characterizes
    ap.add_argument("--cpu", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from timed_design_tpu.constants import AA3_TO_INT
    from timed_design_tpu.models import densenet, prodconn, timed
    from timed_design_tpu.train import init_train_state, make_train_step

    fa, frames = frames_both_conventions()
    delta = np.abs(frames["integral"] - frames["pdf"])
    print(json.dumps({
        "what": "raw_frames_1ubq",
        "frame_max_abs_delta": round(float(delta.max()), 6),
        "frame_mean_abs_delta": round(float(delta.mean()), 8),
        "frame_value_range": round(float(frames["integral"].max()), 4),
    }))

    y = np.zeros((len(fa.labels), 20), np.float32)
    y[np.arange(len(fa.labels)), [AA3_TO_INT[l] for l in fa.labels]] = 1.0
    y = jnp.asarray(y)

    # --- trained-model cross-evaluation -------------------------------
    for train_on, eval_on in (("integral", "pdf"), ("pdf", "integral")):
        print(f"# training on {train_on}...", file=sys.stderr, flush=True)
        module = timed(filters=(8, 16))
        opt = optax.adam(5e-3)
        state, _ = init_train_state(
            module, jax.random.key(0), (1, 21, 21, 21, 5), opt, None
        )
        step = jax.jit(make_train_step(module, opt))
        X = jnp.asarray(frames[train_on][:48])
        y_train = y[:48]
        rng = jax.random.key(1)
        for _ in range(args.steps):
            rng, sub = jax.random.split(rng)
            state, m = step(state, X, y_train, sub)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = jax.jit(lambda v, x: module.apply(v, x))
        p_same = fwd(variables, jnp.asarray(frames[train_on]))
        p_other = fwd(variables, jnp.asarray(frames[eval_on]))
        print(json.dumps({
            "what": f"overfit_timed_train_{train_on}_eval_{eval_on}",
            "train_top1": round(float(m["top1"]), 3),
            **compare_probs(p_same, p_other),
        }), flush=True)

    # --- random-init zoo forwards -------------------------------------
    zoo = {
        "TIMED": timed(),
        "DenseNet": densenet(),
        "ProDCoNN": prodconn(),
    }
    for name, module in zoo.items():
        print(f"# forward {name}...", file=sys.stderr, flush=True)
        variables = jax.jit(module.init)(
            jax.random.key(3), jnp.zeros((1, 21, 21, 21, 5))
        )
        fwd = jax.jit(lambda v, x, m=module: m.apply(v, x))
        pa = fwd(variables, jnp.asarray(frames["integral"]))
        pb = fwd(variables, jnp.asarray(frames["pdf"]))
        print(json.dumps({
            "what": f"random_init_{name}",
            **compare_probs(pa, pb),
        }), flush=True)


if __name__ == "__main__":
    main()
