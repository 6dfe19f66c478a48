#!/usr/bin/env python
"""Benchmark the whole model zoo over a frame dataset.

Role of the reference's scripts/run_benchmark_models.sh (batch 500 over all
models on one GPU) — here one process drives every model through the
TPU engine and prints a sequence-recovery summary table.

Models resolve to released `.h5` weights discovered in --models-dir (same
auto-discovery as the UI); architectures without weights are skipped unless
--allow-random-weights is given (timing-only runs — recovery numbers from
random weights are meaningless).

Usage:
  python scripts/run_benchmark_models.py DATASET.hdf5 [OUTPUT_DIR]
         [--models-dir models/] [--allow-random-weights]
"""
import argparse
import json
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root checkout

from timed_design_tpu.analyse import run_model_benchmark

ZOO = ["TIMED", "TIMED_Deep", "ProDCoNN", "DenseNet", "DenseCPD"]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", type=Path)
    ap.add_argument("output", type=Path, nargs="?", default=Path("benchmark_out"))
    ap.add_argument("--models-dir", type=Path, default=Path("models"))
    ap.add_argument("--allow-random-weights", action="store_true")
    args = ap.parse_args()

    models: list[str] = []
    for name in ZOO:
        h5 = args.models_dir / f"{name}.h5"
        if h5.exists():
            models.append(str(h5))
        elif args.allow_random_weights:
            models.append(name)
        else:
            print(f"skipping {name}: no {h5} "
                  "(pass --allow-random-weights for timing-only runs)")
    results = run_model_benchmark(
        models, args.dataset, args.output, batch_size=512,
        allow_random_weights=args.allow_random_weights,
    )
    print(json.dumps(results, indent=2, default=float))
