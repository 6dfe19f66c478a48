#!/usr/bin/env python
"""Benchmark the whole model zoo over a frame dataset.

Role of the reference's scripts/run_benchmark_models.sh (batch 500 over all
models on one GPU) — here one process drives every model through the
TPU engine and prints a sequence-recovery summary table.

Usage: python scripts/run_benchmark_models.py DATASET.hdf5 [OUTPUT_DIR]
"""
import json
import sys
from pathlib import Path

from timed_design_tpu.analyse import run_model_benchmark

MODELS = ["TIMED", "TIMED_Deep", "ProDCoNN", "DenseNet", "DenseCPD"]

if __name__ == "__main__":
    dataset = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path("benchmark_out")
    results = run_model_benchmark(MODELS, dataset, out, batch_size=512)
    print(json.dumps(results, indent=2, default=float))
