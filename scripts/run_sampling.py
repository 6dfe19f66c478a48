#!/usr/bin/env python
"""Temperature-sweep MC sampling over saved predictions.

Role of the reference's scripts/run_sampling.sh (200 samples x temperatures
{0.1, 0.5, 1, 2, 5} x all structures, 35 worker processes) — here every
temperature runs as batched device programs in one process.

Usage: python scripts/run_sampling.py MODEL.csv MODEL.txt [SAMPLE_N]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root checkout

from timed_design_tpu.analyse import run_temperature_sweep

if __name__ == "__main__":
    pred, dmap = Path(sys.argv[1]), Path(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    out = run_temperature_sweep(pred, dmap, sample_n=n)
    for temp, paths in out.items():
        print(f"T={temp}:", *paths, sep="\n  ")
