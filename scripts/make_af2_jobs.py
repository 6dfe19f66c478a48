#!/usr/bin/env python
"""Partition sampled fastas + emit AF2 SLURM scripts.

Role of scripts/partition_structures_to_files.py + af2_script_maker.py +
run_af.sh in the reference (80 fastas/job, ampere partition).

Usage: python scripts/make_af2_jobs.py SAMPLES.fasta JOBS_DIR
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root checkout

from timed_design_tpu.analyse import make_af2_slurm_script, partition_fastas

if __name__ == "__main__":
    fasta, jobs_dir = Path(sys.argv[1]), Path(sys.argv[2])
    folders = partition_fastas(fasta, jobs_dir, per_folder=80)
    for folder in folders:
        script = make_af2_slurm_script(folder, jobs_dir)
        print(f"sbatch {script}")
