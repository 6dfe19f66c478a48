#!/usr/bin/env python
"""Evaluate AF2 refolds against the design target: CA-RMSD + GDT.

Role of scripts/analyse_af2_one_folder.py / move_af2_pdb.py (PyMOL replaced
by the in-framework Kabsch superposition).

Usage: python scripts/analyse_af2_results.py TARGET.pdb AF2_OUTPUT_DIR
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root checkout

from timed_design_tpu.analyse import analyse_af2_folder

if __name__ == "__main__":
    target, af2_dir = Path(sys.argv[1]), Path(sys.argv[2])
    results = analyse_af2_folder(target, af2_dir)
    print("design,rmsd,gdt1,gdt2,gdt4,gdt8,mean_plddt")
    for r in results:
        gdt = ",".join(f"{r.gdt[c]:.3f}" for c in (1.0, 2.0, 4.0, 8.0))
        print(f"{r.design},{r.rmsd:.3f},{gdt},{r.mean_plddt:.1f}")
