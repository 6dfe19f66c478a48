"""`sample` CLI — Monte-Carlo sequence sampling from saved predictions.

Flag surface mirrors the reference's sample.py:96-149 (minus --workers: the
device sampler replaces the process pool; the flag is accepted and ignored
for drop-in compatibility).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from ..sample import SampleConfig, main_sample


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MC-sample sequences from prediction matrix")
    p.add_argument("--path_to_pred_matrix", type=str, required=True)
    p.add_argument("--path_to_datasetmap", type=str, default="datasetmap.txt")
    p.add_argument("--predict_rotamers", action="store_true")
    p.add_argument("--sample_n", type=int, default=100)
    p.add_argument("--save_as", type=str, default="all", choices=["fasta", "json", "all"])
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--support_old_datasetmap", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--workers", type=int, default=0,
                   help="Ignored (sampling runs on device); kept for CLI parity")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    paths = main_sample(
        SampleConfig(
            path_to_pred_matrix=Path(args.path_to_pred_matrix),
            path_to_datasetmap=Path(args.path_to_datasetmap),
            predict_rotamers=args.predict_rotamers,
            sample_n=args.sample_n,
            save_as=args.save_as,
            temperature=args.temperature,
            support_old_datasetmap=args.support_old_datasetmap,
            seed=args.seed,
        )
    )
    print("Wrote:", *paths, sep="\n  ")


if __name__ == "__main__":
    main()
