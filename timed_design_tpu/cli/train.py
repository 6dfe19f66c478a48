"""`train` CLI — train a zoo model on a frame dataset (capability the
reference lacks: it ships fixed .h5 releases, README.md:100-104)."""
from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a model on an HDF5 frame dataset")
    p.add_argument("--path_to_dataset", type=str, required=True)
    p.add_argument("--model", type=str, default="TIMED",
                   help="Registry name: TIMED, TIMED_Deep, ProDCoNN, DenseNet, ...")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_shuffle", action="store_true",
                   help="Disable the per-epoch global shuffle of residues")
    p.add_argument("--bn_momentum", type=float, default=0.99,
                   help="BatchNorm running-stat momentum (Keras default "
                        "0.99; use ~0.9 for short runs so eval-mode stats "
                        "converge — they lag the batch stats by "
                        "~1/(1-momentum) steps)")
    p.add_argument("--output", type=str, default="checkpoint.npz")
    p.add_argument("--val_fraction", type=float, default=0.0,
                   help="Fraction of STRUCTURES (not residues) held out for "
                        "validation; eval-mode metrics print per epoch")
    p.add_argument("--patience", type=int, default=None,
                   help="Stop after this many epochs without val_loss "
                        "improvement and restore the best epoch's weights "
                        "(requires --val_fraction > 0)")
    p.add_argument("--min_delta", type=float, default=0.0,
                   help="Minimum val_loss improvement that resets patience")
    p.add_argument("--lr_schedule", choices=("constant", "cosine"),
                   default="constant")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="Linear LR warmup steps before the schedule proper")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..io import (
        FrameBatchLoader,
        FrameDatasetMetadata,
        create_flat_dataset_map,
        split_dataset_map,
    )
    from ..models import get_model_spec
    from ..train import fit, save_checkpoint

    if args.patience is not None and args.val_fraction <= 0:
        raise SystemExit("--patience requires --val_fraction > 0")
    dataset = Path(args.path_to_dataset)
    spec = get_model_spec(args.model)
    meta = FrameDatasetMetadata.from_file(dataset)
    dmap, _ = create_flat_dataset_map(dataset)
    val_loader = None
    if args.val_fraction > 0:
        train_map, val_map = split_dataset_map(
            dmap, args.val_fraction, seed=args.seed
        )
        print(
            f"validation split: {len(val_map.entries)} residues held out "
            f"({len(train_map.entries)} train) at the structure level"
        )
        val_loader = FrameBatchLoader(
            dataset, val_map, batch_size=args.batch_size
        )
        dmap = train_map
    loader = FrameBatchLoader(
        dataset, dmap, batch_size=args.batch_size,
        shuffle=not args.no_shuffle, shuffle_seed=args.seed,
    )
    try:
        module = spec.build(bn_momentum=args.bn_momentum)
    except TypeError as e:
        # only the signature mismatch falls back (constructors are **kw
        # wrappers, so inspect.signature can't see the knob); any other
        # TypeError from inside a builder must surface — silently training
        # with the default momentum is the failure mode the flag prevents
        if "bn_momentum" not in str(e):
            raise
        print(f"note: {args.model} has no bn_momentum knob; "
              f"--bn_momentum ignored")
        module = spec.build()
    state = fit(
        module,
        loader,
        n_classes=spec.n_classes,
        input_channels=meta.frame_dims[-1],
        learning_rate=args.learning_rate,
        epochs=args.epochs,
        seed=args.seed,
        val_loader=val_loader,
        patience=args.patience,
        min_delta=args.min_delta,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
    )
    save_checkpoint(state, args.output)
    print(f"Saved checkpoint to {args.output} after {int(state.step)} steps")


if __name__ == "__main__":
    main()
