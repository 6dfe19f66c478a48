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
    p.add_argument("--init_from", type=str, default=None,
                   help="Warm-start weights: a td-train checkpoint .npz, or "
                        "a Keras release .h5 (TIMED family) imported via "
                        "keras_import — fine-tune released models, a "
                        "workflow the reference has no training code for")
    p.add_argument("--val_fraction", type=float, default=0.0,
                   help="Fraction of STRUCTURES (not residues) held out for "
                        "validation; eval-mode metrics print per epoch")
    p.add_argument("--patience", type=int, default=None,
                   help="Stop after this many epochs without val_loss "
                        "improvement and restore the best epoch's weights "
                        "(requires --val_fraction > 0)")
    p.add_argument("--min_delta", type=float, default=0.0,
                   help="Minimum val_loss improvement that resets patience")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 mixed-precision training: convs compute "
                        "in bf16 on the MXU, params/BN/softmax/grads stay "
                        "fp32 (the zoo modules' compute_dtype knob)")
    p.add_argument("--class_weight", choices=("none", "balanced"),
                   default="none",
                   help="'balanced': inverse-frequency weighted "
                        "cross-entropy computed from the TRAIN split's "
                        "labels (the capability behind the reference's "
                        "*_balanced release family; 20-class heads only — "
                        "rotamer labels are not stored in frame datasets)")
    p.add_argument("--lr_schedule", choices=("constant", "cosine"),
                   default="constant")
    p.add_argument("--filters", type=str, default=None,
                   help="Override the conv-stack widths as comma ints, e.g. "
                        "'8,16' — train reduced variants of an architecture "
                        "(TIMED family; capability the reference's fixed "
                        "releases lack)")
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
        if not val_map.entries:
            raise SystemExit(
                f"--val_fraction {args.val_fraction} holds out 0 structures "
                f"of this dataset — raise it (or drop it to train without "
                f"validation)"
            )
        val_loader = FrameBatchLoader(
            dataset, val_map, batch_size=args.batch_size
        )
        dmap = train_map
    loader = FrameBatchLoader(
        dataset, dmap, batch_size=args.batch_size,
        shuffle=not args.no_shuffle, shuffle_seed=args.seed,
    )
    class_weights = None
    if args.class_weight == "balanced":
        if spec.n_classes != 20:
            raise SystemExit(
                "--class_weight balanced needs 20-class residue labels; "
                f"{args.model} has a {spec.n_classes}-class head"
            )
        from ..constants import AA3_TO_INT
        from ..train import balanced_class_weights

        # labels from an external (aposteriori) dataset can carry
        # nonstandard residues; weight from the standard ones and say so
        # rather than KeyError after the expensive map build
        labels = [AA3_TO_INT[e[3]] for e in dmap.entries if e[3] in AA3_TO_INT]
        skipped = len(dmap.entries) - len(labels)
        if skipped:
            print(f"class weights: skipped {skipped} residues with "
                  f"nonstandard labels")
        if not labels:
            raise SystemExit("--class_weight balanced: no standard-residue "
                             "labels in the training split")
        class_weights = balanced_class_weights(labels, spec.n_classes)
        lo, hi = float(class_weights[class_weights > 0].min()), float(
            class_weights.max()
        )
        print(f"balanced class weights from {len(labels)} train labels "
              f"(min {lo:.3f} / max {hi:.3f})")
    init_weights = None
    if args.init_from:
        src = Path(args.init_from)
        if src.suffix in (".h5", ".hdf5"):
            from ..models.keras_import import import_timed_params

            init_weights = import_timed_params(src)
            print(f"warm start: imported Keras release weights from {src}")
        else:
            from ..train import load_checkpoint_params

            init_weights = load_checkpoint_params(src)
            print(f"warm start: loaded checkpoint weights from {src}")
    build_kw = {}
    if args.bf16:
        import jax.numpy as jnp

        build_kw["compute_dtype"] = jnp.bfloat16
    if args.filters:
        try:
            build_kw["filters"] = tuple(
                int(w) for w in args.filters.split(",") if w.strip()
            )
        except ValueError:
            raise SystemExit(f"--filters must be comma ints, got "
                             f"{args.filters!r}")
        if not build_kw["filters"]:
            raise SystemExit("--filters parsed to an empty stack")
        if any(w <= 0 for w in build_kw["filters"]):
            raise SystemExit(
                f"--filters widths must be positive, got {args.filters!r}"
            )
    try:
        module = spec.build(bn_momentum=args.bn_momentum, **build_kw)
    except TypeError as e:
        # constructors that pin their widths (timed_deep & co pass
        # filters=... themselves and forward **kw) reject the override with
        # "multiple values" — turn that into a named refusal, not a traceback
        if "filters" in str(e) and "multiple values" in str(e):
            raise SystemExit(
                f"{args.model} fixes its own conv widths and does not "
                f"accept --filters; use TIMED/ProDCoNN-family bases that "
                f"take a filters knob"
            )
        # only the signature mismatch falls back (constructors are **kw
        # wrappers, so inspect.signature can't see the knob); any other
        # TypeError from inside a builder must surface — silently training
        # with the default momentum is the failure mode the flag prevents
        if "bn_momentum" not in str(e):
            raise
        print(f"note: {args.model} has no bn_momentum knob; "
              f"--bn_momentum ignored")
        try:
            module = spec.build(**build_kw)
        except TypeError as e2:
            if "filters" in str(e2) and "multiple values" in str(e2):
                raise SystemExit(
                    f"{args.model} fixes its own conv widths and does not "
                    f"accept --filters"
                )
            raise
    out = Path(args.output)
    export_h5 = out.suffix in (".h5", ".hdf5")
    if export_h5:
        from ..models.timed import TIMED

        # refuse BEFORE the training run, not after it
        if not isinstance(module, TIMED):
            raise SystemExit(
                f"--output {out.name}: Keras .h5 export covers the linear "
                f"TIMED family only; {args.model} has a different parameter "
                f"tree — use a .npz output and MODEL@ckpt.npz in predict"
            )
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
        init_weights=init_weights,
        class_weights=class_weights,
    )
    if export_h5:
        # release-format export: the trained model loads in our predict
        # stack AND the reference's TF stack (predict.py:121) unchanged
        from ..models import export_timed_to_h5

        export_timed_to_h5(
            state.params, state.batch_stats, out,
            n_classes=spec.n_classes, input_channels=meta.frame_dims[-1],
        )
        print(f"Exported Keras release-format h5 to {out} "
              f"after {int(state.step)} steps")
    else:
        # persist architecture overrides (not runtime knobs like
        # compute_dtype) so Name@ckpt.npz rebuilds the trained module
        arch_kw = {k: v for k, v in build_kw.items() if k != "compute_dtype"}
        save_checkpoint(state, out, build_kwargs=arch_kw or None)
        print(f"Saved checkpoint to {out} after {int(state.step)} steps")


if __name__ == "__main__":
    main()
