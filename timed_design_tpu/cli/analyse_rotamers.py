"""`analyse_rotamers` CLI — 3-way rotamer evaluation.

Reference flow (analyse_rotamers.py:19-139): evaluate predicted rotamer
probabilities against (1) wild-type crystal rotamers, (2) SCWRL-repacked
predicted sequences, (3) SCWRL-repacked wild-type sequences; write SCWRL
energy scores to scwrl_scores.csv. SCWRL analyses require the external
SCWRL4 binary and are skipped with a message when it is absent.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Analyse rotamer predictions")
    p.add_argument("--path_to_pred_matrix", type=str, required=True,
                   help="Path to {model}_rot.csv (338-class probabilities)")
    p.add_argument("--path_to_datasetmap", type=str, default="datasetmap.txt")
    p.add_argument("--path_to_pdb", type=str, required=True,
                   help="Directory with PDB structures (local mirror; "
                        "missing codes are fetched only with --allow-fetch)")
    p.add_argument("--allow-fetch", action="store_true", dest="allow_fetch",
                   help="Download structures missing from the mirror into "
                        "its sharded layout (default off: no network)")
    p.add_argument("--fetch_base_url", type=str, default=None,
                   help="Override the download base URL (default RCSB); "
                        "useful for internal mirrors and tests")
    # --output_path / --scwrl_path are the reference's spellings
    # (analyse_rotamers.py:148,171) — accepted as aliases for drop-in use
    p.add_argument("--path_to_output", "--output_path", type=str, default=".")
    p.add_argument("--path_to_scwrl", "--scwrl_path", type=str, default=None)
    p.add_argument("--support_old_datasetmap", action="store_true")
    p.add_argument("--plot_confusion", action="store_true")
    p.add_argument("--workers", type=int, default=None,
                   help="Accepted for reference compatibility; tagging is "
                        "vectorized here and needs no process pool")
    return p


def main(argv=None) -> None:
    from ..analyse import (
        analyse_with_scwrl,
        calculate_rotamer_metrics,
        tag_structures_with_rotamers,
        ScwrlNotFoundError,
    )
    from ..analyse.scwrl import find_scwrl
    from ..constants import ROTAMER_CATEGORIES
    from ..io import extract_sequences, load_datasetmap, load_prediction_matrix

    args = build_parser().parse_args(argv)
    out = Path(args.path_to_output)
    out.mkdir(parents=True, exist_ok=True)
    pdb_dir = Path(args.path_to_pdb)

    # the reference reads the saved matrix back as float16
    # (analyse_rotamers.py:46-48): the published metrics are computed on
    # saved-precision probabilities and top-k tie-breaks must match.
    # (Renormalization then upcasts to float64 — ours stays f64 where the
    # reference's in-place assignment rounds back to f16; PARITY.md.)
    P = load_prediction_matrix(Path(args.path_to_pred_matrix), dtype=np.float16)
    dmap = load_datasetmap(Path(args.path_to_datasetmap), is_old=args.support_old_datasetmap)
    decoded = extract_sequences(dmap, P, rotamer_categories=ROTAMER_CATEGORIES)

    # Locate structures for every chain key; optionally fetch misses
    from ..analyse.rotamer import resolve_structure_paths

    fetcher = None
    if args.allow_fetch:
        from ..io.fetch import RCSB_BASE_URL, make_fetcher

        fetcher = make_fetcher(
            pdb_dir, base_url=args.fetch_base_url or RCSB_BASE_URL
        )
    pdb_paths = resolve_structure_paths(
        decoded.pdb_to_probability, pdb_dir, fetcher=fetcher
    )
    pdb_paths = {c: p for c, p in pdb_paths.items() if p is not None}
    print(f"Tagging {len(pdb_paths)} structures with crystal rotamers")
    tags, assemblies = tag_structures_with_rotamers(pdb_paths)

    # The new/SRB map format carries no real sequences — rebuild them from
    # the parsed structures (the reference does the same,
    # analyse_rotamers.py:69-71). Without this the wild-type SCWRL analysis
    # packed EMPTY sequences for new-format maps: every structure failed
    # the packer's length check and analysis 3 silently degraded to
    # "skipped".
    if not dmap.is_old:
        for pdb in decoded.pdb_to_real_sequence:
            asm = assemblies.get(pdb[:4])
            if asm is None:
                # surface the degradation: with no rebuilt sequence this
                # chain's wild-type SCWRL analysis is silently skipped
                # downstream (the reference fails loudly with a KeyError,
                # analyse_rotamers.py:69-71)
                print(f"Could not find assembly {pdb[:4]} to rebuild the "
                      f"real sequence for {pdb}; wild-type analysis will "
                      f"skip it")
                continue
            chain = next(
                (c for c in asm.chains if c.chain_id == pdb[4:]), None
            )
            if chain is not None:
                decoded.pdb_to_real_sequence[pdb] = chain.sequence1()
            else:
                print(f"Could not find chain {pdb[4:]} in {pdb[:4]} to "
                      f"rebuild the real sequence for {pdb}; wild-type "
                      f"analysis will skip it")

    # Analysis 1: predictions vs wild-type crystal rotamers
    m1 = calculate_rotamer_metrics(
        decoded.pdb_to_probability, tags, suffix="wt",
        output_path=out, plot_confusion=args.plot_confusion,
    )
    print(f"[wt] top-1 {m1['accuracy']:.4f}  AUC(ovo) {m1['auc_ovo']:.4f}")

    # Analyses 2+3 need SCWRL4
    try:
        find_scwrl(Path(args.path_to_scwrl) if args.path_to_scwrl else None)
    except ScwrlNotFoundError as e:
        print(f"Skipping SCWRL analyses: {e}")
        return

    scores_pred, _ = analyse_with_scwrl(
        decoded.pdb_to_sequence, assemblies, out, "_pred",
        Path(args.path_to_scwrl) if args.path_to_scwrl else None,
    )
    def tags_from_packed(score_keys, suffix: str) -> dict:
        # each per-chain key ("1abcA") has its OWN packed assembly (its
        # designed sequence broadcast over all chains): take chain A's tags
        # from 1abcA's file, chain B's from 1abcB's — keying one file per
        # pdb[:4] would tag every chain from whichever file came last
        tags = {}
        for pdb in score_keys:
            path = out / f"{pdb}_{suffix}.pdb"
            if not path.exists():
                continue
            t, _ = tag_structures_with_rotamers({pdb[:4]: path})
            if pdb in t:
                tags[pdb] = t[pdb]
        return tags

    tags_pred = tags_from_packed(scores_pred, "_pred")
    if tags_pred:
        m2 = calculate_rotamer_metrics(
            decoded.pdb_to_probability, tags_pred, suffix="scwrl_pred", output_path=out
        )
        print(f"[scwrl-pred] top-1 {m2['accuracy']:.4f}")
    else:
        print("[scwrl-pred] skipped: SCWRL packed no predicted sequences")

    scores_real, _ = analyse_with_scwrl(
        decoded.pdb_to_real_sequence, assemblies, out, "_real",
        Path(args.path_to_scwrl) if args.path_to_scwrl else None,
    )
    tags_real = tags_from_packed(scores_real, "_real")
    if tags_real:
        m3 = calculate_rotamer_metrics(
            decoded.pdb_to_probability, tags_real, suffix="scwrl_real", output_path=out
        )
        print(f"[scwrl-real] top-1 {m3['accuracy']:.4f}")
    else:
        print("[scwrl-real] skipped: SCWRL packed no wild-type sequences")

    with open(out / "scwrl_scores.csv", "w") as f:
        f.write("pdb,score_pred,score_real\n")
        for pdb in sorted(set(scores_pred) | set(scores_real)):
            f.write(f"{pdb},{scores_pred.get(pdb, np.nan)},{scores_real.get(pdb, np.nan)}\n")


if __name__ == "__main__":
    main()
