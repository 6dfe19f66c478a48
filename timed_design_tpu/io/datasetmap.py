"""Datasetmap formats (old CSV and new PDBench/SRB layouts).

The reference keeps per-residue bookkeeping in two text formats
(design_utils/utils.py:190-227):

  * "old": CSV rows ``pdb,chain,residue_id,label`` — one row per residue;
  * "new"/SRB: 3 header lines (``ignore_uncommon False``, ``include_pdbs``,
    ``##########``) then ``<pdb_chain> <count>`` rows (utils.py:533-566).

This module parses and emits both. Internally we use a typed DatasetMap
instead of raw ndarray tuples.
"""
from __future__ import annotations

import dataclasses
import re as _re
from pathlib import Path

SRB_HEADER = "ignore_uncommon False\ninclude_pdbs\n##########\n"


@dataclasses.dataclass
class DatasetMap:
    """Either per-residue entries (old) or per-chain counts (new)."""

    # old format: [(pdb, chain, residue_id, label)]
    entries: list[tuple[str, str, str, str]] | None = None
    # new format: [(pdb_chain, count)]
    counts: list[tuple[str, int]] | None = None
    # provenance: resolved path of the flat-layout dataset whose row order
    # these entries ARE (set by create_flat_dataset_map) — lets the loader
    # skip the O(N) string-keyed row lookup for the dominant identity case
    row_identity_for: str | None = None

    @property
    def is_old(self) -> bool:
        return self.entries is not None

    @property
    def n_residues(self) -> int:
        if self.is_old:
            return len(self.entries)
        return sum(c for _, c in self.counts)

    def to_counts(self) -> list[tuple[str, int]]:
        """Collapse per-residue entries into SRB chain counts.

        Mirrors convert_dataset_map_for_srb (utils.py:533-566): NMR state
        suffix stripped, chain appended to 4-letter pdb codes. The
        reference strips with a ``"_0" in pdb`` substring test, which (a)
        leaves states ``_1.._9`` unstripped — their rows land under keys
        like ``1abc_1`` with no chain, inconsistent with state 0's
        ``1abcA`` — and (b) truncates unrelated names containing ``_0``
        mid-string. Fixed here to a trailing ``_<digits>`` strip, the same
        rule split_dataset_map uses (PARITY.md §Deviations).
        """
        if not self.is_old:
            return list(self.counts)
        count_dict: dict[str, int] = {}
        for pdb, chain, _, _ in self.entries:
            pdb = _re.sub(r"_\d+$", "", pdb)
            if len(pdb) == 4:
                pdb += chain
            count_dict[pdb] = count_dict.get(pdb, 0) + 1
        return list(count_dict.items())


def load_datasetmap(path: Path, is_old: bool = False) -> DatasetMap:
    """Parse a datasetmap file; both formats (utils.py:190-227)."""
    path = Path(path)
    if path.suffix != ".txt":
        raise ValueError(f"Expected .txt datasetmap, got {path.suffix}")
    lines = path.read_text().splitlines()
    if is_old:
        entries = []
        for line in lines:
            if not line.strip():
                continue
            parts = line.split(",")
            entries.append((parts[0], parts[1], parts[2], parts[3]))
        return DatasetMap(entries=entries)
    counts = []
    for line in lines[3:]:
        if not line.strip():
            continue
        pdb_chain, count = line.split()
        counts.append((pdb_chain, int(count)))
    return DatasetMap(counts=counts)


def save_datasetmap(dmap: DatasetMap, path: Path) -> Path:
    """Write the per-residue (old/CSV) format — `datasetmap.txt` in predict
    outputs (utils.py:763-766)."""
    path = Path(path)
    assert dmap.is_old, "per-residue datasetmap required"
    with open(path, "w") as f:
        for pdb, chain, rid, label in dmap.entries:
            f.write(f"{pdb},{chain},{rid},{label}\n")
    return path


def split_dataset_map(
    dmap: DatasetMap, val_fraction: float, seed: int = 0
) -> tuple[DatasetMap, DatasetMap]:
    """Structure-level train/validation split of a per-residue map.

    Whole PDB structures go to one side or the other (chains of the same
    structure share fold context, so a residue-level split would leak
    validation information into training). NMR state suffixes (``1abc_0``)
    collapse to the parent code so all states of one deposition stay
    together. The reference has no training code at all (SURVEY.md §2.2);
    this follows the standard protein-ML protocol instead.

    Returns ``(train_map, val_map)`` preserving the original row order
    within each side. ``val_fraction`` of the distinct structures (rounded,
    at least 1 when the fraction is > 0 and at least one structure exists)
    is assigned to validation by a seeded permutation.
    """
    assert dmap.is_old, "per-residue datasetmap required"
    if not 0.0 <= val_fraction < 1.0:
        raise ValueError(f"val_fraction must be in [0, 1), got {val_fraction}")

    def parent(pdb: str) -> str:
        # strip ONE trailing _<digits> state suffix (voxelise_all_states
        # names states {code}_0, {code}_1, ... — pdb.py); substring tests
        # like '"_0" in pdb' would miss _1.._9 states and let conformers
        # of one deposition straddle the split
        return _re.sub(r"_\d+$", "", pdb)

    structures = sorted({parent(p) for p, _, _, _ in dmap.entries})
    if val_fraction == 0.0 or not structures:
        return dmap, DatasetMap(entries=[], row_identity_for=None)
    import numpy as _np

    n_val = max(1, round(len(structures) * val_fraction))
    if n_val >= len(structures):
        raise ValueError(
            f"val_fraction={val_fraction} leaves no training structures "
            f"({n_val} of {len(structures)} would go to validation)"
        )
    order = _np.random.default_rng(seed).permutation(len(structures))
    val_set = {structures[i] for i in order[:n_val]}
    train_e = [e for e in dmap.entries if parent(e[0]) not in val_set]
    val_e = [e for e in dmap.entries if parent(e[0]) in val_set]
    # subsets are no longer row-identical to the flat file: loader falls
    # back to the keyed row lookup, so drop the identity tag
    return (
        DatasetMap(entries=train_e, row_identity_for=None),
        DatasetMap(entries=val_e, row_identity_for=None),
    )


def save_srb_datasetmap(
    dmap: DatasetMap, model_name: str, path_to_output: Path
) -> Path:
    """Write the PDBench/SRB format `{model}.txt` (utils.py:533-566)."""
    path = Path(path_to_output) / f"{model_name}.txt"
    with open(path, "w") as f:
        f.write(SRB_HEADER)
        for pdb_chain, count in dmap.to_counts():
            f.write(f"{pdb_chain} {count}\n")
    return path
