"""AlphaFold2 refolding evaluation pipeline.

Replaces the reference's scripts/ pipeline (SURVEY.md §3.5):
  * partition sampled fastas into job folders
    (scripts/partition_structures_to_files.py:7-41);
  * emit SLURM job scripts for AF2 (scripts/af2_script_maker.py:7-51);
  * rename AF2 outputs by fasta header (scripts/move_af2_pdb.py:6-20);
  * compute refold CA-RMSD + GDT {1,2,4,8} via the in-framework Kabsch
    superposition (structure/geometry.py) instead of PyMOL
    `align`/`cealign` (scripts/analyse_af2.py:12-45);
  * combined per-structure property table (entropy, packing density, pLDDT,
    RMSD — scripts/analyse_all_properties.py:37-104).
"""
from __future__ import annotations

import dataclasses
import typing as t
from pathlib import Path

import numpy as np

from ..structure.geometry import gdt as _gdt, superpose
from ..structure.pdb import Structure, load_pdb
from .structure_analysis import (
    calculate_prediction_entropy,
    extract_bfactor_from_structure,
    extract_packdensity_from_structure,
)

GDT_CUTOFFS = (1.0, 2.0, 4.0, 8.0)


def read_fasta(path: Path) -> dict[str, str]:
    out: dict[str, str] = {}
    name = None
    for line in Path(path).read_text().splitlines():
        if line.startswith(">"):
            name = line[1:].strip()
            out[name] = ""
        elif name is not None:
            out[name] += line.strip()
    return out


def partition_fastas(
    fasta_path: Path, output_dir: Path, per_folder: int = 80
) -> list[Path]:
    """Split a multi-record fasta into numbered job folders of single-record
    fastas (reference partition_structures_to_files.py: 80/job)."""
    records = read_fasta(fasta_path)
    output_dir = Path(output_dir)
    folders = []
    for i, (name, seq) in enumerate(records.items()):
        folder = output_dir / f"job_{i // per_folder}"
        folder.mkdir(parents=True, exist_ok=True)
        if folder not in folders:
            folders.append(folder)
        (folder / f"{name}.fasta").write_text(f">{name}\n{seq}\n")
    return folders


def make_af2_slurm_script(
    job_folder: Path,
    output_path: Path,
    partition: str = "ampere",
    gpus: int = 1,
    cpus: int = 32,
    hours: int = 36,
    af2_cmd: str = "colabfold_batch",
) -> Path:
    """Emit a SLURM batch script for one AF2 job folder
    (reference af2_script_maker.py + run_af.sh shape)."""
    job_folder = Path(job_folder)
    script = f"""#!/bin/bash
#SBATCH --partition={partition}
#SBATCH --gres=gpu:{gpus}
#SBATCH --cpus-per-task={cpus}
#SBATCH --time={hours}:00:00
#SBATCH --job-name=af2_{job_folder.name}

{af2_cmd} {job_folder} {job_folder}/out --num-models 1
"""
    out = Path(output_path) / f"run_af2_{job_folder.name}.sh"
    out.write_text(script)
    return out


def rename_af2_outputs(af2_dir: Path, suffix: str = "_rank_001") -> dict[str, Path]:
    """Map AF2 output pdbs back to their fasta header names
    (reference move_af2_pdb.py:6-20). Returns {design_name: pdb_path}."""
    out = {}
    for pdb in Path(af2_dir).glob("**/*.pdb"):
        stem = pdb.stem
        if suffix in stem:
            design = stem.split(suffix)[0]
            out[design] = pdb
    return out


@dataclasses.dataclass
class RefoldResult:
    design: str
    rmsd: float
    gdt: dict[float, float]
    mean_plddt: float


def analyse_refold(
    reference_structure: t.Union[Structure, Path],
    refolded_structure: t.Union[Structure, Path],
    design_name: str = "",
) -> RefoldResult:
    """CA-superpose the AF2 refold onto the design target; RMSD + GDT + pLDDT.

    NaN metrics on length mismatch (reference analyse_af2_one_folder.py:56-62
    behavior: degrade, don't abort).
    """
    ref = (
        reference_structure
        if isinstance(reference_structure, Structure)
        else load_pdb(Path(reference_structure))
    )
    fold = (
        refolded_structure
        if isinstance(refolded_structure, Structure)
        else load_pdb(Path(refolded_structure))
    )
    ref_ca = ref.backbone_arrays()["CA"]
    fold_ca = fold.backbone_arrays()["CA"]
    plddts = extract_bfactor_from_structure(fold)
    mean_plddt = float(np.mean([v for chain in plddts for v in chain])) if plddts else float("nan")
    if ref_ca.shape != fold_ca.shape or np.isnan(ref_ca).any() or np.isnan(fold_ca).any():
        return RefoldResult(design_name, float("nan"),
                            {c: float("nan") for c in GDT_CUTOFFS}, mean_plddt)
    _, rmsd = superpose(fold_ca, ref_ca)
    return RefoldResult(design_name, rmsd, _gdt(fold_ca, ref_ca, GDT_CUTOFFS), mean_plddt)


def analyse_af2_folder(
    reference_pdb: Path, af2_dir: Path, suffix: str = "_rank_001"
) -> list[RefoldResult]:
    """Evaluate every refold in a folder against one reference backbone
    (reference analyse_af2_one_folder.py, without the process pool — the
    Kabsch path makes per-structure cost microseconds)."""
    designs = rename_af2_outputs(af2_dir, suffix)
    ref = load_pdb(Path(reference_pdb))
    return [analyse_refold(ref, path, name) for name, path in sorted(designs.items())]


def combined_property_table(
    prediction_matrix: np.ndarray,
    structure: Structure,
    refold_results: t.Sequence[RefoldResult],
) -> dict[str, t.Any]:
    """Entropy + packing density + pLDDT + RMSD summary per design
    (reference analyse_all_properties.py:37-104)."""
    entropy = calculate_prediction_entropy(prediction_matrix)
    packing = extract_packdensity_from_structure(structure, atom_filter="ca")
    return {
        "mean_entropy": float(np.mean(entropy)),
        "mean_packing_density": float(np.mean([p for p in packing if p >= 0])),
        "designs": [
            {
                "design": r.design,
                "rmsd": r.rmsd,
                **{f"gdt_{int(c)}": v for c, v in r.gdt.items()},
                "mean_plddt": r.mean_plddt,
            }
            for r in refold_results
        ],
    }
