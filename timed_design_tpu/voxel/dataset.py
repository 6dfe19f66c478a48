"""Frame-dataset HDF5 writer (aposteriori schema-compatible).

Produces the same on-disk layout the reference consumes
(design_utils/utils.py:238-251):

    /<pdb_code>/<chain_id>/<residue_id>  -> (V, V, V, C) frame
        .attrs['label']            three-letter residue code
        .attrs['encoded_residue']  (20,) one-hot
    file .attrs: make_frame_dataset_ver, frame_dims, atom_encoder, encode_cb,
                 atom_filter_fn, residue_encoder, frame_edge_length,
                 voxels_as_gaussian

so datasets voxelized by this framework interoperate with reference tooling
and vice versa. The version attr is written as "2.0.0-tpu" — same major
version as the pinned aposteriori 2.4.0 so the reference's major-version gate
(utils.py:272-280) accepts it.
"""
from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from ..constants import AA3, AA3_TO_INT
from ..structure.pdb import Structure, load_pdb
from .codec import Codec
from .frames import structure_to_frame_atoms
from .voxelize import voxelize_frame_atoms

FRAME_DATASET_VER = "2.0.0-tpu"


def voxelize_structure(
    structure: Structure,
    codec: Codec,
    voxels_per_side: int = 21,
    frame_edge_length: float = 21.0,
    gaussian: bool = True,
    encode_cb: bool = True,
    atom_filter: str = "backbone",
):
    """Structure -> (frames ndarray (R,V,V,V,C), FrameAtoms metadata)."""
    fa = structure_to_frame_atoms(
        structure, codec, encode_cb=encode_cb, atom_filter=atom_filter
    )
    frames = voxelize_frame_atoms(
        fa, codec, voxels_per_side=voxels_per_side,
        frame_edge_length=frame_edge_length, gaussian=gaussian,
    )
    return np.asarray(frames), fa


def make_frame_dataset(
    structure_paths: list[Path],
    output_path: Path,
    codec: Codec | str = "CNOCACB",
    voxels_per_side: int = 21,
    frame_edge_length: float = 21.0,
    gaussian: bool = True,
    encode_cb: bool = True,
    voxelise_all_states: bool = False,
    compression: bool = True,
    atom_filter: str = "backbone",
) -> Path:
    """Voxelize PDB files into an aposteriori-schema HDF5 frame dataset.

    The TPU-native equivalent of `aposteriori.make_frame_dataset`
    (reference ui.py:73-86): voxelization runs as one XLA program per
    structure instead of a host worker pool. ``voxelise_all_states`` keeps
    every NMR state as a separate group named ``<pdb>_<state>`` (the
    reference's multi-state consensus flow, README.md:84).
    """
    if isinstance(codec, str):
        codec = Codec.from_string(codec)
    output_path = Path(output_path)
    comp = dict(compression="gzip") if compression else {}

    with h5py.File(output_path, "w") as f:
        f.attrs["make_frame_dataset_ver"] = FRAME_DATASET_VER
        f.attrs["frame_dims"] = (voxels_per_side,) * 3 + (codec.n_channels,)
        f.attrs["atom_encoder"] = list(codec.channels)
        f.attrs["encode_cb"] = bool(encode_cb)
        f.attrs["atom_filter_fn"] = atom_filter
        f.attrs["residue_encoder"] = list(AA3)
        f.attrs["frame_edge_length"] = float(frame_edge_length)
        f.attrs["voxels_as_gaussian"] = bool(gaussian)

        for path in structure_paths:
            structures = load_pdb(Path(path), all_states=voxelise_all_states)
            if not isinstance(structures, list):
                structures = [structures]
            for s in structures:
                frames, fa = voxelize_structure(
                    s, codec, voxels_per_side, frame_edge_length, gaussian,
                    encode_cb, atom_filter,
                )
                grp = f.require_group(s.name)
                for i in range(len(fa.labels)):
                    chain_grp = grp.require_group(fa.chain_ids[i])
                    d = chain_grp.create_dataset(
                        str(fa.residue_ids[i]), data=frames[i], **comp
                    )
                    d.attrs["label"] = fa.labels[i]
                    onehot = np.zeros(20, np.int64)
                    onehot[AA3_TO_INT[fa.labels[i]]] = 1
                    d.attrs["encoded_residue"] = onehot
    return output_path
