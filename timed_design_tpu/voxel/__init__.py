"""Voxel layer: codecs, frame geometry, on-device voxelizer, dataset writer."""
from .codec import Codec  # noqa: F401
from .frames import (  # noqa: F401
    CB_FRAME_OFFSET,
    FrameAtoms,
    frame_bases,
    structure_to_frame_atoms,
)
from .voxelize import voxelize, voxelize_frame_atoms  # noqa: F401
from .dataset import make_frame_dataset, voxelize_structure  # noqa: F401
