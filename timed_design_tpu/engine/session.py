"""DesignSession: persistent compiled design service.

The serving-oriented entry point: load a model once (registry name, Keras
.h5, or trained checkpoint), keep the compiled executable and replicated
weights on device, and design structure after structure with zero recompiles
— the pattern behind the UI and any production endpoint (the reference
rebuilds its TF session and intermediate HDF5 per request, ui.py:916-947).
"""
from __future__ import annotations

import typing as t
from pathlib import Path

import numpy as np

from ..structure import Structure, load_pdb
from ..voxel import Codec, structure_to_frame_atoms, voxelize_frame_atoms
from .predictor import Predictor, _resolve_model


class DesignSession:
    def __init__(
        self,
        model: t.Union[str, Path],
        codec: t.Union[str, Codec, None] = None,
        batch_size: int = 512,
        mesh=None,
        gaussian: bool = True,
        compute_dtype="bfloat16",
        allow_random_weights: bool = False,
        quantize: str | None = None,
    ):
        import jax.numpy as jnp

        if isinstance(compute_dtype, str):
            compute_dtype = getattr(jnp, compute_dtype)
        resolved, self.model_name = _resolve_model(
            model, compute_dtype=compute_dtype,
            allow_random_weights=allow_random_weights,
        )
        if codec is None:
            from ..models import MODEL_REGISTRY

            spec = MODEL_REGISTRY.get(self.model_name)
            codec = spec.codec if spec else "CNOCACB"
        self.codec = Codec.from_string(codec) if isinstance(codec, str) else codec
        self.gaussian = gaussian
        # transfer_dtype follows compute_dtype: bf16 serving halves the
        # host->device frame bytes (the win Predictor documents; it was
        # silently dropped here, sending f32 over the wire)
        self.predictor = Predictor(
            resolved, batch_size=batch_size, mesh=mesh,
            transfer_dtype=compute_dtype, model_name=self.model_name,
            quantize=quantize,
        )

    @property
    def n_classes(self) -> int:
        return self.predictor.n_classes

    def design(self, structure: t.Union[Structure, Path, str]):
        """PDB/Structure -> (probs (R, n_classes), FrameAtoms).

        Per-phase wall times land in ``self.last_timings`` (voxelisation vs
        prediction — the latency split the reference UI reports,
        ui.py:914-955).
        """
        import time

        if not isinstance(structure, Structure):
            structure = load_pdb(Path(structure))
        t0 = time.perf_counter()
        fa = structure_to_frame_atoms(structure, self.codec)
        # frames stay device-resident: voxelizer output feeds the predictor
        # directly (no host roundtrip of (R, 21^3, C))
        frames = voxelize_frame_atoms(fa, self.codec, gaussian=self.gaussian)
        t1 = time.perf_counter()
        probs = self.predictor.predict_probs(frames)
        self.last_timings = {
            "voxelisation": t1 - t0,
            "prediction": time.perf_counter() - t1,
        }
        return probs, fa

    def design_sequence(self, structure) -> str:
        """Argmax design: PDB/Structure -> one-letter sequence."""
        from ..constants import AA1, compress_rotamer_probs

        probs, _ = self.design(structure)
        if probs.shape[1] == 338:
            probs = compress_rotamer_probs(probs)
        return "".join(np.array(list(AA1))[probs.argmax(1)])
