"""Model zoo registry: name -> native Flax constructor + default codec.

Names mirror the reference zoo (ui.py:732-748, scripts/run_benchmark_models.sh
:1-6): TIMED, TIMED_Deep, TIMED_Charge, TIMED_Polar, TIMED_rotamer{,_balanced,
_not_so_deep,_deep}, ProDCoNN, DenseNet, DenseCPD. ``load_model`` resolves a
path (.h5 -> Keras importer) or a registry name (native Flax module).
"""
from __future__ import annotations

import dataclasses
import typing as t
from pathlib import Path

from .densenet import densecpd, densenet
from .prodconn import prodconn
from .timed import (
    timed,
    timed_deep,
    timed_rotamer,
    timed_rotamer_deep,
    timed_rotamer_not_so_deep,
)


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    constructor: t.Callable
    n_classes: int
    codec: str  # default input codec string
    rotamer: bool = False

    def build(self, **kw):
        return self.constructor(**kw)


MODEL_REGISTRY: dict[str, ModelSpec] = {
    "TIMED": ModelSpec("TIMED", timed, 20, "CNOCACB"),
    "TIMED_Deep": ModelSpec("TIMED_Deep", timed_deep, 20, "CNOCACB"),
    "TIMED_Charge": ModelSpec("TIMED_Charge", timed, 20, "CNOCACBQ"),
    "TIMED_Polar": ModelSpec("TIMED_Polar", timed, 20, "CNOCACBP"),
    "TIMED_rotamer": ModelSpec("TIMED_rotamer", timed_rotamer, 338, "CNOCACB", True),
    "TIMED_rotamer_balanced": ModelSpec(
        "TIMED_rotamer_balanced", timed_rotamer, 338, "CNOCACB", True
    ),
    "TIMED_rotamer_not_so_deep": ModelSpec(
        "TIMED_rotamer_not_so_deep", timed_rotamer_not_so_deep, 338, "CNOCACB", True
    ),
    "TIMED_rotamer_deep": ModelSpec(
        "TIMED_rotamer_deep", timed_rotamer_deep, 338, "CNOCACB", True
    ),
    "ProDCoNN": ModelSpec("ProDCoNN", prodconn, 20, "CNOCACB"),
    "DenseNet": ModelSpec("DenseNet", densenet, 20, "CNOCACB"),
    "DenseCPD": ModelSpec("DenseCPD", densecpd, 20, "CNOCACB"),
}


def get_model_spec(name: str) -> ModelSpec:
    # case-insensitive lookup with common aliases
    for key, spec in MODEL_REGISTRY.items():
        if key.lower() == name.lower():
            return spec
    raise KeyError(
        f"Unknown model {name!r}. Known: {', '.join(MODEL_REGISTRY)}"
    )


def load_model(path_or_name: t.Union[str, Path], compute_dtype=None):
    """Resolve a model: `.h5`/`.hdf5` path -> imported Keras graph; name ->
    Flax spec. A Keras-looking path that does not exist raises
    FileNotFoundError — falling through to registry lookup would turn a
    typo'd weights path into a misleading 'Unknown model' KeyError."""
    p = Path(path_or_name)
    if p.suffix.lower() in (".h5", ".hdf5"):
        if not p.exists():
            raise FileNotFoundError(f"model weights file not found: {p}")
        from .keras_import import load_keras_model
        import jax.numpy as jnp

        return load_keras_model(p, compute_dtype=compute_dtype or jnp.float32)
    return get_model_spec(str(path_or_name))
