"""XLA compiler options tuned for this workload on TPU.

``xla_tpu_scoped_vmem_limit_kib=131072`` — a larger scoped-VMEM budget lets
the conv emitter pick bigger tiles. Measured per architecture (batch-512
bf16, v5e, marginal-throughput methodology, frames/s default -> with
option):

    TIMED           25,850 -> 26,820   (+4.0%)
    TIMED_rotamer   23,466 -> 24,686   (+5.2%)
    DenseNet        17,871 -> 18,247   (+2.1%)
    DenseCPD        10,319 -> 11,892   (+15.2%)
    ProDCoNN       174,888 -> 162,566  (-7.0%)  <- excluded below

65536 measured WORSE on TIMED (32.6 ms: a different, bad tiling), so the
value is not monotonic; re-sweep if layer shapes change radically. Options
are TPU-compiler flags: passing them on CPU/GPU backends fails compilation,
hence the platform gate.
"""
from __future__ import annotations

import typing as t

_TPU_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "131072"}
# architectures where the larger budget measured SLOWER (see table above)
_EXCLUDED_MODELS = {"ProDCoNN"}


def tpu_compiler_options(
    devices: t.Sequence | None = None, model_name: str | None = None
) -> dict | None:
    """Compiler options for ``jax.jit(..., compiler_options=...)``.

    Returns the tuned TPU options when the target devices (default: the
    default backend) are TPUs, else None (= compiler defaults). Pass the
    architecture's registry name to skip models where the option measured
    as a regression.
    """
    import jax

    if model_name is not None and any(
        model_name.startswith(m) for m in _EXCLUDED_MODELS
    ):  # startswith: engine may append an output-name suffix
        return None
    if devices is not None:
        platform = devices[0].platform
    else:
        platform = jax.default_backend()
    return dict(_TPU_OPTIONS) if platform == "tpu" else None
