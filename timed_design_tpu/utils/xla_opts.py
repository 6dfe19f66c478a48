"""XLA compiler options tuned per architecture on TPU.

A larger ``xla_tpu_scoped_vmem_limit_kib`` lets the conv emitter pick
bigger tiles — but the best value is architecture-specific and NOT
monotonic. Measured (batch-512 bf16, v5e, marginal-throughput
methodology, frames/s):

    model           default   128 MiB    96 MiB   -> production choice
    TIMED            25,850    26,820    26,436      128 MiB (+4.0%)
    TIMED_rotamer    23,466    24,686         -      128 MiB (+5.2%)
    DenseNet         17,871    18,247    18,722       96 MiB (+4.8%)
    DenseCPD         10,319    11,892    12,127       96 MiB (+17.5%)
    ProDCoNN        174,888   162,566         -      default (option
                                                     measured -7.0%)

(64 MiB measured far worse on TIMED — 32.6 ms vs 19.0: a different, bad
tiling; 160/192 MiB measured the same as 128 on DenseCPD. Re-sweep with
``scripts/sweep_xla_flags.py`` if layer shapes change radically.)
Options are TPU-compiler flags: passing them on CPU/GPU backends fails
compilation, hence the platform gate.
"""
from __future__ import annotations

import typing as t

_DEFAULT_KIB = "131072"  # 128 MiB: the TIMED-family optimum
# per-architecture overrides, matched by registry-name prefix (the engine
# may append an output-name suffix); None = compiler defaults
_MODEL_KIB: dict[str, str | None] = {
    "DenseCPD": "98304",
    "DenseNet": "98304",
    "ProDCoNN": None,
}


def tpu_compiler_options(
    devices: t.Sequence | None = None, model_name: str | None = None
) -> dict | None:
    """Compiler options for ``jax.jit(..., compiler_options=...)``.

    Returns the tuned TPU options when the target devices (default: the
    default backend) are TPUs, else None (= compiler defaults). Pass the
    architecture's registry name to get its measured optimum (table above).
    """
    import jax

    kib = _DEFAULT_KIB
    if model_name is not None:
        # case-insensitive substring match: .h5-loaded models carry the
        # file stem ('prodconn.h5' -> 'prodconn'), and the engine may
        # append an output-name suffix — both must still hit their row
        low = model_name.lower()
        for prefix, value in _MODEL_KIB.items():
            if prefix.lower() in low:
                kib = value
                break
    if kib is None:
        return None
    if devices is not None:
        platform = devices[0].platform
    else:
        platform = jax.default_backend()
    if platform != "tpu":
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": kib}
