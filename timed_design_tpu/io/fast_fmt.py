"""ctypes binding for the native "%.18e" CSV formatter (native/fmt_csv.cpp).

The full-precision prediction CSVs (rotamer mode streams the raw 338-class
matrix, reference predict.py:145's append format) cost ~1.5 us/value through
np.savetxt's per-cell Python float formatting — the dominant host cost of
the engine at the reference's 500k-1M-frame benchmark scale once the device
side runs at TPU speed. snprintf is correctly rounded like CPython's dtoa,
so the native formatter emits byte-identical rows ~5x faster (and scales
with cores). Falls back to np.savetxt when no toolchain is available or any
cell would not format to the fixed 24-char width (negatives, non-finite,
3-digit exponents).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(
    os.environ.get("TD_NATIVE_DIR")
    or Path(__file__).resolve().parents[2] / "native"
)
_SRC = _NATIVE_DIR / "fmt_csv.cpp"
_LIB = _NATIVE_DIR / "libfmt_csv.so"
_lock = threading.Lock()
_lib = None
_tried = False
_N_THREADS = min(16, os.cpu_count() or 1)


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            # rebuild only when the source is present AND newer; an installed
            # package may ship libfmt_csv.so without the .cpp — a missing
            # source must not discard a valid prebuilt library
            if not _LIB.exists() or (
                _SRC.exists() and _LIB.stat().st_mtime < _SRC.stat().st_mtime
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB),
                     str(_SRC)],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.fmt_e18_rows.restype = ctypes.c_int
            lib.fmt_e18_rows.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_size_t,
                ctypes.c_size_t,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            # parity probe: refuse the library outright if its printf does
            # not reproduce Python's formatting on a spread of exact values
            probe = np.array(
                [[0.0, 1.0, 1 / 3, 0.1, 6e-8, 65504.0, 5.96e-8,
                  float(np.float32(0.7)), 1e-38, 3.4e38]], np.float64
            )
            got = _format(lib, probe)
            want = "".join(
                "%.18e%s" % (v, "," if j + 1 < probe.shape[1] else "\n")
                for j, v in enumerate(probe[0])
            ).encode()
            if got != want:
                lib = None
            _lib = lib
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _lib = None
        return _lib


def _format(lib, a: np.ndarray) -> bytes | None:
    n, c = a.shape
    out = ctypes.create_string_buffer(n * c * 25)
    ok = lib.fmt_e18_rows(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, c, out, _N_THREADS,
    )
    return out.raw if ok else None


def native_available() -> bool:
    return _load() is not None


def write_e18_csv(f, data: np.ndarray) -> bool:
    """Write ``data`` as full-precision CSV rows, byte-identical to
    ``np.savetxt(f, data, delimiter=',')`` (fmt '%.18e').

    ``f`` must be a BINARY-mode file. Returns False (nothing written) when
    the native formatter is unavailable or any cell falls outside the
    fixed-width fast path — the caller falls back to np.savetxt.
    """
    lib = _load()
    if lib is None:
        return False
    a = np.ascontiguousarray(np.asarray(data), np.float64)
    if a.ndim != 2 or a.size == 0:
        return False
    # refuse BEFORE writing anything (a mid-stream bail would leave a
    # partial write for the fallback to duplicate): every cell must be a
    # non-negative finite value whose exponent has two digits, which is
    # exactly the 24-char fast-path precondition the kernel re-checks
    # conservative bounds: [1e-98, 1e99] keeps the formatted exponent at two
    # digits no matter which side of the exact power the double literal
    # landed on (1e-99/1e100 themselves could straddle into 3 digits);
    # anything smaller (true f64 subnormal tails) takes the savetxt path
    with np.errstate(invalid="ignore"):
        fits = (a == 0.0) | ((a >= 1e-98) & (a <= 1e99))
        if not bool(fits.all()) or bool(np.signbit(a).any()):
            return False
    # bound the transient buffer like write_float16_csv: ~32 MB chunks
    rows_per_chunk = max(1, (32 << 20) // (a.shape[1] * 25))
    for start in range(0, a.shape[0], rows_per_chunk):
        piece = _format(lib, a[start : start + rows_per_chunk])
        if piece is None:  # unreachable given the pre-check; stay safe
            raise RuntimeError(
                "native %.18e formatter rejected pre-validated rows"
            )
        f.write(piece)
    return True
