"""ctypes binding for the native parallel inflate pool (native/inflate_pool.cpp).

h5py serializes every HDF5 call behind a global lock, so gzip chunk
decompression cannot parallelize from Python through h5py. The tree-layout
loader reads RAW chunk bytes under the lock and inflates them here —
straight into the batch buffer, from ``min(32, cpu_count)`` C++ threads.
Falls back to Python zlib (same semantics, single-stream) when no toolchain
is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from pathlib import Path

import numpy as np

# TD_NATIVE_DIR overrides for installed copies, where parents[2] is
# site-packages and the C++ sources live elsewhere (e.g. /app/native in
# the Docker image)
_NATIVE_DIR = Path(
    os.environ.get("TD_NATIVE_DIR")
    or Path(__file__).resolve().parents[2] / "native"
)
_SRC = _NATIVE_DIR / "inflate_pool.cpp"
_LIB = _NATIVE_DIR / "libinflate_pool.so"
_lock = threading.Lock()
_lib = None
_pool = None
_tried = False


def _load():
    global _lib, _pool, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            # a missing .cpp (installed package shipping only the .so) must
            # not discard a valid prebuilt library
            if not _LIB.exists() or (
                _SRC.exists() and _LIB.stat().st_mtime < _SRC.stat().st_mtime
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB),
                     str(_SRC), "-lz"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.inflate_pool_create.restype = ctypes.c_void_p
            lib.inflate_pool_create.argtypes = [ctypes.c_int]
            lib.inflate_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.inflate_pool_run.restype = ctypes.c_int
            lib.inflate_pool_run.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int,
            ]
            n_threads = min(32, os.cpu_count() or 1)
            _pool = lib.inflate_pool_create(n_threads)
            _lib = lib
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def inflate_many(srcs: list[bytes], dsts: list[np.ndarray]) -> None:
    """Inflate zlib streams ``srcs[i]`` into C-contiguous ``dsts[i]``.

    Parallel in C++ when the native pool built; Python-zlib fallback
    otherwise. Raises ValueError on a corrupt stream or size mismatch.
    """
    assert len(srcs) == len(dsts)
    if not srcs:
        return
    lib = _load()
    if lib is None:
        for src, dst in zip(srcs, dsts):
            raw = zlib.decompress(src)
            if len(raw) != dst.nbytes:
                raise ValueError(
                    f"inflated size {len(raw)} != destination {dst.nbytes}"
                )
            dst.view(np.uint8).reshape(-1)[:] = np.frombuffer(raw, np.uint8)
        return
    n = len(srcs)
    src_arr = (ctypes.c_char_p * n)(*srcs)
    src_lens = (ctypes.c_size_t * n)(*(len(s) for s in srcs))
    dst_arr = (ctypes.c_void_p * n)()
    dst_lens = (ctypes.c_size_t * n)()
    for i, d in enumerate(dsts):
        assert d.flags["C_CONTIGUOUS"], "destination must be contiguous"
        dst_arr[i] = d.ctypes.data
        dst_lens[i] = d.nbytes
    rc = lib.inflate_pool_run(_pool, src_arr, src_lens, dst_arr, dst_lens, n)
    if rc != 0:
        raise ValueError(f"inflate failed for chunk {rc - 1}")
