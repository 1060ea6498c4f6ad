"""ctypes bindings for the native C++ FASTQ parser/packer.

Builds tsxcount_tpu/_native/libfastxpack.so lazily with g++ (no pybind11 in
this environment; the C ABI + ctypes keeps the binding dependency-free).
Falls back cleanly if no compiler is available — callers use
`native_available()` and the pure-Python packer otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from tsxcount_tpu.config import BatchSpec
from tsxcount_tpu.io.packer import PackedBatch, PackStats

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "_native"
_SRC = _NATIVE_DIR / "fastxpack.cpp"
_LIB = _NATIVE_DIR / "libfastxpack.so"

_lock = threading.Lock()
_lib = None
_build_error: str | None = None

N_POLICY_CODES = {"drop": 0, "random": 1}


def _build() -> bool:
    global _build_error
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB), "-lz",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        _build_error = str(e)
        return False
    if proc.returncode != 0:
        _build_error = proc.stderr[-2000:]
        return False
    return True


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            _build_error = str(e)
            return None
        lib.fxp_open.restype = ctypes.c_void_p
        lib.fxp_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.fxp_next_batch.restype = ctypes.c_int
        lib.fxp_next_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.fxp_stats.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_int64)
        ] * 5
        lib.fxp_error.restype = ctypes.c_char_p
        lib.fxp_error.argtypes = [ctypes.c_void_p]
        lib.fxp_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_available() -> bool:
    return _load() is not None


def native_build_error() -> str | None:
    _load()
    return _build_error


class NativeFileReader:
    """Streams PackedBatch objects straight from a FASTQ/FASTA(.gz) file."""

    def __init__(self, path: str | Path, batch: BatchSpec,
                 n_policy: str = "drop", seed: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native packer unavailable: {_build_error}"
            )
        self._lib = lib
        self.batch = batch
        self.stats = PackStats()
        self._handle = lib.fxp_open(
            str(path).encode(), batch.spec.k,
            N_POLICY_CODES[n_policy], seed,
        )
        if not self._handle:
            raise FileNotFoundError(path)

    def __iter__(self):
        lib = self._lib
        b = self.batch
        n_valid = ctypes.c_int64()
        n_bases = ctypes.c_int64()
        try:
            while True:
                buf = np.empty(b.buf_words, dtype=np.uint32)
                rc = lib.fxp_next_batch(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    b.total_words,
                    b.capacity_words,
                    b.max_intervals,
                    ctypes.byref(n_valid),
                    ctypes.byref(n_bases),
                )
                if rc < 0:
                    raise ValueError(
                        f"parse error: "
                        f"{lib.fxp_error(self._handle).decode()}"
                    )
                if n_valid.value or n_bases.value:
                    self.stats.batches += 1
                    yield PackedBatch(
                        buf=buf,
                        n_valid=int(n_valid.value),
                        n_bases=int(n_bases.value),
                        batch=b,
                    )
                if rc == 0:
                    break
        finally:
            self._finalize_stats()

    def _finalize_stats(self):
        if self._handle is None:
            return
        vals = [ctypes.c_int64() for _ in range(5)]
        self._lib.fxp_stats(self._handle, *[ctypes.byref(v) for v in vals])
        self.stats.reads = int(vals[0].value)
        self.stats.reads_skipped = int(vals[1].value)
        self.stats.bases = int(vals[2].value)
        self.stats.n_bases = int(vals[3].value)
        self.stats.windows = int(vals[4].value)
        self._lib.fxp_close(self._handle)
        self._handle = None

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.fxp_close(self._handle)
                self._handle = None
        except Exception:
            pass
