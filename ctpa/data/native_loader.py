"""ctypes binding for the native C++ volume loader (ctpa/data/native/ct_loader.cc).

Builds the shared library on first use (g++ + zlib, cached next to the
source); falls back cleanly if no compiler is present — callers use
`available()` to gate.  API: `NativeLoader.submit(path) -> ticket`,
`fetch(ticket) -> (array, meta)`; submissions decode on a C++ thread pool so
Python never blocks on IO/inflate/dtype-conversion."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from dataclasses import dataclass
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "ct_loader.cc")
_LIB = os.path.join(os.path.dirname(__file__), "native", "libct_loader.so")
_build_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None


def _build() -> str:
    with _build_lock:
        if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _LIB, "-lz", "-pthread"]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


def _load() -> ctypes.CDLL:
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    lib = ctypes.CDLL(_build())
    lib.ctl_create.restype = ctypes.c_void_p
    lib.ctl_create.argtypes = [ctypes.c_int]
    lib.ctl_destroy.argtypes = [ctypes.c_void_p]
    lib.ctl_submit.restype = ctypes.c_int64
    lib.ctl_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.ctl_ready.restype = ctypes.c_int
    lib.ctl_ready.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ctl_meta.restype = ctypes.c_int
    lib.ctl_meta.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ctl_fetch.restype = ctypes.c_int64
    lib.ctl_fetch.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.ctl_error.restype = ctypes.c_int
    lib.ctl_error.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_char_p, ctypes.c_int]
    _lib_handle = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


@dataclass
class VolumeMeta:
    shape: tuple[int, ...]
    spacing: tuple[float, ...]
    slope: float
    intercept: float
    fortran_order: bool


class NativeLoader:
    def __init__(self, num_threads: int = 4):
        self._lib = _load()
        self._handle = self._lib.ctl_create(num_threads)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ctl_destroy(self._handle)
        except Exception:
            pass

    def submit(self, path: str) -> int:
        return int(self._lib.ctl_submit(self._handle, path.encode()))

    def ready(self, ticket: int) -> bool:
        return self._lib.ctl_ready(self._handle, ticket) == 1

    def _meta(self, ticket: int) -> VolumeMeta:
        shape = (ctypes.c_int64 * 8)()
        spacing = (ctypes.c_float * 8)()
        ndim = ctypes.c_int()
        slope = ctypes.c_float()
        inter = ctypes.c_float()
        fortran = ctypes.c_int()
        rc = self._lib.ctl_meta(self._handle, ticket, shape, ctypes.byref(ndim),
                                spacing, ctypes.byref(slope), ctypes.byref(inter),
                                ctypes.byref(fortran))
        if rc != 0:
            raise RuntimeError(self._error(ticket))
        n = ndim.value
        return VolumeMeta(
            shape=tuple(int(shape[i]) for i in range(n)),
            spacing=tuple(float(spacing[i]) for i in range(n)),
            slope=float(slope.value), intercept=float(inter.value),
            fortran_order=bool(fortran.value),
        )

    def _error(self, ticket: int) -> str:
        buf = ctypes.create_string_buffer(512)
        self._lib.ctl_error(self._handle, ticket, buf, 512)
        return buf.value.decode(errors="replace") or "native loader error"

    def fetch(self, ticket: int) -> tuple[np.ndarray, VolumeMeta]:
        meta = self._meta(ticket)
        count = int(np.prod(meta.shape)) if meta.shape else 0
        out = np.empty(count, np.float32)
        got = self._lib.ctl_fetch(
            self._handle, ticket,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), count)
        if got != count:
            raise RuntimeError(self._error(ticket))
        order = "F" if meta.fortran_order else "C"
        return out.reshape(meta.shape, order=order), meta

    def load(self, path: str) -> tuple[np.ndarray, VolumeMeta]:
        return self.fetch(self.submit(path))

    def load_batch(self, paths: list[str]) -> list[tuple[np.ndarray, VolumeMeta]]:
        """Decode many files concurrently on the C++ pool."""
        tickets = [self.submit(p) for p in paths]
        return [self.fetch(t) for t in tickets]
