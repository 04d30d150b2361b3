"""ctypes binding for the native async trajectory sink (native/trajsink.cpp).

Gives the trainer a non-blocking path for persisting collected trajectories
and per-iteration array payloads: device arrays are transferred to host once
per outer iteration and handed to a C++ writer thread — the jitted loop
never waits on the filesystem (the reference blocks its python loop on
joblib pickles; SURVEY.md §5 checkpoint row).

The shared library is compiled on first use with g++ (cached beside the
source); environments without a toolchain can still run the framework —
``TrajectorySink.available()`` gates usage.
"""
from __future__ import annotations

import ctypes
import json
import os
import struct as pystruct
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libtrajsink.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "trajsink.cpp")

_MAGIC = b"CADMTRAJSINK v1\x00"
TAG_ARRAY = 1
TAG_META = 2


def _build() -> Optional[str]:
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
        return _SO_PATH
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC_PATH, "-o", _SO_PATH, "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
        return _SO_PATH
    except (OSError, subprocess.CalledProcessError):
        return None


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.trajsink_open.restype = ctypes.c_void_p
    lib.trajsink_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.trajsink_append.restype = ctypes.c_int
    lib.trajsink_append.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64
    ]
    lib.trajsink_append2.restype = ctypes.c_int
    lib.trajsink_append2.argtypes = [
        ctypes.c_void_p,
        ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_char_p, ctypes.c_uint64,
    ]
    lib.trajsink_flush.argtypes = [ctypes.c_void_p]
    lib.trajsink_dropped.restype = ctypes.c_uint64
    lib.trajsink_dropped.argtypes = [ctypes.c_void_p]
    lib.trajsink_written.restype = ctypes.c_uint64
    lib.trajsink_written.argtypes = [ctypes.c_void_p]
    lib.trajsink_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class TrajectorySink:
    """Async binary writer for named numpy/JAX arrays."""

    @staticmethod
    def available() -> bool:
        return _load() is not None

    def __init__(self, path: str, max_queue_mb: int = 512):
        lib = _load()
        if lib is None:
            raise RuntimeError("native trajsink unavailable (no g++?)")
        self._lib = lib
        self._h = lib.trajsink_open(
            path.encode(), max_queue_mb * 1024 * 1024
        )
        if not self._h:
            raise OSError(f"could not open {path}")

    def append(self, name: str, array) -> bool:
        arr = np.ascontiguousarray(array)
        meta = json.dumps(
            {"name": name, "dtype": str(arr.dtype), "shape": arr.shape}
        ).encode()
        # META + ARRAY enqueued atomically: both admitted or both dropped,
        # so a reader can never pair an ARRAY with a stale earlier META.
        return bool(
            self._lib.trajsink_append2(
                self._h,
                TAG_META, meta, len(meta),
                TAG_ARRAY, arr.tobytes(), arr.nbytes,
            )
        )

    def flush(self) -> None:
        self._lib.trajsink_flush(self._h)

    @property
    def dropped(self) -> int:
        return int(self._lib.trajsink_dropped(self._h))

    @property
    def written(self) -> int:
        return int(self._lib.trajsink_written(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.trajsink_close(self._h)
            self._h = None


def read_trajfile(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) pairs back from a sink file."""
    with open(path, "rb") as f:
        assert f.read(16) == _MAGIC, "bad magic"
        pending_meta = None
        while True:
            head = f.read(16)
            if len(head) < 16:
                return
            tag, n = pystruct.unpack("<QQ", head)
            payload = f.read(n)
            if tag == TAG_META:
                pending_meta = json.loads(payload)
            elif tag == TAG_ARRAY and pending_meta is not None:
                arr = np.frombuffer(
                    payload, dtype=np.dtype(pending_meta["dtype"])
                ).reshape(pending_meta["shape"])
                yield pending_meta["name"], arr
                pending_meta = None
