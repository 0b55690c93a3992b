"""Build + load the native transport library (ctypes, no pybind11)."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "policy_bus.cpp")
_CACHE_DIR = os.environ.get("CHEETA_NATIVE_CACHE",
                            os.path.expanduser("~/.cache/cheeta_mpc_tpu"))
_lock = threading.Lock()
_lib = None


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, f"libpolicybus-{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp.{os.getpid()}"
        subprocess.check_call([
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, "-o", tmp])
        os.replace(tmp, so_path)
    return so_path


def load_policy_bus() -> ctypes.CDLL:
    """Compile (once, content-hashed cache) and load the bus library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        lib.bus_create.restype = ctypes.c_void_p
        lib.bus_create.argtypes = [ctypes.c_int]
        lib.bus_destroy.argtypes = [ctypes.c_void_p]
        lib.bus_publish.restype = ctypes.c_int64
        lib.bus_publish.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_char_p, ctypes.c_uint32]
        lib.bus_consume.restype = ctypes.c_int64
        lib.bus_consume.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_char_p, ctypes.c_uint32,
                                    ctypes.POINTER(ctypes.c_uint32)]
        lib.bus_wait.restype = ctypes.c_int64
        lib.bus_wait.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_uint64, ctypes.c_int]
        lib.bus_seq.restype = ctypes.c_uint64
        lib.bus_seq.argtypes = [ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return lib
