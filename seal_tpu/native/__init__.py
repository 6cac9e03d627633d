"""Native (C) host components, compiled on demand and loaded via ctypes.

The reference keeps its hash/XOF primitives as vendored C
(``util/blake2*.c``, ``util/fips202.c``); here the equivalents are built
from public specs and compiled at first use into ``libseal_native.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["blake2.c"]
_SO_NAME = "libseal_native.so"


def _build(so_path: str) -> None:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = ["cc", "-O2", "-shared", "-fPIC", "-o", so_path + ".tmp", *srcs]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(so_path + ".tmp", so_path)


def load():
    """Load (building if needed) the native library; returns ctypes CDLL."""
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so_path = os.path.join(_SRC_DIR, _SO_NAME)
        newest_src = max(os.path.getmtime(os.path.join(_SRC_DIR, s)) for s in _SOURCES)
        if not os.path.exists(so_path) or os.path.getmtime(so_path) < newest_src:
            _build(so_path)
        lib = ctypes.CDLL(so_path)
        lib.seal_blake2b.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.seal_blake2xb.argtypes = lib.seal_blake2b.argtypes
        lib.seal_blake2xb_fill.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64, ctypes.c_char_p,
        ]
        _LIB = lib
        return _LIB


def blake2b(outlen: int, data: bytes, key: bytes = b"") -> bytes:
    lib = load()
    out = ctypes.create_string_buffer(outlen)
    lib.seal_blake2b(out, outlen, data, len(data), key, len(key))
    return out.raw


def blake2xb(outlen: int, data: bytes, key: bytes = b"") -> bytes:
    lib = load()
    out = ctypes.create_string_buffer(outlen)
    lib.seal_blake2xb(out, outlen, data, len(data), key, len(key))
    return out.raw


def blake2xb_fill(outlen: int, counter: int, seed64: bytes) -> bytes:
    lib = load()
    out = ctypes.create_string_buffer(outlen)
    lib.seal_blake2xb_fill(out, outlen, counter, seed64)
    return out.raw
