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
_SOURCES = ["blake2.c", "ntt_mod.c"]
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
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.seal_ntt_mod_fwd.argtypes = [
            u64p, ctypes.c_size_t, ctypes.c_uint64, u64p, u64p,
        ]
        lib.seal_ntt_mod_inv.argtypes = [
            u64p, ctypes.c_size_t, ctypes.c_uint64, u64p, u64p,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ]
        _LIB = lib
        return _LIB


def _u64p(arr):
    import numpy as np

    assert arr.dtype == np.uint64 and arr.flags["C_CONTIGUOUS"]
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ntt_mod_fwd(arr, q: int, w_op, w_qt) -> None:
    """In-place forward negacyclic NTT mod q of a (n,) uint64 array."""
    lib = load()
    lib.seal_ntt_mod_fwd(_u64p(arr), arr.size, q, _u64p(w_op), _u64p(w_qt))


def ntt_mod_inv(arr, q: int, w_op, w_qt, invn_op: int, invn_qt: int,
                last_op: int, last_qt: int) -> None:
    """In-place inverse negacyclic NTT mod q (1/n fused)."""
    lib = load()
    lib.seal_ntt_mod_inv(_u64p(arr), arr.size, q, _u64p(w_op), _u64p(w_qt),
                         invn_op, invn_qt, last_op, last_qt)


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
