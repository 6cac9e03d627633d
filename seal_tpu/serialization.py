"""Serialization: SEAL-compatible wire format for every object.

Counterpart of ``serialization.{h,cpp}`` + per-object ``save_members``:
16-byte SEALHeader (magic 0xA15E, header size, version, compression mode,
total size) followed by the member payload, optionally compressed.  Formats
follow the reference byte for byte (little-endian), including nested
header-wrapped sub-objects (Modulus inside EncryptionParameters, DynArray
inside Plaintext/Ciphertext) and the seeded-ciphertext half-size
representation expanded through the recorded PRNG seed.

Compression: zlib is supported via the stdlib; Zstandard is supported when a
``zstandard`` module is importable (gated, like the reference's CMake
options).  Decompressed sizes are bounds-checked against the declared size to
harden against decompression bombs (cf. ztools.cpp, CHANGES v4.3.3).
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Optional, Tuple

import numpy as np

SEAL_MAGIC = 0xA15E
SEAL_HEADER_SIZE = 0x10
VERSION_MAJOR = 4
VERSION_MINOR = 4

COMPR_NONE = 0
COMPR_ZLIB = 1
COMPR_ZSTD = 2

try:  # optional Zstandard backend
    import zstandard as _zstd  # type: ignore

    _HAS_ZSTD = True
except Exception:
    _zstd = None
    _HAS_ZSTD = False

COMPR_MODE_DEFAULT = COMPR_ZSTD if _HAS_ZSTD else COMPR_ZLIB

# Safety bound for decompressed payloads (bomb hardening)
MAX_DECOMPRESSED_SIZE = 1 << 32


def _compress(data: bytes, mode: int) -> bytes:
    if mode == COMPR_NONE:
        return data
    if mode == COMPR_ZLIB:
        return zlib.compress(data, 6)
    if mode == COMPR_ZSTD:
        if not _HAS_ZSTD:
            raise ValueError("zstd compression mode is not supported in this build")
        return _zstd.ZstdCompressor().compress(data)
    raise ValueError("unsupported compression mode")


def _decompress(data: bytes, mode: int) -> bytes:
    if mode == COMPR_NONE:
        return data
    if mode == COMPR_ZLIB:
        try:
            d = zlib.decompressobj()
            out = d.decompress(data, MAX_DECOMPRESSED_SIZE)
        except zlib.error as e:
            raise ValueError(f"corrupted zlib stream: {e}") from e
        if d.unconsumed_tail:
            raise ValueError("decompressed size exceeds safety bound")
        return out
    if mode == COMPR_ZSTD:
        if not _HAS_ZSTD:
            raise ValueError("zstd compression mode is not supported in this build")
        try:
            return _zstd.ZstdDecompressor().decompress(data, max_output_size=MAX_DECOMPRESSED_SIZE)
        except _zstd.ZstdError as e:
            raise ValueError(f"corrupted zstd stream: {e}") from e
    raise ValueError("unsupported compression mode")


def _load_guard(fn):
    """Loaders must fail with the library's ValueError taxonomy, never leak
    struct.error/IndexError from malformed blobs (untrusted-load hardening,
    CHANGES v4.4.0)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, IndexError) as e:
            raise ValueError(f"malformed serialized data: {e}") from e

    return wrapped


def save_header_wrapped(members: bytes, compr_mode: int = None) -> bytes:
    """Wrap member bytes in a SEALHeader (Serialization::Save)."""
    if compr_mode is None:
        compr_mode = COMPR_MODE_DEFAULT
    payload = _compress(members, compr_mode)
    size = SEAL_HEADER_SIZE + len(payload)
    header = struct.pack(
        "<HBBBBHQ", SEAL_MAGIC, SEAL_HEADER_SIZE, VERSION_MAJOR, VERSION_MINOR,
        compr_mode, 0, size,
    )
    return header + payload


def peek_version(data: bytes) -> Tuple[int, int]:
    """(major, minor) of a serialized blob's SEALHeader.

    A 16-byte block that fails modern field validation but parses in the
    Microsoft SEAL 3.4 legacy layout is reported as version (3, 4) — the
    reference does the same on header upgrade (serialization.cpp:138-168;
    legacy headers carry no version field, so 3.4 is implied).
    """
    if len(data) < SEAL_HEADER_SIZE:
        raise ValueError("insufficient data for SEALHeader")
    _, hsize, vmaj, vmin, compr, _, _ = struct.unpack_from("<HBBBBHQ", data, 0)
    modern = hsize == SEAL_HEADER_SIZE and vmaj in (VERSION_MAJOR, 3) and compr in (
        COMPR_NONE, COMPR_ZLIB, COMPR_ZSTD,
    )
    if not modern:
        _magic34, zero, compr34, size34, _resv34 = struct.unpack_from("<HBBIQ", data, 0)
        if zero == 0 and compr34 in (COMPR_NONE, COMPR_ZLIB, COMPR_ZSTD) and size34 >= SEAL_HEADER_SIZE:
            return 3, 4
    return vmaj, vmin


def load_header_wrapped(data: bytes) -> Tuple[bytes, int]:
    """Unwrap a SEALHeader; returns (member bytes, total size consumed).

    Mirrors the reference's automatic header upgrade
    (``Serialization::LoadHeader`` with try_upgrade_if_invalid,
    serialization.cpp:138-168): a 16-byte block that fails modern
    validation is reinterpreted in the Microsoft SEAL 3.4 layout
    (``legacy_headers::SEALHeader_3_4``, serialization.h:352-377 —
    u16 magic, u8 zero, u8 compr_mode, u32 size, u64 reserved) and
    accepted if valid in that form.
    """
    if len(data) < SEAL_HEADER_SIZE:
        raise ValueError("insufficient data for SEALHeader")
    magic, hsize, vmaj, vmin, compr, _resv, size = struct.unpack_from("<HBBBBHQ", data, 0)
    if magic != SEAL_MAGIC:
        raise ValueError("invalid SEAL magic")
    modern = hsize == SEAL_HEADER_SIZE and vmaj in (VERSION_MAJOR, 3) and compr in (
        COMPR_NONE, COMPR_ZLIB, COMPR_ZSTD,
    )
    if not modern:
        # legacy 3.4 header (same 16 bytes, different field layout)
        _magic34, zero, compr34, size34, _resv34 = struct.unpack_from("<HBBIQ", data, 0)
        if (
            zero == 0
            and compr34 in (COMPR_NONE, COMPR_ZLIB, COMPR_ZSTD)
            and size34 >= SEAL_HEADER_SIZE
        ):
            compr, size = compr34, size34
        elif hsize != SEAL_HEADER_SIZE:
            raise ValueError("invalid SEALHeader size")
        else:
            raise ValueError("unsupported version")
    if size > len(data):
        raise ValueError("truncated payload")
    payload = data[SEAL_HEADER_SIZE:size]
    return _decompress(bytes(payload), compr), size


# ---------------------------------------------------------------------------
# Leaf object member formats
# ---------------------------------------------------------------------------

def modulus_save(value: int, compr_mode: int = COMPR_NONE) -> bytes:
    return save_header_wrapped(struct.pack("<Q", value), compr_mode)


@_load_guard
def modulus_load(data: bytes) -> Tuple[int, int]:
    members, consumed = load_header_wrapped(data)
    (value,) = struct.unpack_from("<Q", members, 0)
    return value, consumed


def dynarray_save(arr: np.ndarray, compr_mode: int = COMPR_NONE) -> bytes:
    a = np.ascontiguousarray(arr, dtype="<u8")
    members = struct.pack("<Q", a.size) + a.tobytes()
    return save_header_wrapped(members, compr_mode)


@_load_guard
def dynarray_load(data: bytes, max_size: Optional[int] = None) -> Tuple[np.ndarray, int]:
    members, consumed = load_header_wrapped(data)
    (size,) = struct.unpack_from("<Q", members, 0)
    if max_size is not None and size > max_size:
        raise ValueError("DynArray size exceeds expected maximum")
    arr = np.frombuffer(members, dtype="<u8", count=size, offset=8).copy()
    return arr, consumed


# ---------------------------------------------------------------------------
# EncryptionParameters
# ---------------------------------------------------------------------------

def params_save(parms, compr_mode: int = None) -> bytes:
    body = io.BytesIO()
    body.write(struct.pack("<B", int(parms.scheme)))
    body.write(struct.pack("<Q", parms.poly_modulus_degree))
    body.write(struct.pack("<Q", len(parms.coeff_modulus)))
    for m in parms.coeff_modulus:
        body.write(modulus_save(m.value))
    body.write(modulus_save(parms.plain_modulus.value))
    return save_header_wrapped(body.getvalue(), compr_mode)


@_load_guard
def params_load(data: bytes):
    from .modulus import Modulus
    from .params import EncryptionParameters, SchemeType

    members, consumed = load_header_wrapped(data)
    off = 0
    (scheme,) = struct.unpack_from("<B", members, off)
    off += 1
    (degree,) = struct.unpack_from("<Q", members, off)
    off += 8
    (k,) = struct.unpack_from("<Q", members, off)
    off += 8
    coeffs = []
    for _ in range(k):
        v, used = modulus_load(members[off:])
        coeffs.append(Modulus(v))
        off += used
    t, used = modulus_load(members[off:])
    off += used
    parms = EncryptionParameters(SchemeType(scheme))
    if degree:
        parms.set_poly_modulus_degree(degree)
    if coeffs:
        parms.set_coeff_modulus(coeffs)
    if SchemeType(scheme) in (SchemeType.BFV, SchemeType.BGV) and t:
        parms.set_plain_modulus(t)
    return parms, consumed


# ---------------------------------------------------------------------------
# Plaintext / Ciphertext
# ---------------------------------------------------------------------------

def _parms_id_bytes(parms_id) -> bytes:
    return struct.pack("<4Q", *parms_id)


def plaintext_save(plain, compr_mode: int = None) -> bytes:
    from .ops import u64 as U

    body = io.BytesIO()
    body.write(_parms_id_bytes(plain.parms_id))
    if plain.is_ntt_form:
        data = U.to_np_u64(plain.rns_data).reshape(-1)
    else:
        data = np.asarray(plain.coeff_data, dtype=np.uint64)
    body.write(struct.pack("<Q", data.size))
    body.write(struct.pack("<d", plain.scale))
    body.write(dynarray_save(data))
    return save_header_wrapped(body.getvalue(), compr_mode)


@_load_guard
def plaintext_load(data: bytes, context):
    from .data import Plaintext
    from .ops import u64 as U
    from .params import PARMS_ID_ZERO

    members, consumed = load_header_wrapped(data)
    off = 0
    parms_id = struct.unpack_from("<4Q", members, off)
    off += 32
    (coeff_count,) = struct.unpack_from("<Q", members, off)
    off += 8
    (scale,) = struct.unpack_from("<d", members, off)
    off += 8
    arr, used = dynarray_load(members[off:], max_size=coeff_count)
    off += used

    p = Plaintext()
    p.scale = scale
    p.parms_id = tuple(parms_id)
    if p.parms_id != PARMS_ID_ZERO:
        cd = context.get_context_data(p.parms_id)
        if cd is None:
            raise ValueError("plaintext parms_id is invalid for context")
        k = len(cd.parms.coeff_modulus)
        n = cd.parms.poly_modulus_degree
        p.rns_data = U.from_np_u64(arr.reshape(k, n))
        p.coeff_data = np.zeros(0, dtype=np.uint64)
    else:
        p.coeff_data = arr
    return p, consumed


def ciphertext_save(ct, compr_mode: int = None) -> bytes:
    """Save a ciphertext; seeded ciphertexts store c0 + PRNG info only."""
    body = io.BytesIO()
    body.write(_parms_id_bytes(ct.parms_id))
    body.write(struct.pack("<B", 1 if ct.is_ntt_form else 0))
    body.write(struct.pack("<Q", ct.size))
    body.write(struct.pack("<Q", ct.poly_modulus_degree))
    body.write(struct.pack("<Q", ct.coeff_modulus_size))
    body.write(struct.pack("<d", ct.scale))
    body.write(struct.pack("<Q", ct.correction_factor))
    full = ct.to_np()  # (size, k, n)
    if ct.seed_info is not None:
        body.write(dynarray_save(full[0].reshape(-1)))
        body.write(save_header_wrapped(ct.seed_info.save_members(), COMPR_NONE))
    else:
        body.write(dynarray_save(full.reshape(-1)))
    return save_header_wrapped(body.getvalue(), compr_mode)


@_load_guard
def ciphertext_load(data: bytes, context):
    from .data import Ciphertext
    from .ops import ntt as NTT
    from .ops import u64 as U
    from .random import UniformRandomGeneratorInfo
    from .random.sampler import (
        sample_poly_uniform,
        sample_poly_uniform_seal_3_4,
        sample_poly_uniform_seal_3_5,
    )
    from .valcheck import is_metadata_valid_ct

    vmaj, vmin = peek_version(data)
    members, consumed = load_header_wrapped(data)
    off = 0
    parms_id = tuple(struct.unpack_from("<4Q", members, off))
    off += 32
    (ntt_byte,) = struct.unpack_from("<B", members, off)
    off += 1
    (size,) = struct.unpack_from("<Q", members, off)
    off += 8
    (degree,) = struct.unpack_from("<Q", members, off)
    off += 8
    (k,) = struct.unpack_from("<Q", members, off)
    off += 8
    (scale,) = struct.unpack_from("<d", members, off)
    off += 8
    correction = 1
    if vmaj == 4:
        # correction_factor was added in 4.x (ciphertext.cpp load_members)
        (correction,) = struct.unpack_from("<Q", members, off)
        off += 8

    ct = Ciphertext(parms_id=parms_id, is_ntt_form=bool(ntt_byte), scale=scale, correction_factor=correction)
    if not is_metadata_valid_ct(context, parms_id, size, degree, k, allow_key_level=True):
        raise ValueError("ciphertext data is invalid")

    total = size * degree * k
    arr, used = dynarray_load(members[off:], max_size=total)
    off += used

    if arr.size == degree * k:
        # seeded: expand c1 from the stored PRNG info
        if size != 2:
            raise ValueError("ciphertext data is invalid")
        info_members, info_used = load_header_wrapped(members[off:])
        off += info_used
        info = UniformRandomGeneratorInfo.load_members(info_members)
        prng = info.make_prng()
        if prng is None:
            raise ValueError("unknown prng type")
        cd = context.get_context_data(parms_id)
        # c1 is the raw uniform stream regardless of NTT form: the reference
        # samples a directly in whatever form the ciphertext is in
        # (rlwe.cpp:310-330 — "sampled directly in NTT form"), so expansion
        # never applies a transform.  The sampler variant follows the blob's
        # serialization version (ciphertext.cpp:118-151 expand_seed): 3.4 and
        # 3.5 blobs used different engine()-word bit packings.
        if vmaj == 4 or (vmaj == 3 and vmin >= 6):
            expand = sample_poly_uniform
        elif (vmaj, vmin) == (3, 4):
            expand = sample_poly_uniform_seal_3_4
        elif (vmaj, vmin) == (3, 5):
            expand = sample_poly_uniform_seal_3_5
        else:
            # prior to 3.4, AES-128 was used — incompatible (ciphertext.cpp:146-150)
            raise ValueError("incompatible version")
        c1 = expand(prng, degree, cd.coeff_modulus_values)
        c1_dev = U.from_np_u64(c1)
        full = np.stack([arr.reshape(k, degree), np.zeros((k, degree), np.uint64)])
        dev = U.from_np_u64(full)
        import jax.numpy as jnp

        dev = (dev[0].at[1].set(c1_dev[0]), dev[1].at[1].set(c1_dev[1]))
        ct.data = dev
    elif arr.size == total:
        ct.data = U.from_np_u64(arr.reshape(size, k, degree))
    else:
        raise ValueError("ciphertext data is invalid")
    return ct, consumed


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------

def secret_key_save(sk, compr_mode: int = None) -> bytes:
    from .data import Plaintext

    p = Plaintext()
    p.parms_id = sk.parms_id
    p.rns_data = sk.data
    p.scale = 1.0
    return plaintext_save(p, compr_mode)


@_load_guard
def secret_key_load(data: bytes, context):
    from .data import SecretKey

    p, consumed = plaintext_load(data, context)
    return SecretKey(p.rns_data, p.parms_id), consumed


def public_key_save(pk, compr_mode: int = None) -> bytes:
    return ciphertext_save(pk.data, compr_mode)


@_load_guard
def public_key_load(data: bytes, context):
    from .data import PublicKey

    ct, consumed = ciphertext_load(data, context)
    return PublicKey(ct), consumed


def kswitch_keys_save(keys, context, compr_mode: int = None) -> bytes:
    """KSwitchKeys: parms_id + dim1 + per-index (dim2 + PublicKey...)."""
    from .data import Ciphertext
    from .ops import u64 as U

    body = io.BytesIO()
    body.write(_parms_id_bytes(keys.parms_id))
    body.write(struct.pack("<Q", len(keys.keys)))
    for entry in keys.keys:
        if entry is None:
            body.write(struct.pack("<Q", 0))
            continue
        c0 = U.to_np_u64(entry["c0"])  # (D, k_key, n)
        c1 = U.to_np_u64(entry["c1"])
        D = c0.shape[0]
        seeds = entry.get("seeds")
        body.write(struct.pack("<Q", D))
        for j in range(D):
            ct = Ciphertext(
                data=U.from_np_u64(np.stack([c0[j], c1[j]])),
                parms_id=keys.parms_id,
                is_ntt_form=True,
            )
            # Seed-compressed half-size path (Serializable<RelinKeys/GaloisKeys>,
            # keygenerator.h create_*_keys): c1 regenerates from the stored seed.
            if seeds is not None and seeds[j] is not None:
                ct.seed_info = seeds[j]
            body.write(ciphertext_save(ct, COMPR_NONE))
    return save_header_wrapped(body.getvalue(), compr_mode)


@_load_guard
def kswitch_keys_load(data: bytes, context, cls=None):
    from .data import KSwitchKeys
    from .ops import u64 as U

    if cls is None:
        cls = KSwitchKeys
    members, consumed = load_header_wrapped(data)
    off = 0
    parms_id = tuple(struct.unpack_from("<4Q", members, off))
    off += 32
    (dim1,) = struct.unpack_from("<Q", members, off)
    off += 8
    keys = cls()
    keys.parms_id = parms_id
    keys.keys = []
    for _ in range(dim1):
        (dim2,) = struct.unpack_from("<Q", members, off)
        off += 8
        if dim2 == 0:
            keys.keys.append(None)
            continue
        c0s, c1s = [], []
        for _ in range(dim2):
            ct, used = ciphertext_load(members[off:], context)
            off += used
            full = ct.to_np()
            c0s.append(full[0])
            c1s.append(full[1])
        entry = {
            "c0": U.from_np_u64(np.stack(c0s)),
            "c1": U.from_np_u64(np.stack(c1s)),
            "seeds": None,
        }
        keys.keys.append(entry)
    return keys, consumed
