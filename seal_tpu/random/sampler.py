"""RLWE noise/secret samplers (host, numpy), consuming PRNG byte streams.

Counterpart of ``util/rlwe.cpp:21-188``.  Byte-stream parity notes:
  * ``sample_poly_uniform`` consumes the stream exactly as the reference
    (bulk fill of k*n u64 words, then per-limb rejection redraws) — this is
    the sampler used for seeded-ciphertext expansion, so wire compatibility
    depends on it.
  * ``sample_poly_cbd`` (the default noise sampler) is byte-exact: 6 bytes
    per coefficient, top bits of x[2]/x[5] masked to 5 bits, difference of
    hamming weights.
  * ``sample_poly_ternary`` draws 32-bit words with rejection (multiples of
    3 below 2^32) — the reference defers to ``std::uniform_int_distribution``
    whose byte consumption is stdlib-specific, so no byte-level contract
    exists there; distribution and determinism-for-a-seed are preserved.
  * ``sample_poly_normal`` is the optional clipped Gaussian (sigma 3.2),
    Box-Muller over stream doubles.

All samplers return uint64 arrays of shape (k, n): the sampled small value
replicated into every RNS limb (negatives represented as q_i - |v|).
"""

from __future__ import annotations

import math
import struct
from typing import Sequence

import numpy as np

NOISE_STANDARD_DEVIATION = 3.2
NOISE_MAX_DEVIATION = NOISE_STANDARD_DEVIATION * 6


def _replicate_signed(values: np.ndarray, moduli: Sequence[int]) -> np.ndarray:
    """Signed small ints (n,) -> (k, n) uint64 with negatives lifted mod q_i."""
    n = len(values)
    v = values.astype(np.int64)
    out = np.zeros((len(moduli), n), dtype=np.uint64)
    for i, q in enumerate(moduli):
        out[i] = np.where(v < 0, np.uint64(q) + v.astype(np.uint64), v.astype(np.uint64))
    return out


def sample_poly_ternary(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Uniform ternary {-1, 0, 1} secret polynomial.

    Byte-exact with the reference (rlwe.cpp:21-38), which draws
    ``std::uniform_int_distribution<uint64_t>(0, 2)`` over a 32-bit engine:
    libstdc++ maps by *division* — reject 0xFFFFFFFF, then
    ``word // ((2^32-1)//3)`` — one 32-bit word per coefficient.
    (Verified against reference-produced fixed-seed secret keys in
    tests/test_wire_compat.py.)
    """
    scaling = ((1 << 32) - 1) // 3  # 1431655765
    past = 3 * scaling  # 4294967295: only 0xFFFFFFFF is rejected
    buf = np.frombuffer(prng.generate(4 * n), dtype="<u4").astype(np.int64)
    bad = buf >= past
    while bad.any():
        redraw = np.frombuffer(prng.generate(4 * int(bad.sum())), dtype="<u4").astype(np.int64)
        buf[np.where(bad)[0]] = redraw
        bad = buf >= past
    vals = (buf // scaling) - 1  # {-1, 0, 1}
    return _replicate_signed(vals, moduli)


def sample_poly_cbd(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Centered binomial noise, sigma=3.2 (cf. rlwe.cpp:66-103, byte-exact)."""
    raw = np.frombuffer(prng.generate(6 * n), dtype=np.uint8).reshape(n, 6).copy()
    raw[:, 2] &= 0x1F
    raw[:, 5] &= 0x1F
    weights = np.unpackbits(raw, axis=1).sum(axis=1, dtype=np.int64)
    pos = np.unpackbits(raw[:, :3], axis=1).sum(axis=1, dtype=np.int64)
    noise = 2 * pos - weights  # pos - (weights - pos)
    return _replicate_signed(noise, moduli)


def sample_poly_normal(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Clipped Gaussian noise (optional build flavor; cf. clipnormal.h)."""
    out = np.zeros(n, dtype=np.int64)
    i = 0
    while i < n:
        u1, u2 = struct.unpack("<2Q", prng.generate(16))
        a = (u1 >> 11) / (1 << 53)
        b = (u2 >> 11) / (1 << 53)
        if a <= 0.0:
            continue
        r = math.sqrt(-2.0 * math.log(a)) * NOISE_STANDARD_DEVIATION
        for val in (r * math.cos(2 * math.pi * b), r * math.sin(2 * math.pi * b)):
            if i < n and abs(val) <= NOISE_MAX_DEVIATION:
                out[i] = int(round(val))
                i += 1
    return _replicate_signed(out, moduli)


def sample_poly_uniform(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Uniform polynomial mod each q_i; byte-exact vs rlwe.cpp:104-135."""
    k = len(moduli)
    dest = np.frombuffer(prng.generate(8 * k * n), dtype="<u8").reshape(k, n).copy()
    max_random = 0xFFFFFFFFFFFFFFFF
    for j, q in enumerate(moduli):
        max_multiple = np.uint64(max_random - (max_random % q) - 1)
        row = dest[j]
        # vectorized rejection: redraw only offending positions, preserving
        # the reference's per-coefficient redraw order (row-major scan)
        bad = np.nonzero(row >= max_multiple)[0]
        for c in bad:
            r = int(row[c])
            while r >= int(max_multiple):
                (r,) = struct.unpack("<Q", prng.generate(8))
            row[c] = r
        np.mod(row, np.uint64(q), out=row)
    return dest


def _sample_poly_uniform_legacy(prng, n, moduli, shift_a, shift_b, max_random):
    """Common engine for the SEAL 3.4 / 3.5 legacy uniform samplers.

    Both legacy variants (rlwe.cpp:134-188) draw through the 32-bit
    ``RandomToStandardAdapter`` engine — two engine() words per attempt,
    combined as ``(a << shift_a) | (b >> shift_b)`` — with inline rejection:
    a rejected attempt immediately redraws two more words for the SAME
    coefficient before the scan advances.  That means the accepted attempts,
    in stream order, ARE the coefficients in order; we exploit this to
    vectorize: draw attempt batches, keep the accepted ones, top up until a
    limb has n values.  Byte consumption is identical to the reference's
    scalar loop (each attempt is exactly 8 stream bytes, in the same order).
    """
    k = len(moduli)
    dest = np.zeros((k, n), dtype=np.uint64)
    for j, q in enumerate(moduli):
        max_multiple = max_random - (max_random % q) - 1
        accepted = np.zeros(0, dtype=np.uint64)
        need = n
        while need > 0:
            words = np.frombuffer(prng.generate(8 * need), dtype="<u4").astype(np.uint64)
            a, b = words[0::2], words[1::2]
            rand = (a << np.uint64(shift_a)) | (b >> np.uint64(shift_b))
            ok = rand < np.uint64(max_multiple)
            accepted = np.concatenate([accepted, rand[ok]])
            need = n - len(accepted)
        dest[j] = accepted % np.uint64(q)
    return dest


def sample_poly_uniform_seal_3_4(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Uniform sampler byte-compatible with Microsoft SEAL 3.4 seeded
    ciphertexts: rand = (engine() << 31) | (engine() >> 1), 63-bit range
    (rlwe.cpp:137-163)."""
    return _sample_poly_uniform_legacy(prng, n, moduli, 31, 1, (1 << 63) - 1)


def sample_poly_uniform_seal_3_5(prng, n: int, moduli: Sequence[int]) -> np.ndarray:
    """Uniform sampler byte-compatible with Microsoft SEAL 3.5 seeded
    ciphertexts: rand = (engine() << 32) | engine(), full 64-bit range
    (rlwe.cpp:165-188)."""
    return _sample_poly_uniform_legacy(prng, n, moduli, 32, 0, (1 << 64) - 1)


# Default noise sampler selection (reference CMake SEAL_NOISE_SAMPLER: CBD).
sample_poly_noise = sample_poly_cbd
