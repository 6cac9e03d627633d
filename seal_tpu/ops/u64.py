"""64-bit modular arithmetic emulated on 32-bit lanes (jnp, TPU-friendly).

TPU vector units have no native 64-bit integer multiply, so a u64 value is a
pair of uint32 arrays ``(lo, hi)``; widening 32x32->64 products are built from
16-bit digit products that each fit a uint32 lane.  This module is the device
counterpart of the reference's scalar kernels in
``native/src/seal/util/uintarithsmallmod.h`` (Barrett 64/128-bit reduction,
Shoup multiplication, lazy variants) — same reduction algorithms, re-derived
for 32-bit lane emulation rather than translated.

Conventions:
  * A "u64 array" is a tuple ``(lo, hi)`` of equal-shape ``jnp.uint32``.
  * A "u128 array" is a tuple ``(w0, w1, w2, w3)`` little-endian uint32.
  * Moduli/ratios enter as broadcastable u64 arrays (e.g. shape ``(k, 1)``
    against data ``(k, N)``) so one traced kernel covers all RNS limbs.
  * All ops are shape-polymorphic pure functions safe under jit/vmap/shard_map.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

U64 = Tuple[jnp.ndarray, jnp.ndarray]

# numpy scalars (not jnp arrays) so kernels can close over them freely
_MASK16 = np.uint32(0xFFFF)
_U32_1 = np.uint32(1)
_U32_0 = np.uint32(0)


# ---------------------------------------------------------------------------
# Host <-> device conversion helpers
# ---------------------------------------------------------------------------

def from_np_u64(arr) -> U64:
    """Split a host numpy uint64 (or Python-int) array into uint32 lanes."""
    a = np.asarray(arr, dtype=np.uint64)
    lo = jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((a >> np.uint64(32)).astype(np.uint32))
    return lo, hi


def to_np_u64(x: U64) -> np.ndarray:
    lo, hi = x
    return np.asarray(lo, dtype=np.uint64) | (np.asarray(hi, dtype=np.uint64) << np.uint64(32))


def const_u64(value: int, shape=(), dtype=jnp.uint32) -> U64:
    lo = jnp.full(shape, value & 0xFFFFFFFF, dtype=dtype)
    hi = jnp.full(shape, (value >> 32) & 0xFFFFFFFF, dtype=dtype)
    return lo, hi


def pack(x: U64, axis: int = -1) -> jnp.ndarray:
    """Stack (lo, hi) into one array along a new axis (storage layout)."""
    return jnp.stack(x, axis=axis)


def unpack(arr: jnp.ndarray, axis: int = -1) -> U64:
    lo, hi = jnp.split(arr, 2, axis=axis)
    return lo.squeeze(axis), hi.squeeze(axis)


# ---------------------------------------------------------------------------
# 32-bit primitives
# ---------------------------------------------------------------------------

def mul32_wide(a: jnp.ndarray, b: jnp.ndarray) -> U64:
    """Full 32x32 -> 64 product from four 16-bit digit products."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    t = m10 + (m00 >> 16)            # < 2^32, no overflow
    t2 = m01 + (t & _MASK16)         # < 2^32, no overflow
    lo = (m00 & _MASK16) | (t2 << 16)
    hi = m11 + (t >> 16) + (t2 >> 16)
    return lo, hi


def _carry_add(a: jnp.ndarray, b: jnp.ndarray) -> U64:
    """a + b with carry-out (both uint32): returns (sum, carry)."""
    s = a + b
    return s, (s < a).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# u64 add/sub/compare/select
# ---------------------------------------------------------------------------

def add64(x: U64, y: U64) -> U64:
    lo, c = _carry_add(x[0], y[0])
    hi = x[1] + y[1] + c
    return lo, hi


def add64_carry(x: U64, y: U64) -> Tuple[U64, jnp.ndarray]:
    lo, c = _carry_add(x[0], y[0])
    h1, c1 = _carry_add(x[1], y[1])
    h2, c2 = _carry_add(h1, c)
    return (lo, h2), c1 + c2


def sub64(x: U64, y: U64) -> U64:
    borrow = (x[0] < y[0]).astype(jnp.uint32)
    lo = x[0] - y[0]
    hi = x[1] - y[1] - borrow
    return lo, hi


def neg64(x: U64) -> U64:
    return sub64((_U32_0, _U32_0), x)


def ge64(x: U64, y: U64) -> jnp.ndarray:
    """x >= y, boolean array."""
    return (x[1] > y[1]) | ((x[1] == y[1]) & (x[0] >= y[0]))


def lt64(x: U64, y: U64) -> jnp.ndarray:
    return ~ge64(x, y)

def eq64(x: U64, y: U64) -> jnp.ndarray:
    return (x[0] == y[0]) & (x[1] == y[1])


def select64(pred: jnp.ndarray, x: U64, y: U64) -> U64:
    """pred ? x : y elementwise."""
    return jnp.where(pred, x[0], y[0]), jnp.where(pred, x[1], y[1])


def shr64(x: U64, n: int) -> U64:
    """Logical right shift by a static amount 0 < n < 64."""
    if n == 0:
        return x
    if n < 32:
        lo = (x[0] >> n) | (x[1] << (32 - n))
        hi = x[1] >> n
    else:
        lo = x[1] >> (n - 32) if n > 32 else x[1]
        hi = jnp.zeros_like(x[1])
    return lo, hi


def shl64(x: U64, n: int) -> U64:
    if n == 0:
        return x
    if n < 32:
        hi = (x[1] << n) | (x[0] >> (32 - n))
        lo = x[0] << n
    else:
        hi = x[0] << (n - 32) if n > 32 else x[0]
        lo = jnp.zeros_like(x[0])
    return lo, hi


# ---------------------------------------------------------------------------
# u64 multiplication
# ---------------------------------------------------------------------------

def mullo64(x: U64, y: U64) -> U64:
    """Low 64 bits of x*y (wrapping)."""
    w0, c = mul32_wide(x[0], y[0])
    w1 = c + x[0] * y[1] + x[1] * y[0]
    return w0, w1


def mul64_wide(x: U64, y: U64) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full 64x64 -> 128 product as four uint32 words."""
    p00_lo, p00_hi = mul32_wide(x[0], y[0])
    p01_lo, p01_hi = mul32_wide(x[0], y[1])
    p10_lo, p10_hi = mul32_wide(x[1], y[0])
    p11_lo, p11_hi = mul32_wide(x[1], y[1])

    s, c1 = _carry_add(p00_hi, p01_lo)
    w1, c2 = _carry_add(s, p10_lo)

    t, c3 = _carry_add(p01_hi, p10_hi)
    t2, c4 = _carry_add(t, p11_lo)
    t3, c5 = _carry_add(t2, c1 + c2)
    w2 = t3
    w3 = p11_hi + c3 + c4 + c5
    return p00_lo, w1, w2, w3


def mulhi64(x: U64, y: U64) -> U64:
    """High 64 bits of the 128-bit product."""
    _, _, w2, w3 = mul64_wide(x, y)
    return w2, w3


def add128(a, b):
    """Add two u128 (4-word) values, wrapping mod 2^128."""
    s0, c0 = _carry_add(a[0], b[0])
    s1a, c1a = _carry_add(a[1], b[1])
    s1, c1b = _carry_add(s1a, c0)
    s2a, c2a = _carry_add(a[2], b[2])
    s2, c2b = _carry_add(s2a, c1a + c1b)
    s3 = a[3] + b[3] + c2a + c2b
    return s0, s1, s2, s3


def zero128(shape):
    z = jnp.zeros(shape, dtype=jnp.uint32)
    return z, z, z, z


# ---------------------------------------------------------------------------
# Modular arithmetic (reference: uintarithsmallmod.h)
# ---------------------------------------------------------------------------

def add_mod(x: U64, y: U64, q: U64) -> U64:
    """(x + y) mod q; inputs < q (sum never wraps 2^64 for q < 2^63)."""
    s = add64(x, y)
    return select64(ge64(s, q), sub64(s, q), s)


def sub_mod(x: U64, y: U64, q: U64) -> U64:
    """(x - y) mod q; inputs < q."""
    borrow = lt64(x, y)
    d = sub64(x, y)
    return select64(borrow, add64(d, q), d)


def neg_mod(x: U64, q: U64) -> U64:
    """(-x) mod q; input < q (maps 0 -> 0)."""
    nz = (x[0] | x[1]) != 0
    d = sub64(q, x)
    return select64(nz, d, x)


def barrett_reduce_64(x: U64, q: U64, ratio_hi: U64) -> U64:
    """x mod q for 64-bit x; ratio_hi = floor(2^128/q) >> 64.

    Same algorithm as the reference's ``barrett_reduce_64``
    (uintarithsmallmod.h:211-236): one mulhi, one mullo, one conditional
    subtraction.
    """
    tmp1 = mulhi64(x, ratio_hi)
    red = sub64(x, mullo64(tmp1, q))
    return select64(ge64(red, q), sub64(red, q), red)


def barrett_reduce_128(z, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """z mod q for a 128-bit z = (w0..w3); ratio = floor(2^128/q) as two u64.

    Follows ``barrett_reduce_128`` (uintarithsmallmod.h:167-205): estimate
    quotient via 3 partial products of z with const_ratio, subtract q*quot,
    one conditional correction.
    """
    z0: U64 = (z[0], z[1])
    z1: U64 = (z[2], z[3])
    # Round 1
    carry = mulhi64(z0, ratio_lo)
    tmp2_lo = mullo64(z0, ratio_hi)
    tmp2_hi = mulhi64(z0, ratio_hi)
    tmp1, c = add64_carry(tmp2_lo, carry)
    tmp3 = add64(tmp2_hi, (c, _U32_0))
    # Round 2
    t2lo = mullo64(z1, ratio_lo)
    t2hi = mulhi64(z1, ratio_lo)
    tmp1, c = add64_carry(tmp1, t2lo)
    carry2 = add64(t2hi, (c, _U32_0))
    # quotient (low 64 bits)
    quot = add64(add64(mullo64(z1, ratio_hi), tmp3), carry2)
    red = sub64(z0, mullo64(quot, q))
    return select64(ge64(red, q), sub64(red, q), red)


def mul_mod(x: U64, y: U64, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """(x*y) mod q via 128-bit Barrett."""
    z = mul64_wide(x, y)
    return barrett_reduce_128(z, q, ratio_lo, ratio_hi)


def mul_mod_shoup(x: U64, y: U64, y_quot: U64, q: U64) -> U64:
    """x*y mod q with Shoup-precomputed quotient floor(y<<64 / q); y < q.

    cf. ``multiply_uint_mod(x, MultiplyUIntModOperand, q)``
    (uintarithsmallmod.h:292-310).
    """
    tmp1 = mulhi64(x, y_quot)
    tmp2 = sub64(mullo64(y, x), mullo64(tmp1, q))
    return select64(ge64(tmp2, q), sub64(tmp2, q), tmp2)


def mul_mod_shoup_lazy(x: U64, y: U64, y_quot: U64, q: U64) -> U64:
    """Like mul_mod_shoup but result in [0, 2q)."""
    tmp1 = mulhi64(x, y_quot)
    return sub64(mullo64(y, x), mullo64(tmp1, q))


def mul_add_mod(x: U64, y: U64, z: U64, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """(x*y + z) mod q (z < 2^64); lazy 128-bit accumulate then Barrett."""
    w0, w1, w2, w3 = mul64_wide(x, y)
    (lo, hi), c = add64_carry((w0, w1), z)
    hi2 = add64((w2, w3), (c, _U32_0))
    return barrett_reduce_128((lo, hi, hi2[0], hi2[1]), q, ratio_lo, ratio_hi)
