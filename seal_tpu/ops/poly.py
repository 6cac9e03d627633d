"""Coefficient-wise polynomial kernels over the RNS representation (device).

Device counterpart of the reference's ``util/polyarithsmallmod.{h,cpp}``: all
ops act on u64-in-uint32-lanes arrays of shape (..., k, n) with per-limb
modulus constants shaped (k, 1) so one traced op covers every RNS limb (the
reference's ``SEAL_ITERATE`` limb loops become a broadcast axis).  Galois
automorphisms are gathers over host-precomputed index tables
(cf. ``util/galois.cpp:18-51, 148-218``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import u64 as U

U64 = U.U64


def add(x: U64, y: U64, q: U64) -> U64:
    return U.add_mod(x, y, q)


def sub(x: U64, y: U64, q: U64) -> U64:
    return U.sub_mod(x, y, q)


def negate(x: U64, q: U64) -> U64:
    return U.neg_mod(x, q)


def dyadic_product(x: U64, y: U64, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """Elementwise (x*y) mod q; tolerates lazy inputs < 4q (128-bit Barrett)."""
    return U.mul_mod(x, y, q, ratio_lo, ratio_hi)


def mul_scalar_shoup(x: U64, s_op: U64, s_qt: U64, q: U64) -> U64:
    """x * s mod q with host-precomputed Shoup quotient; s < q, x < q."""
    return U.mul_mod_shoup(x, s_op, s_qt, q)


def mul_scalar(x: U64, s: U64, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """x * s mod q via Barrett (for device-computed scalars)."""
    return U.mul_mod(x, s, q, ratio_lo, ratio_hi)


def reduce_coeffs(x: U64, q: U64, ratio_hi: U64) -> U64:
    """Reduce arbitrary u64 coefficients into [0, q) (modulo_poly_coeffs)."""
    return U.barrett_reduce_64(x, q, ratio_hi)


def negacyclic_shift(x: U64, shift: int, q: U64) -> U64:
    """Multiply by x^shift in Z_q[X]/(X^n+1): roll + sign flip of wrapped part.

    cf. ``negacyclic_shift_poly_coeffmod`` (polyarithsmallmod.cpp:319-365).
    ``shift`` is static (trace-time) and taken mod 2n: shift in [n, 2n)
    negates everything once more.
    """
    lo, hi = x
    n = lo.shape[-1]
    shift = shift % (2 * n)
    extra_neg = shift >= n
    shift = shift % n
    if shift == 0:
        out = x
    else:
        lo_r = jnp.roll(lo, shift, axis=-1)
        hi_r = jnp.roll(hi, shift, axis=-1)
        wrapped = jnp.arange(n, dtype=jnp.int32) < shift
        neg = U.neg_mod((lo_r, hi_r), q)
        out = U.select64(wrapped, neg, (lo_r, hi_r))
    if extra_neg:
        out = U.neg_mod(out, q)
    return out


def mono_multiply(x: U64, mono_coeff: U64, mono_exponent: int, q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """Multiply by (mono_coeff * X^mono_exponent) negacyclically.

    cf. ``negacyclic_multiply_poly_mono_coeffmod`` — used by the
    multiply_plain monomial fast path.
    """
    scaled = U.mul_mod(x, mono_coeff, q, ratio_lo, ratio_hi)
    return negacyclic_shift(scaled, mono_exponent, q)


# ---------------------------------------------------------------------------
# Galois automorphisms
# ---------------------------------------------------------------------------

def make_galois_table_coeff(n: int, galois_elt: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host: coefficient-domain permutation for x -> x^elt.

    Returns (src_index, negate_flag) arrays of length n such that
    ``out[j] = (-1)^negate_flag[j] * in[src_index[j]]``.
    """
    logn = n.bit_length() - 1
    src = np.zeros(n, dtype=np.int32)
    neg = np.zeros(n, dtype=bool)
    for i in range(n):
        index_raw = i * galois_elt
        index = index_raw & (n - 1)
        src[index] = i
        neg[index] = bool((index_raw >> logn) & 1)
    return src, neg


def make_galois_table_ntt(n: int, galois_elt: int) -> np.ndarray:
    """Host: NTT-domain permutation table (gather source indices).

    Mirrors the math of ``GaloisTool::generate_table_ntt``
    (galois.cpp:18-51): for slot i, source = bitrev(((elt * (2n-1-ish)) ...)
    computed over bit-reversed indexing.
    """
    logn = n.bit_length() - 1

    def rev(v, bits):
        r = 0
        for _ in range(bits):
            r = (r << 1) | (v & 1)
            v >>= 1
        return r

    table = np.zeros(n, dtype=np.int32)
    for i in range(n, 2 * n):
        reversed_i = rev(i, logn + 1)
        index_raw = (galois_elt * reversed_i) >> 1
        index_raw &= n - 1
        table[i - n] = rev(index_raw, logn)
    return table


def apply_galois_coeff(x: U64, src_index: jnp.ndarray, negate_flag: jnp.ndarray, q: U64) -> U64:
    """Coefficient-domain automorphism: gather + conditional negate."""
    lo, hi = x
    lo_g = jnp.take(lo, src_index, axis=-1)
    hi_g = jnp.take(hi, src_index, axis=-1)
    neg = U.neg_mod((lo_g, hi_g), q)
    return U.select64(negate_flag, neg, (lo_g, hi_g))


def apply_galois_ntt(x: U64, table: jnp.ndarray) -> U64:
    """NTT-domain automorphism: pure gather."""
    lo, hi = x
    return jnp.take(lo, table, axis=-1), jnp.take(hi, table, axis=-1)


def galois_ntt_structure(table) -> "tuple | None":
    """Factor an NTT-domain Galois permutation into MXU-friendly pieces.

    Empirically (and it follows from the bit-reversed layout of the
    ψ-power table: the automorphism is affine on odd exponents, and the
    low log2(128) exponent bits map within a 128-block), every
    ``make_galois_table_ntt`` permutation maps whole 128-element rows to
    rows: reshaped (R, 128) with R = n/128, ``table[r, :] // 128`` is a
    constant f(r), and ``table[r, :] % 128`` is a per-row column
    permutation.  Returns (row_map int32 (R,), col_onehot int8
    (R, 128, 128)) — or None if the structure does not hold (caller then
    keeps the gather path).
    """
    import numpy as np

    t = np.asarray(table)
    n = t.shape[-1]
    if n < 128 or n % 128:
        return None
    R = n // 128
    t2 = t.reshape(R, 128)
    rows = t2 // 128
    if not (rows == rows[:, :1]).all():
        return None
    row_map = rows[:, 0].astype(np.int32)
    cols = (t2 % 128).astype(np.int64)
    onehot = np.zeros((R, 128, 128), dtype=np.int8)
    r_idx = np.repeat(np.arange(R), 128)
    onehot[r_idx, cols.reshape(-1), np.tile(np.arange(128), R)] = 1
    return row_map, onehot


def apply_galois_ntt_mxu(x: U64, row_map, col_onehot) -> U64:
    """NTT-domain automorphism as row-take + one-hot int8 MXU contraction.

    XLA's TPU lane-axis gather runs ~10x below HBM speed of light (54 us
    for 512 KB at n=8192 k=4); this formulation moves the per-row column
    permutation onto the MXU: each u32 lane splits into four 8-bit planes,
    each plane contracts with the (R, 128, 128) one-hot matrix
    ('...krc,rcs->...krs', int32 accumulation), and planes recombine by
    shifts.  Bytes >= 128 read back from the signed int8 product via
    ``& 0xff`` — one-hot selection preserves the byte exactly.
    """
    from .rns import int8_plane_dot

    row_map = jnp.asarray(row_map)

    def perm(a: jnp.ndarray) -> jnp.ndarray:
        lead = a.shape[:-1]
        n = a.shape[-1]
        a3 = a.reshape(*lead, n // 128, 128)
        a3 = jnp.take(a3, row_map, axis=-2)
        out = jnp.zeros_like(a3)
        for p in range(4):
            plane = ((a3 >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(jnp.int8)
            sel = int8_plane_dot("rcs,...rc->...rs", col_onehot, plane)
            out = out | ((sel.astype(jnp.uint32) & jnp.uint32(0xFF)) << jnp.uint32(8 * p))
        return out.reshape(*lead, n)

    lo, hi = x
    return perm(lo), perm(hi)


def get_elt_from_step(step: int, n: int) -> int:
    """Rotation step -> Galois element (powers of generator 3 mod 2n).

    cf. ``GaloisTool::get_elt_from_step`` (galois.cpp:53-94).
    """
    m = 2 * n
    if step == 0:
        return m - 1
    sign = step < 0
    pos = abs(step)
    if pos >= (n >> 1):
        raise ValueError("step count too large")
    step_count = (n >> 1) - pos if sign else pos
    return pow(3, step_count, m)


def get_elts_all(n: int):
    """Galois elements enabling all power-of-two rotations + conjugation:
    ``m-1`` plus repeated squarings of the generator 3 and its inverse.

    cf. ``GaloisTool::get_elts_all`` (galois.cpp:106-131).
    """
    m = 2 * n
    logn = n.bit_length() - 1
    elts = [m - 1]
    pos_power = 3
    neg_power = numth_invert(3, m)
    for _ in range(logn - 1):
        elts.append(pos_power)
        pos_power = (pos_power * pos_power) & (m - 1)
        elts.append(neg_power)
        neg_power = (neg_power * neg_power) & (m - 1)
    return elts


def numth_invert(value: int, modulus: int) -> int:
    from .. import numth

    return numth.invert_mod(value, modulus)
