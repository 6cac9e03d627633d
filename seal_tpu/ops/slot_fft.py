"""Device-side CKKS slot FFT in double-float (two-f32) arithmetic.

The reference's encode/decode FFT halves (``ckks.h:510-523`` encode iFFT
with fused scale, ``ckks.h:783-787`` decode forward FFT) run in C++
double.  TPUs have no f64 ALU (and this environment's backend cannot
compile emulated f64), so the device formulation represents every double
as an unevaluated f32 pair ``(hi, lo)`` with ``|lo| <= ulp(hi)/2`` —
classic double-float arithmetic (Dekker 1971 / Knuth TAOCP 4.2.2:
two_sum, split, two_prod).  That carries ~2*24 = 48 mantissa bits
through the butterflies vs f64's 53; FFT round-trip error is
~1e-13 relative at n=8192 (validated in tests/test_slot_fft.py), far
inside every CKKS delta this framework asserts (tightest: 1e-10).

The stage structure mirrors ``CKKSEncoder._fft_from_rev/_fft_to_rev``
(itself the complex specialization of dwthandler.h:94-356): log n
reshape-butterfly passes with the same scrambled root ordering, so the
device and host paths compute the same mathematical transform and differ
only in working precision.

Complex values are four f32 arrays (re_hi, re_lo, im_hi, im_lo).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

# ---------------------------------------------------------------------------
# double-float scalar kernels (error-free transformations)
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b|; 3 flops instead of 6."""
    s = a + b
    err = b - (s - a)
    return s, err


def _split(a):
    """Dekker split of an f32 into 12+12-bit halves (2^12 + 1 = 4097)."""
    t = a * F32(4097.0)
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df_add(x, y):
    """(hi, lo) + (hi, lo) -> (hi, lo)."""
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _quick_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def df_neg(x):
    return (-x[0], -x[1])


# complex double-float: c = (re, im), each a df pair


def cdf_add(a, b):
    return (df_add(a[0], b[0]), df_add(a[1], b[1]))


def cdf_sub(a, b):
    return (df_sub(a[0], b[0]), df_sub(a[1], b[1]))


def cdf_mul(a, b):
    re = df_sub(df_mul(a[0], b[0]), df_mul(a[1], b[1]))
    im = df_add(df_mul(a[0], b[1]), df_mul(a[1], b[0]))
    return (re, im)


# ---------------------------------------------------------------------------
# host <-> double-float conversion
# ---------------------------------------------------------------------------


def split_f64(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f64 array -> (hi, lo) f32 arrays with hi + lo == x to ~48 bits."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def split_c128(x: np.ndarray):
    """complex128 -> (re_hi, re_lo, im_hi, im_lo) f32 arrays."""
    rh, rl = split_f64(np.real(x))
    ih, il = split_f64(np.imag(x))
    return rh, rl, ih, il


def combine_c128(rh, rl, ih, il) -> np.ndarray:
    re = np.asarray(rh).astype(np.float64) + np.asarray(rl).astype(np.float64)
    im = np.asarray(ih).astype(np.float64) + np.asarray(il).astype(np.float64)
    return re + 1j * im


# ---------------------------------------------------------------------------
# stage tables (host precompute, one per (n, direction))
# ---------------------------------------------------------------------------


def inv_fft_stage_roots(inv_root_powers: np.ndarray, n: int) -> List:
    """Per-stage df root slices for the from_rev (inverse) FFT, matching
    CKKSEncoder._fft_from_rev's offset walk; the last entry is the single
    final-stage root (scalar)."""
    stages = []
    offset = 1
    m = n >> 1
    while m > 1:
        stages.append(split_c128(inv_root_powers[offset:offset + m]))
        offset += m
        m >>= 1
    stages.append(split_c128(inv_root_powers[offset:offset + 1]))
    return stages


def fwd_fft_stage_roots(root_powers: np.ndarray, n: int) -> List:
    """Per-stage df root slices for the to_rev (forward) FFT."""
    stages = []
    m = 1
    while m < n:
        stages.append(split_c128(root_powers[m:2 * m]))
        m <<= 1
    return stages


# ---------------------------------------------------------------------------
# device FFTs (traced; roots enter as constants via closure)
# ---------------------------------------------------------------------------


def _as_cdf(parts):
    rh, rl, ih, il = parts
    return ((rh, rl), (ih, il))


def fft_from_rev(x, stage_roots, fix_df, n: int):
    """Inverse FFT, bit-reversed input -> natural order, scaled by fix.

    ``x``: (re_hi, re_lo, im_hi, im_lo) f32 arrays of shape (n,).
    ``stage_roots``: host tables from ``inv_fft_stage_roots``.
    ``fix_df``: (hi, lo) scalar df pair (python floats or traced f32
    scalars) for the fused 1/n * scale (dwthandler.h:166-189 analog).
    Returns the same 4-array representation.
    """
    re = (x[0], x[1])
    im = (x[2], x[3])
    gap = 1
    m = n >> 1
    si = 0
    while m > 1:
        rr = stage_roots[si]
        r = (
            (jnp.asarray(rr[0]).reshape(m, 1), jnp.asarray(rr[1]).reshape(m, 1)),
            (jnp.asarray(rr[2]).reshape(m, 1), jnp.asarray(rr[3]).reshape(m, 1)),
        )
        v = [(p.reshape(m, 2, gap)) for p in (re[0], re[1], im[0], im[1])]
        a = ((v[0][:, 0], v[1][:, 0]), (v[2][:, 0], v[3][:, 0]))
        b = ((v[0][:, 1], v[1][:, 1]), (v[2][:, 1], v[3][:, 1]))
        x0 = cdf_add(a, b)
        x1 = cdf_mul(cdf_sub(a, b), r)
        re = (
            jnp.stack([x0[0][0], x1[0][0]], axis=1).reshape(n),
            jnp.stack([x0[0][1], x1[0][1]], axis=1).reshape(n),
        )
        im = (
            jnp.stack([x0[1][0], x1[1][0]], axis=1).reshape(n),
            jnp.stack([x0[1][1], x1[1][1]], axis=1).reshape(n),
        )
        si += 1
        gap <<= 1
        m >>= 1
    # final stage: x0 scaled by fix, x1 by root*fix (dwthandler.h:166-189)
    rr = stage_roots[si]
    fix = (
        jnp.broadcast_to(jnp.asarray(fix_df[0], F32), (1, 1)),
        jnp.broadcast_to(jnp.asarray(fix_df[1], F32), (1, 1)),
    )
    root = ((jnp.asarray(rr[0]).reshape(1, 1), jnp.asarray(rr[1]).reshape(1, 1)),
            (jnp.asarray(rr[2]).reshape(1, 1), jnp.asarray(rr[3]).reshape(1, 1)))
    rfix = cdf_mul(root, ((fix[0], fix[1]), ((jnp.zeros_like(fix[0]), jnp.zeros_like(fix[1])))))
    v = [(p.reshape(1, 2, gap)) for p in (re[0], re[1], im[0], im[1])]
    a = ((v[0][:, 0], v[1][:, 0]), (v[2][:, 0], v[3][:, 0]))
    b = ((v[0][:, 1], v[1][:, 1]), (v[2][:, 1], v[3][:, 1]))
    s = cdf_add(a, b)
    x0 = ((df_mul(s[0], fix)), (df_mul(s[1], fix)))
    x1 = cdf_mul(cdf_sub(a, b), rfix)
    re = (
        jnp.stack([x0[0][0], x1[0][0]], axis=1).reshape(n),
        jnp.stack([x0[0][1], x1[0][1]], axis=1).reshape(n),
    )
    im = (
        jnp.stack([x0[1][0], x1[1][0]], axis=1).reshape(n),
        jnp.stack([x0[1][1], x1[1][1]], axis=1).reshape(n),
    )
    return re[0], re[1], im[0], im[1]


def fft_to_rev(x, stage_roots, n: int):
    """Forward FFT, natural order -> bit-reversed (decode direction)."""
    re = (x[0], x[1])
    im = (x[2], x[3])
    m = 1
    gap = n >> 1
    si = 0
    while m < n:
        rr = stage_roots[si]
        r = (
            (jnp.asarray(rr[0]).reshape(m, 1), jnp.asarray(rr[1]).reshape(m, 1)),
            (jnp.asarray(rr[2]).reshape(m, 1), jnp.asarray(rr[3]).reshape(m, 1)),
        )
        v = [(p.reshape(m, 2, gap)) for p in (re[0], re[1], im[0], im[1])]
        u = ((v[0][:, 0], v[1][:, 0]), (v[2][:, 0], v[3][:, 0]))
        w = cdf_mul(((v[0][:, 1], v[1][:, 1]), (v[2][:, 1], v[3][:, 1])), r)
        s = cdf_add(u, w)
        d = cdf_sub(u, w)
        re = (
            jnp.stack([s[0][0], d[0][0]], axis=1).reshape(n),
            jnp.stack([s[0][1], d[0][1]], axis=1).reshape(n),
        )
        im = (
            jnp.stack([s[1][0], d[1][0]], axis=1).reshape(n),
            jnp.stack([s[1][1], d[1][1]], axis=1).reshape(n),
        )
        si += 1
        m <<= 1
        gap >>= 1
    return re[0], re[1], im[0], im[1]


# ---------------------------------------------------------------------------
# decode head: (mant u64 lanes, exp, neg) -> df values (device)
# ---------------------------------------------------------------------------


def parts_to_df(mant, exp, neg, inv_scale_df):
    """Centered-float parts (crt_compose.centered_float_parts contract:
    value ~= (-1)^neg * mant * 2^(exp-64)) -> df value * inv_scale.

    The u64 mantissa's top 48 bits build the df via three exact 16-bit
    pieces and two error-free sums; the power-of-two scaling and the sign
    are exact, the inv_scale multiply is one df product.
    """
    lo_l, hi_l = mant
    hi_hi16 = (hi_l >> jnp.uint32(16)).astype(F32) * F32(2.0 ** 48)
    hi_lo16 = (hi_l & jnp.uint32(0xFFFF)).astype(F32) * F32(2.0 ** 32)
    lo_hi16 = (lo_l >> jnp.uint32(16)).astype(F32) * F32(2.0 ** 16)
    s, e = _two_sum(hi_hi16, hi_lo16)
    v = df_add((s, e), (lo_hi16, jnp.zeros_like(lo_hi16)))
    p = jnp.ldexp(jnp.ones_like(v[0]), exp - 64)  # exact powers of two
    v = (v[0] * p, v[1] * p)
    v = df_mul(v, (jnp.broadcast_to(jnp.asarray(inv_scale_df[0], F32), v[0].shape),
                   jnp.broadcast_to(jnp.asarray(inv_scale_df[1], F32), v[0].shape)))
    return (jnp.where(neg, -v[0], v[0]), jnp.where(neg, -v[1], v[1]))


# ---------------------------------------------------------------------------
# encode tail: df real values -> rounded integers mod each q_j (device)
# ---------------------------------------------------------------------------


def df_round_to_rns(re_df, qv, tables):
    """Round-half-away-from-zero the df values and reduce mod each q_j.

    ``re_df``: (hi, lo) f32 arrays, |value| < 2^48 (the df-exact integer
    range; callers fall back to the host wide tier above ~2^46 via the
    returned max).  Decomposition: ``h = round_nearest(hi)`` is integral
    and f32-exact; the residual ``r = (hi - h) + lo`` satisfies
    ``v = h + r`` with |r| small, so round-half-away(v) = h + l where
    ``l = sign(r) * floor(|r| + 0.5)`` (integral, |l| < 2^24).  h's u64
    lanes extract exactly (24-bit mantissa), l folds in modularly.

    Returns ((k, n) lane pair, max|v| scalar f32) — the max feeds the
    host-side "too large" / wide-tier checks with one scalar fetch.
    """
    from . import u64 as U

    hi, lo = re_df
    neg = (hi < 0) | ((hi == 0) & (lo < 0))
    h = jnp.round(hi)
    r = (hi - h) + lo
    # round the residual half-AWAY in v's sign direction: for v >= 0 the
    # halfway case goes up, for v < 0 it goes down (so |n| rounds away)
    l = jnp.where(neg, -jnp.floor(-r + F32(0.5)), jnp.floor(r + F32(0.5)))
    # work with |n| = |h + l|: under the sign flip a_h = -+h is >= 0 up to
    # the small part, and a_l keeps its (possibly negative) integer value
    a_h = jnp.where(neg, -h, h)
    a_l = jnp.where(neg, -l, l)

    # exact u64 lane extraction of the 24-bit-mantissa integral a_h
    hi32 = jnp.floor(a_h * F32(2.0 ** -32))
    rem = a_h - hi32 * F32(2.0 ** 32)
    lanes = (rem.astype(jnp.uint32), hi32.astype(jnp.uint32))  # (lo, hi)

    from .rns import _ratio

    _, rhi = _ratio(qv)
    q = tables.q
    red = U.barrett_reduce_64((lanes[0][None], lanes[1][None]), q, rhi)  # (k, n)
    # fold the small signed part in modularly (|a_l| < 2^24 < every q)
    pos = jnp.maximum(a_l, 0.0).astype(jnp.uint32)
    negv = jnp.maximum(-a_l, 0.0).astype(jnp.uint32)
    z = jnp.zeros_like(pos)
    red = U.add_mod(red, (pos[None], z[None]), q)
    red = U.sub_mod(red, (negv[None], z[None]), q)
    red_neg = U.neg_mod(red, q)
    out = (
        jnp.where(neg[None], red_neg[0], red[0]),
        jnp.where(neg[None], red_neg[1], red[1]),
    )
    max_abs = jnp.max(a_h)
    return out, max_abs
