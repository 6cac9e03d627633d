"""Device CRT compose -> centered floating parts (CKKS decode tail).

The reference's decode composes each coefficient to multiprecision,
center-lifts mod Q, and converts to double with a per-64-bit-word ladder
(``ckks.h:683-787``) — O(k^2) scalar host work per coefficient.  Here the
compose runs on device as ONE plane-fused int8 matmul (the same 7-bit
digit machinery as ops/mxu_ntt.py / the FBC): contraction of the k
scaled residues with the punctured-product digit matrix, exact u32-word
recombination, reduction below Q, centering, and normalization to a
(64-bit mantissa, exponent, sign) triple — so only 13 bytes per
coefficient cross the device->host link instead of 8k.

The mantissa holds >= 53 significant bits, so the final f64 value agrees
with the reference's double ladder to within an ulp or two (CKKS decode
is tolerance-tested; the bit-exact host ladder remains available via
SEAL_TPU_DEVICE_COMPOSE=0).

No data-dependent gathers anywhere: the top-word scan and mantissa
normalization are select-chains and elementwise variable shifts — the
operations TPUs are good at.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import u64 as U

U64 = U.U64


def _compose_consts(base):
    """Cached device-compose constants for a HostRNSBase."""
    cache = getattr(base, "_dev_compose", None)
    if cache is not None:
        return cache
    k = base.size
    max_in = max(base.values)
    p_d = max(1, -(-(max_in - 1).bit_length() // 7))
    qbits = base.base_prod.bit_length()
    p_q = max(1, -(-qbits // 7))
    p_s = p_d + p_q - 1
    # B[s, (a, i)] = 7-bit digit (s - a) of punctured_prod_i
    big = np.zeros((p_s, p_d, k), dtype=np.int8)
    for i, p in enumerate(base.punctured_prod):
        for s in range(p_s):
            for a in range(p_d):
                b = s - a
                if 0 <= b < p_q:
                    big[s, a, i] = (p >> (7 * b)) & 0x7F
    big = big.reshape(p_s, p_d * k)
    # v = sum_i scaled_i * P_i < k * Q
    vbits = qbits + max(1, k).bit_length()
    nw = (vbits + 7 * 1 + 31) // 32 + 2  # u32 words with slack

    def words_of(x, count):
        return [(x >> (32 * w)) & 0xFFFFFFFF for w in range(count)]

    q_words = words_of(base.base_prod, nw)
    half_words = words_of((base.base_prod + 1) // 2, nw)
    # f32 estimate: m ~= floor(v / Q) read from the two words straddling
    # v's actual top bit (padding words would blow the truncation error)
    wt = max(2, (vbits + 31) // 32)
    c_est = float((1 << (32 * (wt - 2))) / base.base_prod)
    cache = (big, p_d, p_s, nw, tuple(q_words), tuple(half_words), c_est, wt, k)
    base._dev_compose = cache
    return cache


def _mw_sub_borrow(words, sub_words):
    """Multiword a - b with borrow chain; returns (diff words, borrow)."""
    out = []
    borrow = jnp.zeros_like(words[0])
    for w in range(len(words)):
        bw = sub_words[w] if w < len(sub_words) else None
        t = words[w] - borrow
        b1 = (words[w] < borrow).astype(jnp.uint32)
        if bw is not None:
            b2 = (t < bw).astype(jnp.uint32)
            t = t - bw
        else:
            b2 = jnp.zeros_like(borrow)
        out.append(t)
        borrow = b1 + b2
    return out, borrow


def _mw_const(value_words, like):
    return [jnp.full_like(like, w) for w in value_words]


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of uint32 lanes (32 for x == 0)."""
    n = jnp.full_like(x, 32)
    shift = jnp.where(x > 0xFFFF, 16, 0)
    r = jnp.where(x > 0xFFFF, 16, 0)
    x = x >> shift
    for b, t in ((8, 0xFF), (4, 0xF), (2, 0x3), (1, 0x1)):
        s = jnp.where(x > t, b, 0)
        x = x >> s
        r = r + s
    return jnp.where(x > 0, 31 - r, n).astype(jnp.int32)


def centered_float_parts(scaled: U64, base) -> Tuple[U64, jnp.ndarray, jnp.ndarray]:
    """(..., k, n) pre-scaled residues -> (mant u64, exp i32, neg bool).

    ``scaled[i] = residue_i * (Q/q_i)^{-1} mod q_i``; the represented
    coefficient is ``v = sum_i scaled_i * (Q/q_i) mod Q`` center-lifted to
    ``(-Q/2, Q/2]``.  Output satisfies value ~= (-1)^neg * mant * 2^(exp-64)
    with full 64-bit mantissa precision (exact when the value has <= 64
    significant bits).
    """
    from .mxu_ntt import _to_planes

    big, p_d, p_s, nw, q_words, half_words, c_est, wt, k = _compose_consts(base)
    xp = _to_planes(scaled, p_d)  # list of int8 (..., k, n)
    x_all = jnp.concatenate(xp, axis=-2)  # (..., p_d * k, n)
    lead = x_all.shape[:-2]
    n = x_all.shape[-1]
    from .rns import int8_plane_dot

    planes = int8_plane_dot("RA,...An->...Rn", big, x_all)
    # (..., p_s, n), each < k * p_d * 127^2 < 2^25

    # exact recombination into nw u32 words (plane s sits at bit 7s)
    like = planes[..., 0, :].astype(jnp.uint32)
    acc = [(jnp.zeros_like(like), jnp.zeros_like(like)) for _ in range(nw)]
    for s in range(p_s):
        w, r = divmod(7 * s, 32)
        if w >= nw:
            break
        p = planes[..., s, :].astype(jnp.uint32)
        v = U.shl64((p, jnp.zeros_like(p)), r) if r else (p, jnp.zeros_like(p))
        acc[w] = U.add64(acc[w], v)
        # acc words accumulate < 2^57 before normalization (<= 5 planes of
        # < 2^25 shifted by < 32)
    # carry-normalize: words become true u32 payloads
    words = []
    carry = (jnp.zeros_like(like), jnp.zeros_like(like))
    for w in range(nw):
        t = U.add64(acc[w], carry)
        words.append(t[0])
        carry = (t[1], jnp.zeros_like(like))
    # v < k * Q fits nw words by construction (carry out is zero)

    # subtract floor-estimate multiples of Q (m < k <= 64), then <= 3 exact
    # conditional subtractions
    v_top = words[wt - 1].astype(jnp.float32) * np.float32(4294967296.0) + words[
        wt - 2
    ].astype(jnp.float32)
    m = jnp.floor(v_top * np.float32(c_est)).astype(jnp.int32) - 2
    m = jnp.maximum(m, 0).astype(jnp.uint32)
    # m * Q as multiword (sequential carry chain over static q words)
    sub = []
    carry = jnp.zeros_like(like)
    for w in range(nw):
        lo, hi = U.mul32_wide(m, jnp.full_like(like, q_words[w]))
        s0, c0 = U._carry_add(lo, carry)
        sub.append(s0)
        carry = hi + c0
    words, _ = _mw_sub_borrow(words, sub)
    for _ in range(4):
        qc = _mw_const(q_words, like)
        diff, borrow = _mw_sub_borrow(words, qc)
        take = borrow == 0
        words = [jnp.where(take, d, w_) for d, w_ in zip(diff, words)]

    # center: v >= (Q+1)/2 -> value is negative, magnitude Q - v
    _, borrow = _mw_sub_borrow(words, _mw_const(half_words, like))
    is_upper = borrow == 0
    qmv, _ = _mw_sub_borrow(_mw_const(q_words, like), words)
    mag = [jnp.where(is_upper, a, b) for a, b in zip(qmv, words)]

    # top-word scan (select chain, no gathers): find highest nonzero word
    found = jnp.zeros_like(is_upper)
    idx = jnp.zeros_like(like, dtype=jnp.int32)
    w2 = jnp.zeros_like(like)
    w1 = jnp.zeros_like(like)
    w0 = jnp.zeros_like(like)
    for w in range(nw - 1, -1, -1):
        cond = (~found) & (mag[w] != 0)
        idx = jnp.where(cond, w, idx)
        w2 = jnp.where(cond, mag[w], w2)
        w1 = jnp.where(cond, mag[w - 1] if w >= 1 else jnp.zeros_like(like), w1)
        w0 = jnp.where(cond, mag[w - 2] if w >= 2 else jnp.zeros_like(like), w0)
        found = found | cond

    # normalize the 96-bit (w2, w1, w0) window so mant's top bit is set
    sh = _clz32(w2).astype(jnp.uint32)  # in [0, 32); w2 != 0 when found
    sh = jnp.where(found, sh, 0).astype(jnp.uint32)
    mant_hi = jnp.where(
        sh > 0, (w2 << sh) | (w1 >> (32 - jnp.maximum(sh, 1))), w2
    )
    mant_lo = jnp.where(
        sh > 0, (w1 << sh) | (w0 >> (32 - jnp.maximum(sh, 1))), w1
    )
    # value = mant * 2^(exp - 64), mant = mant_hi:mant_lo
    exp = 32 * (idx + 1) - sh.astype(jnp.int32)
    exp = jnp.where(found, exp - 64, 0)
    mant = (mant_lo, mant_hi)
    return mant, exp + 64, is_upper & found


def parts_to_float(mant_np, exp_np, neg_np, inv_scale: float) -> np.ndarray:
    """Host: (mant u64, exp, neg) -> float64 * inv_scale (vectorized)."""
    f = mant_np.astype(np.float64)
    out = np.ldexp(f, exp_np.astype(np.int64) - 64) * inv_scale
    return np.where(neg_np, -out, out)
