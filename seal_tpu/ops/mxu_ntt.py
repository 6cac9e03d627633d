"""Four-step negacyclic NTT on the MXU (int8 digit-plane matmuls).

The length-n negacyclic NTT factors (``ntt_tables.build_mxu_tables``) as

    reshape (n1, n2) -> [n1-point negacyclic NTT over the strided axis,
    a single shared (k, n1, n1) matrix W] -> [per-element twiddle
    T[t1, c] = α_{t1}^c] -> [n2-point cyclic DFT, shared (k, n2, n2)
    matrix F with bit-reversed row order]

which is bit-identical to the Harvey natural→bit-reversed transform in
``ops/ntt.py`` (and to the reference's ``util/dwthandler.h:94-191``), but
moves all twiddle multiplications except the n middle ones onto the MXU:
operands are decomposed into 7-bit digit planes (int8), contracted with
``jax.lax.dot_general`` accumulating in int32, and recombined into a u128
that one Barrett reduction maps back to [0, q).  Digit-product sums stay
exact: plane products are < 2^14 and are summed over at most
``kchunk * nplanes`` terms with ``kchunk*(q-1)^2 < 2^128`` enforced at
table-build time (61-bit aux moduli get a split contraction).

This is the TPU-idiomatic answer to the reference's Intel HEXL NTT hook
(``util/ntt.cpp:149-223``): same seam, systolic-array backend.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..ntt_tables import MXUTables
from . import u64 as U

U64 = U.U64


def _reduce_to_q(x: U64, q: U64, two_q: U64) -> U64:
    """[0, 4q) -> [0, q) with two conditional subtractions."""
    x = U.select64(U.ge64(x, two_q), U.sub64(x, two_q), x)
    return U.select64(U.ge64(x, q), U.sub64(x, q), x)


def _to_planes(x: U64, nplanes: int) -> List[jnp.ndarray]:
    """u64 (< 2^63) -> list of int8 arrays of 7-bit digits (little-endian)."""
    lo, hi = x
    planes = []
    for p in range(nplanes):
        o = 7 * p
        if o + 7 <= 32:
            d = (lo >> o) & jnp.uint32(0x7F)
        elif o < 32:
            d = ((lo >> o) | (hi << (32 - o))) & jnp.uint32(0x7F)
        else:
            d = (hi >> (o - 32)) & jnp.uint32(0x7F)
        planes.append(d.astype(jnp.int8))
    return planes


def _recombine_barrett(planes: List[jnp.ndarray], bounds: List[int], t: MXUTables) -> U64:
    """Σ_s planes[s]·2^(7s) (exact, < 2^128 by bounds) mod q.

    ``planes[s]`` is int32 ≥ 0 with static bound ``bounds[s]``; the sum is
    accumulated as four u32 words with carry chains, then Barrett-reduced.
    """
    return _recombine_barrett_q(
        planes, bounds,
        (t.q_lo, t.q_hi),
        (t.ratio_lo_lo, t.ratio_lo_hi),
        (t.ratio_hi_lo, t.ratio_hi_hi),
    )


def _recombine_barrett_q(planes: List[jnp.ndarray], bounds: List[int],
                         q: U64, ratio_lo: U64, ratio_hi: U64) -> U64:
    """As _recombine_barrett with explicit broadcastable Barrett constants
    (shared with the MXU base-conversion contraction, ops/rns.py)."""
    shape = planes[0].shape
    w = [jnp.zeros(shape, dtype=jnp.uint32) for _ in range(4)]
    total = sum(b << (7 * s) for s, b in enumerate(bounds))
    assert total < (1 << 128), "digit-plane sum overflows u128; lower kchunk"
    for s, (c, bnd) in enumerate(zip(planes, bounds)):
        o = 7 * s
        wi, r = divmod(o, 32)
        cu = c.astype(jnp.uint32)
        # value = cu << r as a u64 (cu < 2^32, r < 32 -> fits)
        vl, vh = U.shl64((cu, jnp.zeros_like(cu)), r) if r else (cu, jnp.zeros_like(cu))
        # add (vl, vh) at word offset wi with carry propagation
        w[wi], cy = U._carry_add(w[wi], vl)
        if wi + 1 < 4:
            if (bnd << r) >> 32:
                s1, c1 = U._carry_add(w[wi + 1], vh)
                s1, c2 = U._carry_add(s1, cy)
                w[wi + 1] = s1
                cy = c1 + c2
            else:
                w[wi + 1], cy = U._carry_add(w[wi + 1], cy)
            if wi + 2 < 4:
                w[wi + 2], cy = U._carry_add(w[wi + 2], cy)
                if wi + 3 < 4:
                    w[wi + 3] = w[wi + 3] + cy
        else:
            # static bound must guarantee no spill past word 3
            assert (bnd << r) >> 32 == 0, "plane spills past 128 bits"
    return U.barrett_reduce_128(tuple(w), q, ratio_lo, ratio_hi)


def _matmul_mod(x: U64, b_planes, eq: str, kchunk: int, t: MXUTables) -> U64:
    """Modular matmul via digit-plane int8 contractions.

    ``x``: u64 data in [0, q).  ``b_planes``: int8 (P, k, M, K) constant.
    ``eq``: einsum equation mapping (b_plane, x_plane) -> int32 partials,
    e.g. ``'ktr,...krc->...ktc'`` (contraction over the shared axis).
    ``kchunk``: contraction split so each chunk's recombined sum < 2^128.
    """
    P = t.nplanes
    K = b_planes.shape[-1]
    xp = _to_planes(x, P)
    # per-plane digit bounds: all planes are <= 127 except the top one,
    # whose bound comes from the largest modulus (values are < q)
    q_np = (t.q_hi.astype(object) << 32) | t.q_lo.astype(object)
    max_q = int(q_np.max())
    db = [127] * (P - 1) + [(max_q - 1) >> (7 * (P - 1))]
    # locate the contracted axis label (slices the data side per chunk; the
    # constant side always has it as its last axis)
    lhs, rhs_out = eq.split(",", 1)
    rhs, _ = rhs_out.split("->")
    shared = [a for a in lhs if a in rhs and a != "k"]
    assert len(shared) == 1 and lhs[-1] == shared[0]
    nchunks = max(1, K // kchunk)

    # All P constant planes ride ONE dot per data plane: 'p' becomes a free
    # lhs dimension, turning P^2 small (M=128) matmuls into P tall (M=128*P)
    # ones — fewer dispatches, better MXU occupancy (the n>=16384 lever).
    lhs_out = eq.split("->")
    out_labels = lhs_out[1]
    assert out_labels.startswith("...")
    eq_stacked = "p" + lhs + "," + rhs + "->..." + "p" + out_labels[3:]

    acc = None
    for ch in range(nchunks):
        sl = slice(ch * kchunk, (ch + 1) * kchunk) if nchunks > 1 else slice(None)
        bc = b_planes[..., sl]
        planes_out: List[jnp.ndarray] = [None] * (2 * P - 1)  # type: ignore
        bounds: List[int] = [0] * (2 * P - 1)
        for i in range(P):
            xi = xp[i]
            if nchunks > 1:
                pos = rhs.index(shared[0]) - len(rhs)
                idx = [slice(None)] * xi.ndim
                idx[pos] = sl
                xi = xi[tuple(idx)]
            part_i = jnp.einsum(
                eq_stacked, bc, xi, preferred_element_type=jnp.int32
            )  # (..., P, <3 out labels>)
            for j in range(P):
                pij = part_i[..., j, :, :, :]
                s = i + j
                planes_out[s] = pij if planes_out[s] is None else planes_out[s] + pij
                bounds[s] += db[i] * db[j] * min(kchunk, K)
        part = _recombine_barrett(planes_out, bounds, t)
        acc = part if acc is None else U.add_mod(acc, part, (t.q_lo, t.q_hi))
    return acc  # type: ignore


def mxu_ntt_forward(x: U64, t: MXUTables) -> U64:
    """Forward negacyclic NTT; input [0, 4q), output [0, q).

    Bit-identical to ``ops.ntt.ntt_forward(x, lt, lazy=False)``.
    """
    lo, hi = x
    *lead, k, n = lo.shape
    n1, n2 = t.n1, t.n2
    assert n1 * n2 == n
    q = (t.q_lo, t.q_hi)
    two_q = (t.two_q_lo, t.two_q_hi)

    d = (lo.reshape(*lead, k, n1, n2), hi.reshape(*lead, k, n1, n2))
    d = _reduce_to_q(d, q, two_q)
    # stage A: h[t1, c] = Σ_r W[t1, r] d[r, c]
    h = _matmul_mod(d, t.w_planes, "ktr,...krc->...ktc", t.kchunk_a, t)
    # twiddle: h *= α_{t1}^c
    h = U.mul_mod_shoup(
        h, (t.t_op_lo, t.t_op_hi), (t.t_qt_lo, t.t_qt_hi), q
    )
    # stage B: out[t1, t2] = Σ_c F[t2, c] h[t1, c]
    o = _matmul_mod(h, t.f_planes, "kuc,...ktc->...ktu", t.kchunk_b, t)
    return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)


def mxu_ntt_inverse(x: U64, t: MXUTables) -> U64:
    """Inverse negacyclic NTT (1/n folded); input [0, 2q), output [0, q).

    Bit-identical to ``ops.ntt.ntt_inverse(x, lt, lazy=False)``.
    """
    lo, hi = x
    *lead, k, n = lo.shape
    n1, n2 = t.n1, t.n2
    q = (t.q_lo, t.q_hi)
    two_q = (t.two_q_lo, t.two_q_hi)

    d = (lo.reshape(*lead, k, n1, n2), hi.reshape(*lead, k, n1, n2))
    d = U.select64(U.ge64(d, q), U.sub64(d, q), d)
    # inverse stage B: ht[t1, c] = Σ_t2 Finv[c, t2] o[t1, t2]   (1/n2 folded)
    ht = _matmul_mod(d, t.finv_planes, "kcu,...ktu->...ktc", t.kchunk_b, t)
    # inverse twiddle
    ht = U.mul_mod_shoup(
        ht, (t.ti_op_lo, t.ti_op_hi), (t.ti_qt_lo, t.ti_qt_hi), q
    )
    # inverse stage A: d[r, c] = Σ_t1 Winv[r, t1] ht[t1, c]   (1/n1 folded)
    o = _matmul_mod(ht, t.winv_planes, "krt,...ktc->...krc", t.kchunk_a, t)
    return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)
