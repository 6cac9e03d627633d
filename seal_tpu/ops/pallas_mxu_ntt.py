"""Pallas-fused four-step NTT stages: digit-plane matmul + recombine +
Barrett in ONE kernel, partial planes never touching HBM.

The XLA einsum path (``ops/mxu_ntt.py``) materializes up to 2P-1 int32
partial-digit planes per stage in HBM (~17x the data size at P=9 planes),
which caps the NTT at ~25-30 % of the MXU speed-of-light bound.  Here each
grid step loads one limb's data tile into VMEM, runs the P data-plane x
P-constant-plane int8 ``dot_general`` contractions on the MXU, shift-adds
the int32 partials into a u128 accumulator in VMEM, Barrett-reduces, and
(stage A only) applies the per-element twiddle — one HBM read and one HBM
write per stage, like the reference's in-cache butterfly (dwthandler.h).

Bit-identical to ``mxu_ntt`` by construction: same plane decomposition,
same accumulation bounds, same Barrett tail (the helpers are shared).
Interpret mode makes it exact on CPU for tests.

Selected with SEAL_TPU_NTT=pallas (the HEXL-style backend seam,
util/ntt.cpp:149-223).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt_tables import MXUTables
from . import u64 as U
from .mxu_ntt import _recombine_barrett, _reduce_to_q, _to_planes

U64 = U.U64


class _TileTables:
    """Per-kernel-instance view of MXUTables with (1,1)-shaped constants
    replaced by scalars broadcastable over a (rows, cols) tile."""

    def __init__(self, t: MXUTables, j_scalars):
        (self.q_lo, self.q_hi, self.two_q_lo, self.two_q_hi,
         self.ratio_lo_lo, self.ratio_lo_hi, self.ratio_hi_lo, self.ratio_hi_hi) = j_scalars
        self.nplanes = t.nplanes


def _contract_planes(xp: List[jnp.ndarray], b_planes_ref, P: int, K: int,
                     kchunk: int, db: List[int], tt, transpose_const: bool):
    """Σ_chunks Barrett(Σ_{i,j} dot(const_plane_j, data_plane_i) · 2^{7(i+j)}).

    ``b_planes_ref``: (P, M, K) int8 VMEM ref (constant matrix planes).
    ``xp``: list of P (K, T) int8 data planes.
    Returns u64 pair (M, T) in [0, q).
    """
    nchunks = max(1, K // kchunk)
    acc_out = None
    for ch in range(nchunks):
        sl = slice(ch * kchunk, (ch + 1) * kchunk) if nchunks > 1 else slice(None)
        planes_out = [None] * (2 * P - 1)
        bounds = [0] * (2 * P - 1)
        for i in range(P):
            xi = xp[i][sl] if nchunks > 1 else xp[i]
            for j in range(P):
                bj = b_planes_ref[j, :, sl] if nchunks > 1 else b_planes_ref[j]
                if transpose_const:
                    # o[m, t] = Σ_k b[k, m] x[k, t]
                    pij = jax.lax.dot_general(
                        bj, xi, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                else:
                    # o[m, t] = Σ_k b[m, k] x[k, t]
                    pij = jax.lax.dot_general(
                        bj, xi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                s = i + j
                planes_out[s] = pij if planes_out[s] is None else planes_out[s] + pij
                bounds[s] += db[i] * db[j] * min(kchunk, K)
        part = _recombine_barrett(planes_out, bounds, tt)
        acc_out = part if acc_out is None else U.add_mod(acc_out, part, (tt.q_lo, tt.q_hi))
    return acc_out


def _stage_kernel(P, K, kchunk, db, twiddle, transpose_const,
                  lo_ref, hi_ref, b_ref, top_lo_ref, top_hi_ref,
                  tqt_lo_ref, tqt_hi_ref, scal_ref,
                  out_lo_ref, out_hi_ref):
    """One (poly, limb) x whole column tile: modular matmul (+ twiddle)."""
    j = pl.program_id(1)  # limb index (poly axis is grid dim 0)
    tt = _TileTables.__new__(_TileTables)
    (tt.q_lo, tt.q_hi, tt.two_q_lo, tt.two_q_hi,
     tt.ratio_lo_lo, tt.ratio_lo_hi, tt.ratio_hi_lo, tt.ratio_hi_hi) = [
        scal_ref[j, i] for i in range(8)]  # whole (k, 8) array in SMEM
    tt.nplanes = P

    x = (lo_ref[0, 0], hi_ref[0, 0])               # (K, T)
    xp = _to_planes(x, P)
    o = _contract_planes(xp, b_ref[0], P, K, kchunk, db, tt, transpose_const)
    if twiddle:
        o = U.mul_mod_shoup(
            o, (top_lo_ref[0], top_hi_ref[0]), (tqt_lo_ref[0], tqt_hi_ref[0]),
            (tt.q_lo, tt.q_hi))
    out_lo_ref[0, 0] = o[0]
    out_hi_ref[0, 0] = o[1]


def _run_stage(x: U64, b_planes, t: MXUTables, kchunk: int, twiddle,
               transpose_const: bool, interpret: bool) -> U64:
    """x: (L, k, K, n_cols) u64; b_planes: (P, k, M, K) int8.

    Grid over (poly L, limb k); each step does one (M, n_cols) tile.
    Twiddle (t_op, t_qt) tables are (k, M, n_cols) or None.
    """
    lo, hi = x
    L, k, K, ncols = lo.shape
    P = t.nplanes
    M = b_planes.shape[2]

    import numpy as np

    # table leaves may be device arrays; constants here are host-side
    q_lo_np = np.asarray(t.q_lo).astype(object)
    q_hi_np = np.asarray(t.q_hi).astype(object)
    max_q = int(((q_hi_np << 32) | q_lo_np).max())
    db = [127] * (P - 1) + [(max_q - 1) >> (7 * (P - 1))]

    scal = np.stack([
        np.asarray(a).reshape(k).astype(np.uint32)
        for a in (t.q_lo, t.q_hi, t.two_q_lo, t.two_q_hi,
                  t.ratio_lo_lo, t.ratio_lo_hi, t.ratio_hi_lo, t.ratio_hi_hi)
    ], axis=1)  # (k, 8)

    data_spec = pl.BlockSpec((1, 1, K, ncols), lambda l, j: (l, j, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, M, ncols), lambda l, j: (l, j, 0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, P, M, K), lambda l, j: (j, 0, 0, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, M, ncols), lambda l, j: (j, 0, 0), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # whole (k, 8) array

    if twiddle is None:
        z = jnp.zeros((k, M, ncols), dtype=jnp.uint32)
        top_lo = top_hi = tqt_lo = tqt_hi = z
        do_tw = False
    else:
        top_lo, top_hi, tqt_lo, tqt_hi = twiddle
        do_tw = True

    kern = functools.partial(_stage_kernel, P, K, kchunk, db, do_tw, transpose_const)
    out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((L, k, M, ncols), jnp.uint32),
                   jax.ShapeDtypeStruct((L, k, M, ncols), jnp.uint32)),
        grid=(L, k),
        in_specs=[data_spec, data_spec, b_spec, tw_spec, tw_spec, tw_spec, tw_spec, scal_spec],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(lo, hi, jnp.asarray(b_planes).transpose(1, 0, 2, 3),
      jnp.asarray(top_lo), jnp.asarray(top_hi), jnp.asarray(tqt_lo), jnp.asarray(tqt_hi),
      jnp.asarray(scal))
    return out


# ----------------------------------------------------------------------
# Fully-fused single-kernel NTT: stage A + twiddle + stage B in ONE
# pallas_call.  The inter-stage (n1, n2) tile lives entirely in VMEM —
# no HBM round trip, no transposes (the second stage's constant matrix is
# pre-transposed on the host so both stages are direct MXU dots), and one
# dispatch instead of two.  Used for n1 <= 256 (n <= 32768), where all
# constant planes + partials fit VMEM comfortably; larger n falls back to
# the two-call staged path above.
# ----------------------------------------------------------------------

_FUSED_MAX_N1 = 256


def _contract_cl(b_ref, xp, P, K, kchunk, db, tt):
    """Const-left modular matmul: out[m, t] = Σ_k b[m, k] x[k, t] mod q.

    ``b_ref``: (P, M, K) int8 planes; ``xp``: list of P (K, T) int8 planes.
    """
    nchunks = max(1, K // kchunk)
    acc_out = None
    for ch in range(nchunks):
        sl = slice(ch * kchunk, (ch + 1) * kchunk) if nchunks > 1 else slice(None)
        planes_out = [None] * (2 * P - 1)
        bounds = [0] * (2 * P - 1)
        for i in range(P):
            xi = xp[i][sl] if nchunks > 1 else xp[i]
            for j in range(P):
                bj = b_ref[j, :, sl] if nchunks > 1 else b_ref[j]
                pij = jax.lax.dot_general(
                    bj, xi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = i + j
                planes_out[s] = pij if planes_out[s] is None else planes_out[s] + pij
                bounds[s] += db[i] * db[j] * min(kchunk, K)
        part = _recombine_barrett(planes_out, bounds, tt)
        acc_out = part if acc_out is None else U.add_mod(acc_out, part, (tt.q_lo, tt.q_hi))
    return acc_out


def _contract_cr(xp, b_ref, P, K, kchunk, db, tt):
    """Const-right modular matmul: out[t, m] = Σ_k x[t, k] b[k, m] mod q.

    ``xp``: list of P (T, K) int8 planes; ``b_ref``: (P, K, M) int8 planes.
    """
    nchunks = max(1, K // kchunk)
    acc_out = None
    for ch in range(nchunks):
        sl = slice(ch * kchunk, (ch + 1) * kchunk) if nchunks > 1 else slice(None)
        planes_out = [None] * (2 * P - 1)
        bounds = [0] * (2 * P - 1)
        for i in range(P):
            xi = xp[i][:, sl] if nchunks > 1 else xp[i]
            for j in range(P):
                bj = b_ref[j, sl, :] if nchunks > 1 else b_ref[j]
                pij = jax.lax.dot_general(
                    xi, bj, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = i + j
                planes_out[s] = pij if planes_out[s] is None else planes_out[s] + pij
                bounds[s] += db[i] * db[j] * min(kchunk, K)
        part = _recombine_barrett(planes_out, bounds, tt)
        acc_out = part if acc_out is None else U.add_mod(acc_out, part, (tt.q_lo, tt.q_hi))
    return acc_out


def _fused_kernel(P, n1, n2, kchunk_a, kchunk_b, db, forward,
                  lo_ref, hi_ref, ba_ref, bb_ref,
                  top_lo_ref, top_hi_ref, tqt_lo_ref, tqt_hi_ref, scal_ref,
                  out_lo_ref, out_hi_ref):
    """One (poly, limb) tile: full four-step NTT, inter-stage in VMEM.

    Forward: h = W @ x (const-left), h *= twiddle, out = h @ F^T
    (const-right).  Inverse: ht = d @ Finv^T (const-right), ht *= inverse
    twiddle, out = Winv @ ht (const-left).
    """
    j = pl.program_id(1)
    tt = _TileTables.__new__(_TileTables)
    (tt.q_lo, tt.q_hi, tt.two_q_lo, tt.two_q_hi,
     tt.ratio_lo_lo, tt.ratio_lo_hi, tt.ratio_hi_lo, tt.ratio_hi_hi) = [
        scal_ref[j, i] for i in range(8)]
    tt.nplanes = P
    q = (tt.q_lo, tt.q_hi)
    two_q = (tt.two_q_lo, tt.two_q_hi)

    x = (lo_ref[0, 0], hi_ref[0, 0])               # (n1, n2)
    if forward:
        x = _reduce_to_q(x, q, two_q)              # [0, 4q) -> [0, q)
        xp = _to_planes(x, P)
        h = _contract_cl(ba_ref[0], xp, P, n1, kchunk_a, db, tt)
        h = U.mul_mod_shoup(
            h, (top_lo_ref[0], top_hi_ref[0]), (tqt_lo_ref[0], tqt_hi_ref[0]), q)
        hp = _to_planes(h, P)
        o = _contract_cr(hp, bb_ref[0], P, n2, kchunk_b, db, tt)
    else:
        x = U.select64(U.ge64(x, q), U.sub64(x, q), x)  # [0, 2q) -> [0, q)
        xp = _to_planes(x, P)
        ht = _contract_cr(xp, ba_ref[0], P, n2, kchunk_b, db, tt)
        ht = U.mul_mod_shoup(
            ht, (top_lo_ref[0], top_hi_ref[0]), (tqt_lo_ref[0], tqt_hi_ref[0]), q)
        htp = _to_planes(ht, P)
        o = _contract_cl(bb_ref[0], htp, P, n1, kchunk_a, db, tt)
    out_lo_ref[0, 0] = o[0]
    out_hi_ref[0, 0] = o[1]


def _host_consts(t: MXUTables, k: int):
    import numpy as np

    q_lo_np = np.asarray(t.q_lo).astype(object)
    q_hi_np = np.asarray(t.q_hi).astype(object)
    max_q = int(((q_hi_np << 32) | q_lo_np).max())
    P = t.nplanes
    db = [127] * (P - 1) + [(max_q - 1) >> (7 * (P - 1))]
    scal = np.stack([
        np.asarray(a).reshape(k).astype(np.uint32)
        for a in (t.q_lo, t.q_hi, t.two_q_lo, t.two_q_hi,
                  t.ratio_lo_lo, t.ratio_lo_hi, t.ratio_hi_lo, t.ratio_hi_hi)
    ], axis=1)  # (k, 8)
    return db, scal


def _run_fused(x: U64, t: MXUTables, forward: bool, interpret: bool) -> U64:
    """x: (L, k, n1, n2) u64 -> same-shape u64 in [0, q)."""
    lo, hi = x
    L, k, n1, n2 = lo.shape
    P = t.nplanes
    db, scal = _host_consts(t, k)

    if forward:
        ba = t.w_planes                             # (P, k, n1, n1) const-left
        bb = t.f_planes.transpose(0, 1, 3, 2)       # F[t2,c] -> (P, k, c, t2)
        tw = (t.t_op_lo, t.t_op_hi, t.t_qt_lo, t.t_qt_hi)
        Ma, Ka = n1, n1
        Mb, Kb = n2, n2
    else:
        ba = t.finv_planes.transpose(0, 1, 3, 2)    # Finv[c,t2] -> (P, k, t2, c)
        bb = t.winv_planes                          # (P, k, n1, n1) const-left
        tw = (t.ti_op_lo, t.ti_op_hi, t.ti_qt_lo, t.ti_qt_hi)
        Ma, Ka = n2, n2
        Mb, Kb = n1, n1

    data_spec = pl.BlockSpec((1, 1, n1, n2), lambda l, j: (l, j, 0, 0), memory_space=pltpu.VMEM)
    ba_spec = pl.BlockSpec((1, P, Ma, Ka), lambda l, j: (j, 0, 0, 0), memory_space=pltpu.VMEM)
    bb_spec = pl.BlockSpec((1, P, Mb, Kb), lambda l, j: (j, 0, 0, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, n1, n2), lambda l, j: (j, 0, 0), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = functools.partial(
        _fused_kernel, P, n1, n2, t.kchunk_a, t.kchunk_b, db, forward)
    out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((L, k, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((L, k, n1, n2), jnp.uint32)),
        grid=(L, k),
        in_specs=[data_spec, data_spec, ba_spec, bb_spec,
                  tw_spec, tw_spec, tw_spec, tw_spec, scal_spec],
        out_specs=(data_spec, data_spec),
        interpret=interpret,
    )(lo, hi,
      jnp.asarray(ba).transpose(1, 0, 2, 3), jnp.asarray(bb).transpose(1, 0, 2, 3),
      jnp.asarray(tw[0]), jnp.asarray(tw[1]), jnp.asarray(tw[2]), jnp.asarray(tw[3]),
      jnp.asarray(scal))
    return out


def pallas_ntt_forward(x: U64, t: MXUTables, interpret: bool = False) -> U64:
    """Forward negacyclic NTT, bit-identical to mxu_ntt_forward.

    Accepts (k, n) or leading poly axes (..., k, n) — leading axes ride the
    kernel grid's first dimension.  For n1 <= 256 the whole transform is
    one fused kernel; larger n uses the two-call staged path.
    """
    lo, hi = x
    *lead, k, n = lo.shape
    L = 1
    for d_ in lead:
        L *= d_
    n1, n2 = t.n1, t.n2
    q = (t.q_lo, t.q_hi)
    two_q = (t.two_q_lo, t.two_q_hi)

    d = (lo.reshape(L, k, n1, n2), hi.reshape(L, k, n1, n2))
    if n1 <= _FUSED_MAX_N1:
        o = _run_fused(d, t, forward=True, interpret=interpret)
        return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)

    d = _reduce_to_q(d, q, two_q)
    # stage A + twiddle fused: h[t1, c] = (Σ_r W[t1, r] d[r, c]) * α_{t1}^c
    h = _run_stage(d, t.w_planes, t, t.kchunk_a,
                   (t.t_op_lo, t.t_op_hi, t.t_qt_lo, t.t_qt_hi),
                   transpose_const=False, interpret=interpret)
    # stage B: out[t1, t2] = Σ_c F[t2, c] h[t1, c]  — contract over the
    # column axis: transpose tiles so the contraction is the leading axis
    ht = (h[0].transpose(0, 1, 3, 2), h[1].transpose(0, 1, 3, 2))  # (L, k, c, t)
    o = _run_stage(ht, t.f_planes, t, t.kchunk_b, None,
                   transpose_const=False, interpret=interpret)  # (L, k, u, t)
    o = (o[0].transpose(0, 1, 3, 2), o[1].transpose(0, 1, 3, 2))
    return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)


def pallas_ntt_inverse(x: U64, t: MXUTables, interpret: bool = False) -> U64:
    """Inverse negacyclic NTT (1/n folded), bit-identical to mxu_ntt_inverse."""
    lo, hi = x
    *lead, k, n = lo.shape
    L = 1
    for d_ in lead:
        L *= d_
    n1, n2 = t.n1, t.n2
    q = (t.q_lo, t.q_hi)

    d = (lo.reshape(L, k, n1, n2), hi.reshape(L, k, n1, n2))
    if n1 <= _FUSED_MAX_N1:
        o = _run_fused(d, t, forward=False, interpret=interpret)
        return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)

    d = U.select64(U.ge64(d, q), U.sub64(d, q), d)
    # inverse stage B: ht[t1, c] = Σ_t2 Finv[c, t2] o[t1, t2] — Finv is
    # (k, c, t2), contract over t2 (last axis of both) => transpose data
    dt = (d[0].transpose(0, 1, 3, 2), d[1].transpose(0, 1, 3, 2))  # (L, k, t2, t1)
    ht = _run_stage(dt, t.finv_planes, t, t.kchunk_b, None,
                    transpose_const=False, interpret=interpret)  # (L, k, c, t1)
    ht = (ht[0].transpose(0, 1, 3, 2), ht[1].transpose(0, 1, 3, 2))  # (L, k, t1, c)
    # inverse twiddle then inverse stage A: d[r, c] = Σ_t1 Winv[r, t1] ht[t1, c]
    ht = U.mul_mod_shoup(ht, (t.ti_op_lo, t.ti_op_hi), (t.ti_qt_lo, t.ti_qt_hi), q)
    o = _run_stage(ht, t.winv_planes, t, t.kchunk_a, None,
                   transpose_const=False, interpret=interpret)
    return o[0].reshape(*lead, k, n), o[1].reshape(*lead, k, n)
