"""Pallas-fused key-switch decompose+NTT+contract: the hot kernel.

The key-switch inner loop (``switch_key_inplace``, reference
evaluator.cpp:2661-2755) takes one coefficient-form RNS polynomial
``t_c`` (D limbs), reduces every limb mod each of the Rn = D+1 output
moduli, forward-NTTs the (D, Rn) grid of polynomials, multiplies each by
the matching key column, and accumulates over D with 128-bit lazy
accumulation.  Done stage-by-stage that materializes the (D, Rn, n)
``t_operand`` tensor and a (2, Rn, n) u128 accumulator in HBM; here ONE
pallas kernel walks grid (i=output limb, j=decomp limb) with j innermost,
computes each (j, i) transform tile in VMEM (same fused four-step as
``pallas_mxu_ntt``), multiplies by the key tile, and accumulates into a
VMEM u128 scratch that is Barrett-reduced and written out once per i.

Two structural wins over the staged path:

* the (D, Rn, n) NTT intermediate and the u128 accumulator never touch
  HBM — per output limb the kernel reads D data tiles + 2D key tiles and
  writes one result tile;
* the diagonal ``i == j`` transform is skipped entirely: for NTT-form
  schemes the decomposed limb j reduced mod q_j IS the original NTT-form
  target limb (the reference's ckks fast path, evaluator.cpp:2686-2692),
  so the kernel substitutes the NTT-form input and saves D of the D*Rn
  transforms.

Bit-identical to ``evaluator._switch_key_body``'s staged formulation by
construction (shared digit-plane helpers, same accumulation bounds, same
Barrett tail); ``interpret=True`` runs it exactly on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt_tables import MXUTables
from . import u64 as U
from .mxu_ntt import _to_planes
from .pallas_mxu_ntt import _TileTables, _contract_cl, _contract_cr, _host_consts

U64 = U.U64

# VMEM budget guard: same fused-kernel envelope as pallas_mxu_ntt.
_FUSED_MAX_N1 = 256


def fits_fused(t: "MXUTables") -> bool:
    """Whether the fused kernel's per-step VMEM footprint fits the 16 MB
    scoped budget: at n1=512 (n >= 65536) the constant planes + tiles +
    u128 scratch reach ~24 MB, so those sizes take the staged path."""
    return t.n1 <= _FUSED_MAX_N1
# Lazy-accumulation window: 64 summands of q^2 stay below 2^128 for
# q < 2^61 (the defines.h:66 rationale).
_ACC_WINDOW = 64


def _sk_kernel(P, n1, n2, kchunk_a, kchunk_b, db, D, has_diag,
               tc_lo_ref, tc_hi_ref, tn_lo_ref, tn_hi_ref,
               key_lo_ref, key_hi_ref, w_ref, ft_ref,
               top_lo_ref, top_hi_ref, tqt_lo_ref, tqt_hi_ref,
               scal_ref, nr_ref,
               out_lo_ref, out_hi_ref,
               top_scratch, acc_scratch):
    i = pl.program_id(0)   # output limb (0..Rn-1)
    j = pl.program_id(1)   # decomposition limb (0..D-1), innermost
    tt = _TileTables.__new__(_TileTables)
    (tt.q_lo, tt.q_hi, tt.two_q_lo, tt.two_q_hi,
     tt.ratio_lo_lo, tt.ratio_lo_hi, tt.ratio_hi_lo, tt.ratio_hi_hi) = [
        scal_ref[i, c] for c in range(8)]
    tt.nplanes = P
    q = (tt.q_lo, tt.q_hi)
    rhi = (tt.ratio_hi_lo, tt.ratio_hi_hi)

    def _compute_ntt():
        x = (tc_lo_ref[0], tc_hi_ref[0])            # (n1, n2), < q_j
        red = U.barrett_reduce_64(x, q, rhi)
        nr = nr_ref[j, i] != 0
        x2 = U.select64(nr, red, x)
        xp = _to_planes(x2, P)
        h = _contract_cl(w_ref[0], xp, P, n1, kchunk_a, db, tt)
        h = U.mul_mod_shoup(
            h, (top_lo_ref[0], top_hi_ref[0]), (tqt_lo_ref[0], tqt_hi_ref[0]), q)
        hp = _to_planes(h, P)
        o = _contract_cr(hp, ft_ref[0], P, n2, kchunk_b, db, tt)
        top_scratch[0] = o[0]
        top_scratch[1] = o[1]

    if has_diag:
        pl.when(i != j)(_compute_ntt)

        @pl.when(i == j)
        def _use_ntt_form():
            top_scratch[0] = tn_lo_ref[0]
            top_scratch[1] = tn_hi_ref[0]
    else:
        _compute_ntt()

    t_op = (top_scratch[0], top_scratch[1])          # (n1, n2) in [0, q_i)
    keyt = (key_lo_ref[:, 0, 0], key_hi_ref[:, 0, 0])  # (2, n1, n2)
    w = U.mul64_wide((t_op[0][None], t_op[1][None]), keyt)  # 4 x (2, n1, n2)

    @pl.when(j == 0)
    def _init():
        for c in range(4):
            acc_scratch[c] = w[c]

    @pl.when(j != 0)
    def _accumulate():
        acc = tuple(acc_scratch[c] for c in range(4))
        s = U.add128(acc, w)
        for c in range(4):
            acc_scratch[c] = s[c]

    if D > _ACC_WINDOW:
        # periodic in-window Barrett guard for very wide chains
        @pl.when(jnp.logical_and(j % _ACC_WINDOW == _ACC_WINDOW - 1, j != D - 1))
        def _guard():
            acc = tuple(acc_scratch[c] for c in range(4))
            red = U.barrett_reduce_128(
                acc, q, (tt.ratio_lo_lo, tt.ratio_lo_hi), (tt.ratio_hi_lo, tt.ratio_hi_hi))
            acc_scratch[0] = red[0]
            acc_scratch[1] = red[1]
            acc_scratch[2] = jnp.zeros_like(red[0])
            acc_scratch[3] = jnp.zeros_like(red[0])

    @pl.when(j == D - 1)
    def _finish():
        acc = tuple(acc_scratch[c] for c in range(4))
        red = U.barrett_reduce_128(
            acc, q, (tt.ratio_lo_lo, tt.ratio_lo_hi), (tt.ratio_hi_lo, tt.ratio_hi_hi))
        out_lo_ref[:, 0] = red[0]
        out_hi_ref[:, 0] = red[1]


def switch_key_contract(t_c: U64, t_n, key: U64, t: MXUTables,
                        need_reduce: np.ndarray, interpret: bool = False) -> U64:
    """Fused decompose+NTT+key-contract.

    ``t_c``: (D, n) coefficient-form source limbs (< q_j each).
    ``t_n``: (D, n) NTT-form source (diagonal fast path) or None.
    ``key``: (2, D, Rn, n) selected key-switching key columns.
    ``t``: MXUTables over the Rn output (sel) moduli.
    ``need_reduce``: (D, Rn) bool, True where q_j > q_i.

    Returns ``prod``: (2, Rn, n) NTT-form accumulation mod each output
    modulus, in [0, q_i).
    """
    lo, hi = t_c
    D, n = lo.shape
    n1, n2 = t.n1, t.n2
    # At levels below the top the key carries more decomposition rows than
    # the ciphertext has limbs (RelinearizeLowerLevel); only the first D
    # participate (reference evaluator.cpp:2663 loops J over the decomp
    # modulus size, not the key's row count).
    if key[0].shape[1] > D:
        key = (key[0][:, :D], key[1][:, :D])
    Rn = key[0].shape[2]
    P = t.nplanes
    db, scal = _host_consts(t, Rn)
    has_diag = t_n is not None

    tc = (lo.reshape(D, n1, n2), hi.reshape(D, n1, n2))
    if has_diag:
        tn = (t_n[0].reshape(D, n1, n2), t_n[1].reshape(D, n1, n2))
    else:
        z = jnp.zeros((D, n1, n2), dtype=jnp.uint32)
        tn = (z, z)
    klo = key[0].reshape(2, D, Rn, n1, n2)
    khi = key[1].reshape(2, D, Rn, n1, n2)

    ba = t.w_planes                          # (P, Rn, n1, n1)
    bb = t.f_planes.transpose(0, 1, 3, 2)    # (P, Rn, n2, n2) pre-transposed

    tc_spec = pl.BlockSpec((1, n1, n2), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM)
    key_spec = pl.BlockSpec((2, 1, 1, n1, n2), lambda i, j: (0, j, i, 0, 0),
                            memory_space=pltpu.VMEM)
    ba_spec = pl.BlockSpec((1, P, n1, n1), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    bb_spec = pl.BlockSpec((1, P, n2, n2), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((1, n1, n2), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, 1, n1, n2), lambda i, j: (0, i, 0, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    nr = np.asarray(need_reduce).astype(np.int32).reshape(D, Rn)

    kern = functools.partial(
        _sk_kernel, P, n1, n2, t.kchunk_a, t.kchunk_b, db, D, has_diag)
    out = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((2, Rn, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((2, Rn, n1, n2), jnp.uint32)),
        grid=(Rn, D),
        in_specs=[tc_spec, tc_spec, tc_spec, tc_spec,
                  key_spec, key_spec, ba_spec, bb_spec,
                  tw_spec, tw_spec, tw_spec, tw_spec,
                  smem_spec, smem_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, n1, n2), jnp.uint32),      # t_op tile
            pltpu.VMEM((4, 2, n1, n2), jnp.uint32),   # u128 accumulator
        ],
        interpret=interpret,
    )(tc[0], tc[1], tn[0], tn[1], klo, khi,
      jnp.asarray(ba).transpose(1, 0, 2, 3), jnp.asarray(bb).transpose(1, 0, 2, 3),
      jnp.asarray(t.t_op_lo), jnp.asarray(t.t_op_hi),
      jnp.asarray(t.t_qt_lo), jnp.asarray(t.t_qt_hi),
      jnp.asarray(scal), jnp.asarray(nr))
    return out[0].reshape(2, Rn, n), out[1].reshape(2, Rn, n)
