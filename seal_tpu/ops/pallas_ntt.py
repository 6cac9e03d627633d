"""Pallas TPU kernel: fused negacyclic NTT/iNTT, VMEM-resident, no gathers.

Layout: each limb's n coefficients live as a (rows, 128) uint32 tile
(rows = n/128).  A butterfly stage pairs elements at distance ``gap``:

  * gap >= 128: partners are gap/128 rows apart — a sublane roll;
  * gap <  128: partners are gap lanes apart — a lane roll.

Twiddles are host-precomputed *dense* per-stage tables (k, S, n): every
coefficient slot already holds its block's root (``ntt_tables.py:
build_dense_stage_tables``), so stages are pure roll + select + u64 ops —
the canonical SIMD-NTT formulation.  The whole transform for one limb runs
inside one grid step with zero HBM round-trips between stages.

Semantics identical to ``ops/ntt.py`` (lazy Harvey ranges, fused 1/n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt_tables import DenseStageTables
from . import u64 as U

LANES = 128


def _guard(x, two_q):
    return U.select64(U.ge64(x, two_q), U.sub64(x, two_q), x)


def _roll2(pair, shift, axis):
    size = pair[0].shape[axis]
    shift = shift % size  # pltpu.roll requires non-negative shifts
    return (pltpu.roll(pair[0], shift, axis=axis), pltpu.roll(pair[1], shift, axis=axis))


def _stage_masks(logn, s, rows, forward=True):
    """(is_lo bool mask, shift, axis) for stage s."""
    if forward:
        gap = (1 << logn) >> (s + 1)
    else:
        gap = 1 << s
    if gap >= LANES:
        shift = gap // LANES
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        axis = 0
    else:
        shift = gap
        idx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        axis = 1
    is_lo = (idx // shift) % 2 == 0 if axis == 1 else ((idx // shift) % 2 == 0)
    # For axis=0 shift counts rows; idx is the row index either way.
    return is_lo, shift, axis


def _fwd_kernel(logn, lazy, rows,
                lo_ref, hi_ref, fol_ref, foh_ref, fql_ref, fqh_ref,
                q_lo_ref, q_hi_ref, tq_lo_ref, tq_hi_ref,
                out_lo_ref, out_hi_ref):
    x = (lo_ref[0], hi_ref[0])               # (rows, 128)
    q = (q_lo_ref[0, 0, 0], q_hi_ref[0, 0, 0])
    tq = (tq_lo_ref[0, 0, 0], tq_hi_ref[0, 0, 0])

    for s in range(logn):
        is_lo, shift, axis = _stage_masks(logn, s, rows, forward=True)
        y = _roll2(x, -shift, axis)          # partner for lo slots (j+gap)
        z = _roll2(x, shift, axis)           # partner for hi slots (j-gap)
        r_op = (fol_ref[0, s], foh_ref[0, s])
        r_qt = (fql_ref[0, s], fqh_ref[0, s])
        u = _guard(U.select64(is_lo, x, z), tq)
        t = U.select64(is_lo, y, x)
        w = U.mul_mod_shoup_lazy(t, r_op, r_qt, q)
        x = U.select64(is_lo, U.add64(u, w), U.sub64(U.add64(u, tq), w))

    if not lazy:
        x = _guard(x, tq)
        x = U.select64(U.ge64(x, q), U.sub64(x, q), x)
    out_lo_ref[0] = x[0]
    out_hi_ref[0] = x[1]


def _inv_kernel(logn, lazy, rows,
                lo_ref, hi_ref, iol_ref, ioh_ref, iql_ref, iqh_ref,
                q_lo_ref, q_hi_ref, tq_lo_ref, tq_hi_ref,
                out_lo_ref, out_hi_ref):
    x = (lo_ref[0], hi_ref[0])
    q = (q_lo_ref[0, 0, 0], q_hi_ref[0, 0, 0])
    tq = (tq_lo_ref[0, 0, 0], tq_hi_ref[0, 0, 0])

    for s in range(logn):
        last = s == logn - 1
        is_lo, shift, axis = _stage_masks(logn, s, rows, forward=False)
        y = _roll2(x, -shift, axis)
        z = _roll2(x, shift, axis)
        r_op = (iol_ref[0, s], ioh_ref[0, s])
        r_qt = (iql_ref[0, s], iqh_ref[0, s])
        u = U.select64(is_lo, x, z)
        v = U.select64(is_lo, y, x)
        if last:
            u = _guard(u, tq)
            lo_out = U.mul_mod_shoup_lazy(_guard(U.add64(u, v), tq), r_op, r_qt, q)
        else:
            lo_out = _guard(U.add64(u, v), tq)
        hi_out = U.mul_mod_shoup_lazy(U.sub64(U.add64(u, tq), v), r_op, r_qt, q)
        x = U.select64(is_lo, lo_out, hi_out)

    if not lazy:
        x = U.select64(U.ge64(x, q), U.sub64(x, q), x)
    out_lo_ref[0] = x[0]
    out_hi_ref[0] = x[1]


def _call(kernel, x, t: DenseStageTables, lazy: bool, interpret: bool, forward: bool):
    lo, hi = x
    k, n = lo.shape
    logn = int(n).bit_length() - 1
    rows = n // LANES
    if rows < 1:
        raise ValueError("n must be at least 128 for the Pallas NTT")

    lo3 = lo.reshape(k, rows, LANES)
    hi3 = hi.reshape(k, rows, LANES)
    S = logn

    data_spec = pl.BlockSpec((1, rows, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((1, S, rows, LANES), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    if forward:
        tabs = (t.fwd_op_lo, t.fwd_op_hi, t.fwd_qt_lo, t.fwd_qt_hi)
    else:
        tabs = (t.inv_op_lo, t.inv_op_hi, t.inv_qt_lo, t.inv_qt_hi)
    tabs = tuple(jnp.asarray(a).reshape(k, S, rows, LANES) for a in tabs)
    scals = tuple(
        jnp.asarray(a).reshape(k, 1, 1) for a in (t.q_lo, t.q_hi, t.two_q_lo, t.two_q_hi)
    )

    out = pl.pallas_call(
        functools.partial(kernel, logn, lazy, rows),
        out_shape=(
            jax.ShapeDtypeStruct((k, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((k, rows, LANES), jnp.uint32),
        ),
        grid=(k,),
        in_specs=[data_spec, data_spec] + [tab_spec] * 4 + [scal_spec] * 4,
        out_specs=(data_spec, data_spec),
        interpret=interpret,
    )(lo3, hi3, *tabs, *scals)
    return out[0].reshape(k, n), out[1].reshape(k, n)


@functools.partial(jax.jit, static_argnames=("lazy", "interpret"))
def ntt_forward(x, t: DenseStageTables, lazy: bool = False, interpret: bool = False):
    """Forward negacyclic NTT over (k, n) u64 pairs (input < 4q)."""
    return _call(_fwd_kernel, x, t, lazy, interpret, forward=True)


@functools.partial(jax.jit, static_argnames=("lazy", "interpret"))
def ntt_inverse(x, t: DenseStageTables, lazy: bool = False, interpret: bool = False):
    """Inverse negacyclic NTT with fused 1/n (input < 2q)."""
    return _call(_inv_kernel, x, t, lazy, interpret, forward=False)
