"""Pallas TPU kernel: fused negacyclic NTT/iNTT (one limb per grid step).

The jnp NTT (``ops/ntt.py``) relies on XLA to fuse 13+ butterfly stages; at
large n XLA materializes intermediates between stages.  This kernel keeps
one limb's entire transform resident in VMEM: grid over the limb axis, all
stages unrolled inside the kernel body, data written back once.

Falls back transparently: ``ntt_forward/ntt_inverse`` here match the jnp
versions' semantics exactly (same tables, same lazy ranges) and are verified
against them in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ntt_tables import LimbTables
from . import u64 as U


def _guard(x, two_q):
    return U.select64(U.ge64(x, two_q), U.sub64(x, two_q), x)


def _fwd_kernel(logn, lazy,
                lo_ref, hi_ref, fol_ref, foh_ref, fql_ref, fqh_ref,
                q_lo_ref, q_hi_ref, tq_lo_ref, tq_hi_ref,
                out_lo_ref, out_hi_ref):
    n = 1 << logn
    lo = lo_ref[0, :]
    hi = hi_ref[0, :]
    q = (q_lo_ref[0, 0], q_hi_ref[0, 0])
    tq = (tq_lo_ref[0, 0], tq_hi_ref[0, 0])

    for s in range(logn):
        m = 1 << s
        gap = n >> (s + 1)
        lo_r = lo.reshape(m, 2, gap)
        hi_r = hi.reshape(m, 2, gap)
        x0 = (lo_r[:, 0, :], hi_r[:, 0, :])
        x1 = (lo_r[:, 1, :], hi_r[:, 1, :])
        r_op = (fol_ref[0, m : 2 * m].reshape(m, 1), foh_ref[0, m : 2 * m].reshape(m, 1))
        r_qt = (fql_ref[0, m : 2 * m].reshape(m, 1), fqh_ref[0, m : 2 * m].reshape(m, 1))
        u = _guard(x0, tq)
        v = U.mul_mod_shoup_lazy(x1, r_op, r_qt, q)
        a = U.add64(u, v)
        b = U.sub64(U.add64(u, tq), v)
        lo = jnp.stack([a[0], b[0]], axis=1).reshape(n)
        hi = jnp.stack([a[1], b[1]], axis=1).reshape(n)

    if not lazy:
        y = _guard((lo, hi), tq)
        y = U.select64(U.ge64(y, q), U.sub64(y, q), y)
        lo, hi = y
    out_lo_ref[0, :] = lo
    out_hi_ref[0, :] = hi


@functools.partial(jax.jit, static_argnames=("lazy", "interpret"))
def ntt_forward(x, t: LimbTables, lazy: bool = False, interpret: bool = False):
    """Forward NTT over (k, n) u64 pairs; grid over limbs."""
    lo, hi = x
    k, n = lo.shape
    logn = int(n).bit_length() - 1

    row = pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, logn, lazy),
        out_shape=(
            jax.ShapeDtypeStruct((k, n), jnp.uint32),
            jax.ShapeDtypeStruct((k, n), jnp.uint32),
        ),
        grid=(k,),
        in_specs=[row, row, row, row, row, row, scal, scal, scal, scal],
        out_specs=(row, row),
        interpret=interpret,
    )(
        lo, hi,
        jnp.asarray(t.fwd_op_lo), jnp.asarray(t.fwd_op_hi),
        jnp.asarray(t.fwd_qt_lo), jnp.asarray(t.fwd_qt_hi),
        jnp.asarray(t.q_lo), jnp.asarray(t.q_hi),
        jnp.asarray(t.two_q_lo), jnp.asarray(t.two_q_hi),
    )
    return out


def _inv_kernel(logn, lazy,
                lo_ref, hi_ref, iol_ref, ioh_ref, iql_ref, iqh_ref,
                nl_ref, nh_ref, nql_ref, nqh_ref,
                ll_ref, lh_ref, lql_ref, lqh_ref,
                q_lo_ref, q_hi_ref, tq_lo_ref, tq_hi_ref,
                out_lo_ref, out_hi_ref):
    n = 1 << logn
    lo = lo_ref[0, :]
    hi = hi_ref[0, :]
    q = (q_lo_ref[0, 0], q_hi_ref[0, 0])
    tq = (tq_lo_ref[0, 0], tq_hi_ref[0, 0])

    offset = 1
    for s in range(logn):
        m = n >> (s + 1)
        gap = 1 << s
        last = m == 1
        lo_r = lo.reshape(m, 2, gap)
        hi_r = hi.reshape(m, 2, gap)
        x0 = (lo_r[:, 0, :], hi_r[:, 0, :])
        x1 = (lo_r[:, 1, :], hi_r[:, 1, :])
        if not last:
            r_op = (iol_ref[0, offset : offset + m].reshape(m, 1), ioh_ref[0, offset : offset + m].reshape(m, 1))
            r_qt = (iql_ref[0, offset : offset + m].reshape(m, 1), iqh_ref[0, offset : offset + m].reshape(m, 1))
            a = _guard(U.add64(x0, x1), tq)
            b = U.mul_mod_shoup_lazy(U.sub64(U.add64(x0, tq), x1), r_op, r_qt, q)
        else:
            invn_op = (nl_ref[0, 0], nh_ref[0, 0])
            invn_qt = (nql_ref[0, 0], nqh_ref[0, 0])
            last_op = (ll_ref[0, 0], lh_ref[0, 0])
            last_qt = (lql_ref[0, 0], lqh_ref[0, 0])
            u = _guard(x0, tq)
            v = x1
            a = U.mul_mod_shoup_lazy(_guard(U.add64(u, v), tq), invn_op, invn_qt, q)
            b = U.mul_mod_shoup_lazy(U.sub64(U.add64(u, tq), v), last_op, last_qt, q)
        lo = jnp.stack([a[0], b[0]], axis=1).reshape(n)
        hi = jnp.stack([a[1], b[1]], axis=1).reshape(n)
        offset += m

    if not lazy:
        y = U.select64(U.ge64((lo, hi), q), U.sub64((lo, hi), q), (lo, hi))
        lo, hi = y
    out_lo_ref[0, :] = lo
    out_hi_ref[0, :] = hi


@functools.partial(jax.jit, static_argnames=("lazy", "interpret"))
def ntt_inverse(x, t: LimbTables, lazy: bool = False, interpret: bool = False):
    lo, hi = x
    k, n = lo.shape
    logn = int(n).bit_length() - 1

    row = pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_inv_kernel, logn, lazy),
        out_shape=(
            jax.ShapeDtypeStruct((k, n), jnp.uint32),
            jax.ShapeDtypeStruct((k, n), jnp.uint32),
        ),
        grid=(k,),
        in_specs=[row] * 6 + [scal] * 12,
        out_specs=(row, row),
        interpret=interpret,
    )(
        lo, hi,
        jnp.asarray(t.inv_op_lo), jnp.asarray(t.inv_op_hi),
        jnp.asarray(t.inv_qt_lo), jnp.asarray(t.inv_qt_hi),
        jnp.asarray(t.invn_op_lo), jnp.asarray(t.invn_op_hi),
        jnp.asarray(t.invn_qt_lo), jnp.asarray(t.invn_qt_hi),
        jnp.asarray(t.invn_last_op_lo), jnp.asarray(t.invn_last_op_hi),
        jnp.asarray(t.invn_last_qt_lo), jnp.asarray(t.invn_last_qt_hi),
        jnp.asarray(t.q_lo), jnp.asarray(t.q_hi),
        jnp.asarray(t.two_q_lo), jnp.asarray(t.two_q_hi),
    )
    return out
