"""Distributed single-transform NTT: the butterfly-stage all-to-all.

SURVEY.md §2.12 ("distributed NTT" row): within a chip the coefficient axis
is a kernel grid; for transforms too large for one chip (or to ride many
chips' MXUs on ONE transform), the four-step factorization
(``ops/mxu_ntt.py``) distributes naturally:

    view x as (n1, n2), columns sharded over the mesh axis
      stage A  : n1-point negacyclic NTT per column      -> LOCAL matmul
      twiddle  : x *= alpha_{t1}^c                       -> LOCAL (sharded tables)
      transpose: reshard columns -> rows                 -> ONE all_to_all (ICI)
      stage B  : n2-point cyclic DFT per row             -> LOCAL matmul

The single all-to-all replaces the reference's per-stage data exchange a
butterfly network would need (log n stages, ``util/dwthandler.h:94-191``):
four-step moves each coefficient across the interconnect exactly once.
Bit-identical to the single-device kernel (same digit-plane matmuls, same
Barrett tail), asserted by ``tests/test_dist_ntt.py`` on the 8-device mesh.

Communication: n/P * (P-1)/P * 8 bytes per limb per transform — at
n=65536, k=16, P=8: 7 MiB, ~0.2 us/limb on 45 GB/s ICI links vs ~4 us/limb
of MXU work: comfortably overlappable (SCALING.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ntt_tables import MXUTables
from ..ops import mxu_ntt as M
from ..ops import u64 as U

U64 = U.U64


def _local_fwd_stage_a(d: U64, t: MXUTables) -> U64:
    """Stage A + twiddle on a column shard: d is (k, n1, n2_local)."""
    h = M._matmul_mod(d, t.w_planes, "ktr,...krc->...ktc", t.kchunk_a, t)
    return h


def _twiddle(h: U64, t_op: U64, t_qt: U64, q: U64) -> U64:
    return U.mul_mod_shoup(h, t_op, t_qt, q)


def dist_ntt_forward(x: U64, t: MXUTables, mesh: Mesh, axis: str = "limb",
                     exchange: str = "all_to_all") -> U64:
    """Forward negacyclic NTT of (k, n) u64 pairs, n1-columns sharded.

    ``x`` may live replicated or sharded; the result is produced with the
    same layout as the single-device kernel (bit-identical values).
    ``exchange``: 'all_to_all' (XLA collective, default) or 'remote'
    (Pallas make_async_remote_copy RDMA prototype, parallel/remote_ntt.py;
    requires real multi-chip ICI).
    """
    lo, hi = x
    k, n = lo.shape
    n1, n2 = t.n1, t.n2
    assert n1 * n2 == n
    P_sz = mesh.shape[axis]
    assert n2 % P_sz == 0 and n1 % P_sz == 0, "n1 and n2 must divide the mesh axis"
    q = (t.q_lo, t.q_hi)
    two_q = (t.two_q_lo, t.two_q_hi)

    d = (lo.reshape(k, n1, n2), hi.reshape(k, n1, n2))
    d = M._reduce_to_q(d, q, two_q)
    t_op = (t.t_op_lo, t.t_op_hi)
    t_qt = (t.t_qt_lo, t.t_qt_hi)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (P(None, None, axis), P(None, None, axis)),  # data: columns sharded
            (P(None, None, axis), P(None, None, axis)),  # twiddle op
            (P(None, None, axis), P(None, None, axis)),  # twiddle quot
        ),
        out_specs=(P(None, axis, None), P(None, axis, None)),  # rows sharded
        check_vma=False,
    )
    def fwd_shard(dl, top, tqt):
        # local stage A over this device's n2/P columns
        h = _local_fwd_stage_a(dl, t)
        h = _twiddle(h, top, tqt, q)
        # transpose exchange: (k, n1, n2loc) -> (k, n1loc, n2)
        # split rows into P blocks, all_to_all swaps the block axis with
        # the device axis — the four-step "corner turn" on ICI
        def corner(a):
            k_, n1_, n2l = a.shape
            a = a.reshape(k_, P_sz, n1_ // P_sz, n2l)
            # row-block j -> device j; received column blocks stack at axis 2
            # in device order, so (device, c_local) flattens to global columns
            if exchange == "remote":
                from .remote_ntt import remote_corner_turn

                a = remote_corner_turn(a, axis, P_sz)
            else:
                a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=2, tiled=False)
            return a.reshape(k_, n1_ // P_sz, P_sz * n2l)

        ht = (corner(h[0]), corner(h[1]))
        # local stage B over full rows: out[t1, t2] = sum_c F[t2, c] h[t1, c]
        o = M._matmul_mod(ht, t.f_planes, "kuc,...ktc->...ktu", t.kchunk_b, t)
        return o

    o = fwd_shard(d, t_op, t_qt)
    return o[0].reshape(k, n), o[1].reshape(k, n)


def dist_ntt_inverse(x: U64, t: MXUTables, mesh: Mesh, axis: str = "limb",
                     exchange: str = "all_to_all") -> U64:
    """Inverse negacyclic NTT (1/n folded), mirroring the forward exchange."""
    lo, hi = x
    k, n = lo.shape
    n1, n2 = t.n1, t.n2
    P_sz = mesh.shape[axis]
    assert n2 % P_sz == 0 and n1 % P_sz == 0
    q = (t.q_lo, t.q_hi)

    d = (lo.reshape(k, n1, n2), hi.reshape(k, n1, n2))
    d = U.select64(U.ge64(d, q), U.sub64(d, q), d)
    ti_op = (t.ti_op_lo, t.ti_op_hi)
    ti_qt = (t.ti_qt_lo, t.ti_qt_hi)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (P(None, axis, None), P(None, axis, None)),  # data: rows sharded
            (P(None, None, axis), P(None, None, axis)),
            (P(None, None, axis), P(None, None, axis)),
        ),
        out_specs=(P(None, None, axis), P(None, None, axis)),
        check_vma=False,
    )
    def inv_shard(dl, top, tqt):
        # local inverse stage B over this device's rows (full n2 available)
        ht = M._matmul_mod(dl, t.finv_planes, "kcu,...ktu->...ktc", t.kchunk_b, t)
        # corner turn back: (k, n1loc, n2) -> (k, n1, n2loc)
        def corner(a):
            k_, n1l, n2_ = a.shape
            a = a.reshape(k_, n1l, P_sz, n2_ // P_sz)
            if exchange == "remote":
                from .remote_ntt import remote_corner_turn

                a = remote_corner_turn(
                    a.transpose(0, 2, 1, 3), axis, P_sz
                ).transpose(0, 2, 1, 3)
            else:
                a = jax.lax.all_to_all(a, axis, split_axis=2, concat_axis=1, tiled=False)
            return a.reshape(k_, n1l * P_sz, n2_ // P_sz)

        ht = (corner(ht[0]), corner(ht[1]))
        ht = _twiddle(ht, top, tqt, q)
        # local inverse stage A (1/n1 folded in Winv)
        o = M._matmul_mod(ht, t.winv_planes, "krt,...ktc->...krc", t.kchunk_a, t)
        return o

    o = inv_shard(d, ti_op, ti_qt)
    return o[0].reshape(k, n), o[1].reshape(k, n)
