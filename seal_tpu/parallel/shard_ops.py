"""Explicitly-sharded key-switch contraction via shard_map.

SURVEY.md §2.12's "key-switch collective" row: the inner product over
decomposition limbs (evaluator.cpp:2663-2756) becomes per-shard partial
products plus a collective reduction.  GSPMD can derive this automatically
from shardings; this module is the explicit-communication version — each
shard contracts its local decomposition limbs, Barrett-reduces the partial
u128 accumulator to u64, all-gathers the per-shard partials over the ``limb``
mesh axis, and finishes with local modular additions (modular sums cannot
ride a plain psum, so the gather+add_mod tree is the exact formulation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..context import ContextData, SealContext
from ..ntt_tables import LimbTables
from ..ops import ntt as NTT
from ..ops import u64 as U
from ..ops.rns import _c, _cshoup, _ratio, take_limbs
from .mesh import HEMesh


def build_sharded_keyswitch_contraction(context: SealContext, cd: ContextData, hem: HEMesh):
    """Returns fn(t_op, key_sel) computing the key-switch contraction with
    the decomposition axis sharded over the mesh's limb axis.

    t_op: u64 pair (D, R, n) — NTT-lifted target per (decomp, output) limb.
    key_sel: u64 pair (D, R, n) — key component columns.
    Output: u64 pair (R, n), fully reduced mod the R selected moduli.
    """
    key_cd = context.key_context_data()
    key_moduli = key_cd.coeff_modulus_values
    D = len(cd.parms.coeff_modulus)
    k_key = len(key_moduli)
    sel_idx = list(range(D)) + [k_key - 1]
    sel_vals = [key_moduli[i] for i in sel_idx]
    limb_axis = hem.limb_axis
    n_shards = hem.limb_size

    def local_contract(t_op, key_sel):
        # t_op/key_sel: (D/n_shards, R, n) local shard
        sel_q = _c(sel_vals)
        sel_rlo, sel_rhi = _ratio(sel_vals)
        d_local = t_op[0].shape[0]
        Rn, n = t_op[0].shape[1], t_op[0].shape[2]
        acc = U.zero128((Rn, n))
        for j in range(d_local):
            x = (t_op[0][j], t_op[1][j])
            y = (key_sel[0][j], key_sel[1][j])
            acc = U.add128(acc, U.mul64_wide(x, y))
        partial = U.barrett_reduce_128(acc, sel_q, sel_rlo, sel_rhi)  # (R, n) < q
        # gather all shards' partials and reduce with modular adds
        gathered = jax.lax.all_gather(partial, limb_axis)  # pair of (S, R, n)
        total = (gathered[0][0], gathered[1][0])
        for s in range(1, n_shards):
            total = U.add_mod(total, (gathered[0][s], gathered[1][s]), sel_q)
        return total

    from jax import shard_map

    fn = shard_map(
        local_contract,
        mesh=hem.mesh,
        in_specs=(
            (P(limb_axis, None, None), P(limb_axis, None, None)),
            (P(limb_axis, None, None), P(limb_axis, None, None)),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn
