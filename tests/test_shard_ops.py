"""shard_map key-switch contraction vs the unsharded kernel (8-dev CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seal_tpu.context import SealContext
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.parallel import make_mesh
from seal_tpu.parallel.shard_ops import build_sharded_keyswitch_contraction
from seal_tpu.ops import u64 as U
from seal_tpu.ops.rns import _c, _ratio


def test_sharded_contraction_matches_local():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 30, 30, 30, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    cd = ctx.first_context_data()  # D = 4 decomp limbs

    hem = make_mesh(8, limb_parallel=2)
    key_moduli = ctx.key_context_data().coeff_modulus_values
    D = len(cd.parms.coeff_modulus)
    sel_vals = [key_moduli[i] for i in range(D)] + [key_moduli[-1]]
    R = D + 1
    n = 64

    rng = np.random.default_rng(4)
    t_op = np.zeros((D, R, n), dtype=np.uint64)
    key_sel = np.zeros((D, R, n), dtype=np.uint64)
    for i, q in enumerate(sel_vals):
        t_op[:, i, :] = rng.integers(0, 4 * q, (D, n), dtype=np.uint64)  # lazy range
        key_sel[:, i, :] = rng.integers(0, q, (D, n), dtype=np.uint64)

    # local golden: sum_j t_op[j] * key[j] mod q (exact big-int)
    want = np.zeros((R, n), dtype=np.uint64)
    for i, q in enumerate(sel_vals):
        for c in range(n):
            want[i, c] = sum(int(t_op[j, i, c]) * int(key_sel[j, i, c]) for j in range(D)) % q

    fn = build_sharded_keyswitch_contraction(ctx, cd, hem)
    with hem.mesh:
        got = U.to_np_u64(fn(U.from_np_u64(t_op), U.from_np_u64(key_sel)))
    assert (got == want).all()
