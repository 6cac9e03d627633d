"""Bit-identity of the fused Pallas switch-key kernel vs the staged path.

The kernel (ops/pallas_switch_key.py) is the TPU production path for
relinearize/rotate at n >= 8192; CPU CI exercises it in interpret mode at
small n so the decompose+NTT+contract fusion and the i == j diagonal fast
path (reference evaluator.cpp:2682-2702) stay exactly equivalent to
evaluator._switch_key_body's staged formulation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from seal_tpu.context import SealContext
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.ops import ntt as NTT
from seal_tpu.ops import u64 as U
from seal_tpu.ops.rns import take_limbs
from seal_tpu.ops.pallas_switch_key import switch_key_contract


def _setup(scheme, bits):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(128)
    parms.set_coeff_modulus(CoeffModulus.create(128, bits))
    if scheme in (SchemeType.BFV, SchemeType.BGV):
        from seal_tpu.modulus import PlainModulus

        parms.set_plain_modulus(PlainModulus.batching(128, 17))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    return ctx, rk


def _staged_prod(ctx, kc, target, with_intt):
    cd = ctx.first_context_data()
    key_cd = ctx.key_context_data()
    key_tables = key_cd.limb_tables()
    D = len(cd.parms.coeff_modulus)
    k_key = len(key_cd.coeff_modulus_values)
    sel_idx = list(range(D)) + [k_key - 1]
    Rn = D + 1
    sel_tables = take_limbs(key_tables, sel_idx)
    t_current = cd.limb_tables()
    t_target = NTT.ntt_inverse(target, t_current) if with_intt else target
    tt = (t_target[0][:, None, :], t_target[1][:, None, :])
    reduced = U.barrett_reduce_64(tt, sel_tables.q, sel_tables.ratio_hi)
    sel_vals = [key_cd.coeff_modulus_values[i] for i in sel_idx]
    need_reduce = np.array(
        [[qj > qi for qi in sel_vals] for qj in cd.coeff_modulus_values]
    )
    t_op = U.select64(jnp.asarray(need_reduce[:, :, None]), reduced, tt)
    t_op = NTT.ntt_forward(t_op, sel_tables, lazy=True)
    n = target[0].shape[-1]
    acc = U.zero128((2, Rn, n))
    for j in range(D):
        x = (t_op[0][j], t_op[1][j])
        y = (kc[0][:, j], kc[1][:, j])
        acc = U.add128(acc, U.mul64_wide(x, y))
    prod = U.barrett_reduce_128(acc, sel_tables.q, sel_tables.ratio_lo, sel_tables.ratio_hi)
    return prod, t_target, sel_tables, need_reduce


def _sel_keys(ctx, rk):
    cd = ctx.first_context_data()
    key_cd = ctx.key_context_data()
    D = len(cd.parms.coeff_modulus)
    k_key = len(key_cd.coeff_modulus_values)
    key = rk.key(2)

    def sel(keyc):
        lo, hi = keyc
        return (
            jnp.concatenate([lo[:, :D, :], lo[:, k_key - 1 :, :]], axis=1),
            jnp.concatenate([hi[:, :D, :], hi[:, k_key - 1 :, :]], axis=1),
        )

    s0, s1 = sel(key["c0"]), sel(key["c1"])
    return (jnp.stack([s0[0], s1[0]]), jnp.stack([s0[1], s1[1]]))


def _rand_target(ctx, seed):
    cd = ctx.first_context_data()
    rng = np.random.default_rng(seed)
    qv = np.array(cd.coeff_modulus_values, dtype=np.uint64)
    n = cd.parms.poly_modulus_degree
    tgt = rng.integers(0, qv[:, None], (len(qv), n)).astype(np.uint64)
    return (
        jnp.asarray((tgt & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((tgt >> 32).astype(np.uint32)),
    )


@pytest.mark.parametrize(
    "scheme,bits",
    [
        (SchemeType.CKKS, [40, 30, 30, 40]),
        (SchemeType.BGV, [40, 30, 30, 40]),
        (SchemeType.CKKS, [60, 40, 40, 60]),  # mixed plane widths
    ],
)
def test_diag_path_bit_identical(scheme, bits):
    """NTT-form schemes: kernel with the i == j fast path == staged path."""
    ctx, rk = _setup(scheme, bits)
    kc = _sel_keys(ctx, rk)
    target = _rand_target(ctx, 7)
    prod_ref, t_target, sel_tables, need_reduce = _staged_prod(ctx, kc, target, True)
    mxu = NTT._mxu_tables_for(sel_tables)
    prod_k = switch_key_contract(t_target, target, kc, mxu, need_reduce, interpret=True)
    assert np.array_equal(np.asarray(prod_ref[0]), np.asarray(prod_k[0]))
    assert np.array_equal(np.asarray(prod_ref[1]), np.asarray(prod_k[1]))


def test_no_diag_path_bit_identical():
    """BFV (coefficient-form target): every (i, j) transform computed."""
    ctx, rk = _setup(SchemeType.BFV, [40, 30, 30, 40])
    kc = _sel_keys(ctx, rk)
    cd = ctx.first_context_data()
    rng = np.random.default_rng(11)
    qv = np.array(cd.coeff_modulus_values, dtype=np.uint64)
    n = cd.parms.poly_modulus_degree
    tgt = rng.integers(0, qv[:, None], (len(qv), n)).astype(np.uint64)
    target = (
        jnp.asarray((tgt & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((tgt >> 32).astype(np.uint32)),
    )
    prod_ref, t_target, sel_tables, need_reduce = _staged_prod(ctx, kc, target, False)
    mxu = NTT._mxu_tables_for(sel_tables)
    prod_k = switch_key_contract(t_target, None, kc, mxu, need_reduce, interpret=True)
    assert np.array_equal(np.asarray(prod_ref[0]), np.asarray(prod_k[0]))
    assert np.array_equal(np.asarray(prod_ref[1]), np.asarray(prod_k[1]))


def test_lower_level_trims_key_rows():
    """Relinearize below the top level: the key carries MORE decomposition
    rows than the ciphertext has limbs (RelinearizeLowerLevel); the kernel
    must use only the first D (reference evaluator.cpp:2663).  Round-5
    regression: the fused kernel reshaped the full key tensor and crashed."""
    ctx, rk = _setup(SchemeType.CKKS, [40, 30, 30, 40])
    cd = ctx.first_context_data().next_context_data
    key_cd = ctx.key_context_data()
    key_tables = key_cd.limb_tables()
    D = len(cd.parms.coeff_modulus)
    k_key = len(key_cd.coeff_modulus_values)
    sel_idx = list(range(D)) + [k_key - 1]
    Rn = D + 1
    sel_tables = take_limbs(key_tables, sel_idx)
    key = rk.key(2)

    def sel(keyc):
        lo, hi = keyc
        return (
            jnp.concatenate([lo[:, :D, :], lo[:, k_key - 1 :, :]], axis=1),
            jnp.concatenate([hi[:, :D, :], hi[:, k_key - 1 :, :]], axis=1),
        )

    s0, s1 = sel(key["c0"]), sel(key["c1"])
    kc = (jnp.stack([s0[0], s1[0]]), jnp.stack([s0[1], s1[1]]))
    assert kc[0].shape[1] > D  # the key really has extra rows here

    rng = np.random.default_rng(13)
    qv = np.array(cd.coeff_modulus_values, dtype=np.uint64)
    n = cd.parms.poly_modulus_degree
    tgt = rng.integers(0, qv[:, None], (len(qv), n)).astype(np.uint64)
    target = (
        jnp.asarray((tgt & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray((tgt >> 32).astype(np.uint32)),
    )
    t_current = cd.limb_tables()
    t_target = NTT.ntt_inverse(target, t_current)
    tt = (t_target[0][:, None, :], t_target[1][:, None, :])
    reduced = U.barrett_reduce_64(tt, sel_tables.q, sel_tables.ratio_hi)
    sel_vals = [key_cd.coeff_modulus_values[i] for i in sel_idx]
    need_reduce = np.array(
        [[qj > qi for qi in sel_vals] for qj in cd.coeff_modulus_values]
    )
    t_op = U.select64(jnp.asarray(need_reduce[:, :, None]), reduced, tt)
    t_op = NTT.ntt_forward(t_op, sel_tables, lazy=True)
    acc = U.zero128((2, Rn, n))
    for j in range(D):
        x = (t_op[0][j], t_op[1][j])
        y = (kc[0][:, j], kc[1][:, j])
        acc = U.add128(acc, U.mul64_wide(x, y))
    prod_ref = U.barrett_reduce_128(acc, sel_tables.q, sel_tables.ratio_lo, sel_tables.ratio_hi)

    mxu = NTT._mxu_tables_for(sel_tables)
    prod_k = switch_key_contract(t_target, target, kc, mxu, need_reduce, interpret=True)
    assert np.array_equal(np.asarray(prod_ref[0]), np.asarray(prod_k[0]))
    assert np.array_equal(np.asarray(prod_ref[1]), np.asarray(prod_k[1]))
