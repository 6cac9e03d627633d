"""Extended batched/sharded op surface: BFV BEHZ multiply, rotations,
mod-switch, sub/negate, multiply_plain over ciphertext batches — sharded
results must equal the single-ciphertext evaluator bit for bit (BFV/BGV)."""

import numpy as np
import pytest

import jax

from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.parallel import BatchEvaluator, make_mesh
from seal_tpu.parallel.batch import CiphertextBatch

N = 64


@pytest.fixture(scope="module")
def bfv():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(N)
    # 4 data limbs: divisible by the 2-way limb mesh axis used below
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 30, 30, 30, 40]))
    parms.set_plain_modulus(PlainModulus.batching(N, 20))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
        "be": BatchEncoder(ctx),
    }


def _bfv_batch(env, B, seed=3):
    rng = np.random.default_rng(seed)
    t = env["ctx"].first_context_data().parms.plain_modulus.value
    cts, vals = [], []
    for _ in range(B):
        v = rng.integers(0, t, N, dtype=np.uint64)
        cts.append(env["enc"].encrypt_symmetric(env["be"].encode(v)))
        vals.append(v)
    return cts, vals


def _assert_ct_equal(batch, i, single_ct):
    np.testing.assert_array_equal(batch[i].to_np(), single_ct.to_np())


def test_batch_bfv_multiply_matches_single(bfv):
    cts, vals = _bfv_batch(bfv, 4)
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.multiply(b, b)
    for i in range(4):
        single = bfv["ev"].multiply(cts[i], cts[i])
        _assert_ct_equal(out, i, single)


def test_batch_bfv_multiply_sharded(bfv):
    """Sharded over the 8-device CPU mesh: bit-identical to unsharded."""
    cts, _ = _bfv_batch(bfv, 8, seed=5)
    hem = make_mesh(8, limb_parallel=2)
    bev = BatchEvaluator(bfv["ctx"], hem)
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))
    with hem.mesh:
        out = bev.multiply(b, b)
    for i in (0, 7):
        single = bfv["ev"].multiply(cts[i], cts[i])
        _assert_ct_equal(out, i, single)


def test_batch_rotate_matches_single(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=11)
    gk = bfv["keygen"].create_galois_keys()
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.rotate_rows(b, 1, gk)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].rotate_rows(cts[i], 1, gk))
    out_c = bev.rotate_columns(b, gk)
    for i in range(3):
        _assert_ct_equal(out_c, i, bfv["ev"].rotate_columns(cts[i], gk))


def test_batch_rotate_sharded(bfv):
    cts, _ = _bfv_batch(bfv, 4, seed=13)
    gk = bfv["keygen"].create_galois_keys()
    hem = make_mesh(8, limb_parallel=2)
    bev = BatchEvaluator(bfv["ctx"], hem)
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))
    with hem.mesh:
        out = bev.rotate_rows(b, 2, gk)
    for i in (0, 3):
        _assert_ct_equal(out, i, bfv["ev"].rotate_rows(cts[i], 2, gk))


def test_batch_modswitch_sub_negate(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=17)
    cts2, _ = _bfv_batch(bfv, 3, seed=19)
    bev = BatchEvaluator(bfv["ctx"])
    b1 = CiphertextBatch.from_ciphertexts(cts)
    b2 = CiphertextBatch.from_ciphertexts(cts2)
    out = bev.mod_switch_to_next(b1)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].mod_switch_to_next(cts[i]))
    out = bev.sub(b1, b2)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].sub(cts[i], cts2[i]))
    out = bev.negate(b1)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].negate(cts[i]))


def test_mesh_aware_evaluator_ckks():
    """Evaluator(mesh=...): shard keys + ciphertexts once, run the normal op
    surface; results must be bit-identical to the meshless evaluator."""
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 30, 30, 30, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    encoder = CKKSEncoder(ctx)
    rk = keygen.create_relin_keys()
    gk = keygen.create_galois_keys()

    hem = make_mesh(8, limb_parallel=2)
    ev_plain = Evaluator(ctx)
    ev_mesh = Evaluator(ctx, mesh=hem)
    rk_sh = ev_mesh.shard_keys(rk)
    gk_sh = ev_mesh.shard_keys(gk)

    rng = np.random.default_rng(23)
    scale = 2.0**30
    a = rng.uniform(-1, 1, N // 2)
    ct = enc.encrypt_symmetric(encoder.encode(a, scale))

    with hem.mesh:
        ct_sh = ev_mesh.shard(ct)
        out_sh = ev_mesh.rescale_to_next(ev_mesh.relinearize(ev_mesh.multiply(ct_sh, ct_sh), rk_sh))
        rot_sh = ev_mesh.rotate_vector(ct_sh, 1, gk_sh)

    out = ev_plain.rescale_to_next(ev_plain.relinearize(ev_plain.multiply(ct, ct), rk))
    rot = ev_plain.rotate_vector(ct, 1, gk)
    np.testing.assert_array_equal(np.asarray(out_sh.to_np()), np.asarray(out.to_np()))
    np.testing.assert_array_equal(np.asarray(rot_sh.to_np()), np.asarray(rot.to_np()))


def test_batch_3axis_mesh_replicated_keys(bfv):
    """(host x data x limb) DCN-shaped mesh with key replication: the
    multi-host configuration of SCALING.md, bit-identical to unsharded."""
    cts, _ = _bfv_batch(bfv, 4, seed=17)
    hem = make_mesh(8, limb_parallel=2, hosts=2, replicate_keys=True)
    assert hem.host_axis == "host" and hem.host_size == 2
    assert hem.batch_size == 4 and hem.limb_size == 2
    gk = bfv["keygen"].create_galois_keys()
    bev = BatchEvaluator(bfv["ctx"], hem)
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))
    with hem.mesh:
        out = bev.multiply(b, b)
        rot = bev.rotate_rows(b, 1, gk)
    for i in (0, 3):
        _assert_ct_equal(out, i, bfv["ev"].multiply(cts[i], cts[i]))
        _assert_ct_equal(rot, i, bfv["ev"].rotate_rows(cts[i], 1, gk))
