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


# ---------------------------------------------------------------------------
# Round-5 surface completion: plain ops, transforms, mod_reduce,
# multiply_many, batched decrypt (VERDICT r4 item 7)
# ---------------------------------------------------------------------------

from seal_tpu.data import Plaintext


def test_batch_add_sub_plain_bfv(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=29)
    rng = np.random.default_rng(31)
    t = bfv["ctx"].first_context_data().parms.plain_modulus.value
    plain = bfv["be"].encode(rng.integers(0, t, N, dtype=np.uint64))
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.add_plain(b, plain)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].add_plain(cts[i], plain))
    out = bev.sub_plain(b, plain)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].sub_plain(cts[i], plain))


def test_batch_multiply_plain_coeff_general(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=37)
    rng = np.random.default_rng(41)
    t = bfv["ctx"].first_context_data().parms.plain_modulus.value
    plain = bfv["be"].encode(rng.integers(0, t, N, dtype=np.uint64))
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.multiply_plain(b, plain)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].multiply_plain(cts[i], plain))


def test_batch_multiply_plain_monomial(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=43)
    plain = Plaintext.from_hex("5x^7")
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.multiply_plain(b, plain)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].multiply_plain(cts[i], plain))


def test_batch_transform_ntt_roundtrip(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=47)
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    fwd = bev.transform_to_ntt(b)
    assert fwd.is_ntt_form
    for i in range(3):
        _assert_ct_equal(fwd, i, bfv["ev"].transform_to_ntt(cts[i]))
    back = bev.transform_from_ntt(fwd)
    for i in range(3):
        _assert_ct_equal(back, i, cts[i])


def test_batch_multiply_plain_coeff_ct_ntt_plain(bfv):
    """coeff-form batch x NTT plaintext: the transform-multiply-transform
    branch (evaluator.cpp:2006-2010), batched."""
    cts, _ = _bfv_batch(bfv, 2, seed=53)
    rng = np.random.default_rng(59)
    t = bfv["ctx"].first_context_data().parms.plain_modulus.value
    plain = bfv["be"].encode(rng.integers(0, t, N, dtype=np.uint64))
    plain_ntt = bfv["ev"].transform_plain_to_ntt(plain, cts[0].parms_id)
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.multiply_plain(b, plain_ntt)
    for i in range(2):
        _assert_ct_equal(out, i, bfv["ev"].multiply_plain(cts[i], plain_ntt))


def test_batch_mod_reduce(bfv):
    cts, _ = _bfv_batch(bfv, 3, seed=61)
    bev = BatchEvaluator(bfv["ctx"])
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.mod_reduce_to_next(b)
    for i in range(3):
        _assert_ct_equal(out, i, bfv["ev"].mod_reduce_to_next(cts[i]))


def test_batch_multiply_many(bfv):
    cts_a, _ = _bfv_batch(bfv, 2, seed=67)
    cts_b, _ = _bfv_batch(bfv, 2, seed=71)
    cts_c, _ = _bfv_batch(bfv, 2, seed=73)
    rk = bfv["keygen"].create_relin_keys()
    bev = BatchEvaluator(bfv["ctx"])
    batches = [CiphertextBatch.from_ciphertexts(c) for c in (cts_a, cts_b, cts_c)]
    out = bev.multiply_many(batches, rk)
    for i in range(2):
        single = bfv["ev"].multiply_many([cts_a[i], cts_b[i], cts_c[i]], rk)
        _assert_ct_equal(out, i, single)


def test_batch_decrypt_bfv(bfv):
    cts, vals = _bfv_batch(bfv, 4, seed=79)
    b = CiphertextBatch.from_ciphertexts(cts)
    plains = bfv["dec"].decrypt_batch(b)
    for i in range(4):
        single = bfv["dec"].decrypt(cts[i])
        np.testing.assert_array_equal(plains[i].coeff_data, single.coeff_data)
        np.testing.assert_array_equal(bfv["be"].decode(plains[i]), vals[i])


def test_batch_plain_ops_sharded(bfv):
    """New plain ops bit-identical under the 8-device mesh."""
    cts, _ = _bfv_batch(bfv, 8, seed=83)
    rng = np.random.default_rng(89)
    t = bfv["ctx"].first_context_data().parms.plain_modulus.value
    plain = bfv["be"].encode(rng.integers(0, t, N, dtype=np.uint64))
    hem = make_mesh(8, limb_parallel=2)
    bev = BatchEvaluator(bfv["ctx"], hem)
    b = bev.shard(CiphertextBatch.from_ciphertexts(cts))
    with hem.mesh:
        out_add = bev.add_plain(b, plain)
        out_mul = bev.multiply_plain(b, plain)
    for i in (0, 7):
        _assert_ct_equal(out_add, i, bfv["ev"].add_plain(cts[i], plain))
        _assert_ct_equal(out_mul, i, bfv["ev"].multiply_plain(cts[i], plain))


def test_batch_ckks_plain_ops_and_decrypt():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(CoeffModulus.create(N, [40, 30, 30, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)
    encoder = CKKSEncoder(ctx)
    rng = np.random.default_rng(97)
    scale = 2.0**30
    vals = [rng.uniform(-1, 1, N // 2) for _ in range(3)]
    cts = [enc.encrypt_symmetric(encoder.encode(v, scale)) for v in vals]
    pv = rng.uniform(-1, 1, N // 2)
    plain = encoder.encode(pv, scale)

    bev = BatchEvaluator(ctx)
    b = CiphertextBatch.from_ciphertexts(cts)
    out = bev.add_plain(b, plain)
    for i in range(3):
        np.testing.assert_array_equal(out[i].to_np(), ev.add_plain(cts[i], plain).to_np())
    out = bev.sub_plain(b, plain)
    for i in range(3):
        np.testing.assert_array_equal(out[i].to_np(), ev.sub_plain(cts[i], plain).to_np())

    plains = dec.decrypt_batch(b)
    for i in range(3):
        got = encoder.decode(plains[i])
        np.testing.assert_allclose(got.real[: N // 2], vals[i], atol=1e-4)
