"""Multi-device sharding tests on the 8-device virtual CPU mesh:
batched ops sharded over (data, limb) must equal unsharded results."""

import numpy as np
import pytest

import jax

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.parallel import BatchEvaluator, HEMesh, make_mesh, shard_kswitch_key
from seal_tpu.parallel.batch import CiphertextBatch


@pytest.fixture(scope="module")
def ckks():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 30, 30, 30, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
        "encoder": CKKSEncoder(ctx),
    }


def test_mesh_construction():
    assert len(jax.devices()) >= 8
    hem = make_mesh(8, limb_parallel=2)
    assert hem.batch_size == 4 and hem.limb_size == 2


def test_sharded_batched_pipeline_matches_unsharded(ckks):
    ctx, enc, dec, ev, encoder, keygen = (
        ckks["ctx"], ckks["enc"], ckks["dec"], ckks["ev"], ckks["encoder"], ckks["keygen"],
    )
    rk = keygen.create_relin_keys()
    rng = np.random.default_rng(7)
    scale = 2.0**30
    B = 8
    cts1, cts2, expect = [], [], []
    for _ in range(B):
        a = rng.uniform(-2, 2, 32)
        b = rng.uniform(-2, 2, 32)
        cts1.append(enc.encrypt_symmetric(encoder.encode(a, scale)))
        cts2.append(enc.encrypt_symmetric(encoder.encode(b, scale)))
        expect.append(a * b)

    hem = make_mesh(8, limb_parallel=2)
    bev = BatchEvaluator(ctx, hem)
    b1 = bev.shard(CiphertextBatch.from_ciphertexts(cts1))
    b2 = bev.shard(CiphertextBatch.from_ciphertexts(cts2))
    rk_key = shard_kswitch_key(hem, rk.key(2))
    rk_sharded = type(rk)()
    rk_sharded.parms_id = rk.parms_id
    rk_sharded.keys = [rk_key]

    with hem.mesh:
        out = bev.rescale_to_next(bev.relinearize(bev.multiply(b1, b2), rk_sharded))

    # compare against unsharded single-ct evaluator
    for i in range(B):
        got = encoder.decode(dec.decrypt(out[i]))
        assert np.allclose(got.real, expect[i], atol=1e-2), i
        single = ev.rescale_to_next(ev.relinearize(ev.multiply(cts1[i], cts2[i]), rk))
        want = encoder.decode(dec.decrypt(single))
        assert np.allclose(got, want, atol=1e-9), i


def test_batch_add(ckks):
    ctx, enc, dec, encoder = ckks["ctx"], ckks["enc"], ckks["dec"], ckks["encoder"]
    rng = np.random.default_rng(9)
    scale = 2.0**30
    a = rng.uniform(-1, 1, 32)
    b = rng.uniform(-1, 1, 32)
    c1 = enc.encrypt_symmetric(encoder.encode(a, scale))
    c2 = enc.encrypt_symmetric(encoder.encode(b, scale))
    bev = BatchEvaluator(ctx)
    batch1 = CiphertextBatch.from_ciphertexts([c1, c1])
    batch2 = CiphertextBatch.from_ciphertexts([c2, c2])
    out = bev.add(batch1, batch2)
    got = encoder.decode(dec.decrypt(out[0]))
    assert np.allclose(got.real, a + b, atol=1e-5)
