"""CKKS tests: encoder round trips and approximate evaluator ops
(mirrors ``tests/seal/ckks.cpp`` and CKKS sections of evaluator.cpp tests)."""

import numpy as np
import pytest

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def make(n=64, bits=(40, 40, 40, 40)):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    return ctx


@pytest.fixture(scope="module")
def ckks():
    ctx = make()
    keygen = KeyGenerator(ctx)
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
        "encoder": CKKSEncoder(ctx),
    }


def test_encode_decode_roundtrip(ckks):
    encoder = ckks["encoder"]
    rng = np.random.default_rng(1)
    vals = rng.uniform(-10, 10, 32) + 1j * rng.uniform(-10, 10, 32)
    scale = 2.0**40
    p = encoder.encode(vals, scale)
    out = encoder.decode(p)
    assert np.allclose(out, vals, atol=1e-7)


def test_encode_decode_real_and_scalar(ckks):
    encoder = ckks["encoder"]
    vals = np.arange(32, dtype=np.float64) / 7.0
    p = encoder.encode(vals, 2.0**40)
    assert np.allclose(encoder.decode(p).real, vals, atol=1e-7)

    p2 = encoder.encode(3.14159, 2.0**40)
    assert np.allclose(encoder.decode(p2).real, 3.14159, atol=1e-7)

    p3 = encoder.encode_int(7)
    assert np.allclose(encoder.decode(p3).real, 7.0, atol=1e-7)


def test_encrypt_decrypt(ckks):
    encoder, enc, dec = ckks["encoder"], ckks["enc"], ckks["dec"]
    rng = np.random.default_rng(2)
    vals = rng.uniform(-5, 5, 32)
    ct = enc.encrypt(encoder.encode(vals, 2.0**40))
    assert ct.is_ntt_form
    out = encoder.decode(dec.decrypt(ct))
    assert np.allclose(out.real, vals, atol=1e-5)


def test_add_sub_multiply_rescale(ckks):
    encoder, enc, dec, ev, keygen = (
        ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"], ckks["keygen"],
    )
    rng = np.random.default_rng(3)
    a = rng.uniform(-2, 2, 32)
    b = rng.uniform(-2, 2, 32)
    scale = 2.0**40
    ca, cb = enc.encrypt(encoder.encode(a, scale)), enc.encrypt(encoder.encode(b, scale))

    assert np.allclose(encoder.decode(dec.decrypt(ev.add(ca, cb))).real, a + b, atol=1e-5)
    assert np.allclose(encoder.decode(dec.decrypt(ev.sub(ca, cb))).real, a - b, atol=1e-5)

    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    rk = keygen.create_relin_keys()
    rel = ev.relinearize(prod, rk)
    assert rel.size == 2
    res = ev.rescale_to_next(rel)
    assert abs(res.scale - scale * scale / ckks["ctx"].first_context_data().coeff_modulus_values[-1]) < 1
    out = encoder.decode(dec.decrypt(res))
    assert np.allclose(out.real, a * b, atol=1e-4)


def test_multiply_plain_and_mod_switch(ckks):
    encoder, enc, dec, ev = ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"]
    rng = np.random.default_rng(4)
    a = rng.uniform(-2, 2, 32)
    b = rng.uniform(-2, 2, 32)
    scale = 2.0**40
    ca = enc.encrypt(encoder.encode(a, scale))
    pb = encoder.encode(b, scale)
    prod = ev.rescale_to_next(ev.multiply_plain(ca, pb))
    out = encoder.decode(dec.decrypt(prod))
    assert np.allclose(out.real, a * b, atol=1e-4)

    # mod switch drop keeps value
    cm = ev.mod_switch_to_next(ca)
    out = encoder.decode(dec.decrypt(cm))
    assert np.allclose(out.real, a, atol=1e-5)


def test_rotate_and_conjugate(ckks):
    encoder, enc, dec, ev, keygen = (
        ckks["encoder"], ckks["enc"], ckks["dec"], ckks["ev"], ckks["keygen"],
    )
    gk = keygen.create_galois_keys()
    rng = np.random.default_rng(5)
    vals = rng.uniform(-3, 3, 32) + 1j * rng.uniform(-3, 3, 32)
    scale = 2.0**40
    ct = enc.encrypt(encoder.encode(vals, scale))

    rot = ev.rotate_vector(ct, 2, gk)
    out = encoder.decode(dec.decrypt(rot))
    assert np.allclose(out, np.roll(vals, -2), atol=1e-5)

    conj = ev.complex_conjugate(ct, gk)
    out = encoder.decode(dec.decrypt(conj))
    assert np.allclose(out, np.conj(vals), atol=1e-5)
