"""BFV Evaluator functional tests (mirrors ``tests/seal/evaluator.cpp``
patterns: tiny insecure params, exact round-trip assertions)."""

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


def make(n=64, plain=0x3FFFF, bits=(40, 40, 40)):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(plain)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    keygen = KeyGenerator(ctx)
    return ctx, keygen


@pytest.fixture(scope="module")
def bfv():
    ctx, keygen = make()
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
    }


def test_negate_add_sub(bfv):
    enc, dec, ev = bfv["enc"], bfv["dec"], bfv["ev"]
    t = 0x3FFFF
    p1 = Plaintext.from_hex("1x^3 + 5x^1 + 3")
    p2 = Plaintext.from_hex("7x^2 + 2")
    c1, c2 = enc.encrypt(p1), enc.encrypt(p2)

    assert dec.decrypt(ev.negate(c1)).to_string() == (
        f"{t-1:X}x^3 + {t-5:X}x^1 + {t-3:X}"
    )
    assert dec.decrypt(ev.add(c1, c2)).to_string() == "1x^3 + 7x^2 + 5x^1 + 5"
    out = dec.decrypt(ev.sub(c1, c2))
    assert out.to_string() == f"1x^3 + {t-7:X}x^2 + 5x^1 + 1"
    # add_many
    s = ev.add_many([c1, c2, c1])
    assert dec.decrypt(s).to_string() == "2x^3 + 7x^2 + Ax^1 + 8"


def test_multiply_and_relinearize(bfv):
    enc, dec, ev, keygen = bfv["enc"], bfv["dec"], bfv["ev"], bfv["keygen"]
    p1 = Plaintext.from_hex("1x^2 + 2x^1 + 3")
    p2 = Plaintext.from_hex("2x^1 + 1")
    c1, c2 = enc.encrypt(p1), enc.encrypt(p2)
    prod = ev.multiply(c1, c2)
    assert prod.size == 3
    # (x^2+2x+3)(2x+1) = 2x^3 + 5x^2 + 8x + 3
    assert dec.decrypt(prod).to_string() == "2x^3 + 5x^2 + 8x^1 + 3"

    rk = keygen.create_relin_keys()
    rel = ev.relinearize(prod, rk)
    assert rel.size == 2
    assert dec.decrypt(rel).to_string() == "2x^3 + 5x^2 + 8x^1 + 3"
    assert bfv["dec"].invariant_noise_budget(rel) > 0

    sq = ev.relinearize(ev.square(c1), rk)
    # (x^2+2x+3)^2 = x^4 + 4x^3 + 10x^2 + 12x + 9
    assert dec.decrypt(sq).to_string() == "1x^4 + 4x^3 + Ax^2 + Cx^1 + 9"


def test_multiply_three_way(bfv):
    """Size-3 x size-2 multiply exercises the general convolution."""
    enc, dec, ev, keygen = bfv["enc"], bfv["dec"], bfv["ev"], bfv["keygen"]
    c1 = enc.encrypt(Plaintext.from_hex("1x^1 + 2"))
    c2 = enc.encrypt(Plaintext.from_hex("3x^1 + 4"))
    c3 = enc.encrypt(Plaintext.from_hex("5x^1 + 6"))
    prod = ev.multiply(ev.multiply(c1, c2), c3)
    assert prod.size == 4
    # (x+2)(3x+4)(5x+6) = 15x^3 + 68x^2 + 100x + 48
    assert dec.decrypt(prod).to_string() == "Fx^3 + 44x^2 + 64x^1 + 30"
    rk = keygen.create_relin_keys(count=2)
    rel = ev.relinearize(prod, rk)
    assert dec.decrypt(rel).to_string() == "Fx^3 + 44x^2 + 64x^1 + 30"


def test_plain_ops(bfv):
    enc, dec, ev = bfv["enc"], bfv["dec"], bfv["ev"]
    c = enc.encrypt(Plaintext.from_hex("2x^2 + 1"))
    p = Plaintext.from_hex("3x^1 + 4")
    assert dec.decrypt(ev.add_plain(c, p)).to_string() == "2x^2 + 3x^1 + 5"
    assert dec.decrypt(ev.sub_plain(ev.add_plain(c, p), p)).to_string() == "2x^2 + 1"
    # multiply_plain general path
    assert dec.decrypt(ev.multiply_plain(c, p)).to_string() == "6x^3 + 8x^2 + 3x^1 + 4"
    # monomial fast path
    mono = Plaintext.from_hex("5x^1")
    assert dec.decrypt(ev.multiply_plain(c, mono)).to_string() == "Ax^3 + 5x^1"
    # NTT path
    c_ntt = ev.transform_to_ntt(c)
    p_ntt = ev.transform_plain_to_ntt(p, c.parms_id)
    prod = ev.transform_from_ntt(ev.multiply_plain(c_ntt, p_ntt))
    assert dec.decrypt(prod).to_string() == "6x^3 + 8x^2 + 3x^1 + 4"


def test_mod_switch(bfv):
    enc, dec, ev, ctx = bfv["enc"], bfv["dec"], bfv["ev"], bfv["ctx"]
    c = enc.encrypt(Plaintext.from_hex("7x^5 + 3"))
    c2 = ev.mod_switch_to_next(c)
    assert ctx.get_context_data(c2.parms_id).chain_index == 0
    assert dec.decrypt(c2).to_string() == "7x^5 + 3"
    c3 = ev.mod_switch_to(c, ctx.last_parms_id)
    assert dec.decrypt(c3).to_string() == "7x^5 + 3"


def test_batching_and_rotation():
    ctx, keygen = make(n=64, plain=PlainModulus.batching(64, 20).value)
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    gk = keygen.create_galois_keys()

    vals = list(range(64))
    p = be.encode(vals)
    np.testing.assert_array_equal(be.decode(p), vals)

    c = enc.encrypt(p)
    # rotate rows left by 3
    r = ev.rotate_rows(c, 3, gk)
    got = be.decode(dec.decrypt(r))
    row = vals[:32]
    want = row[3:] + row[:3]
    want2 = [v + 32 for v in want]
    np.testing.assert_array_equal(got, want + want2)
    # rotate columns
    rc = ev.rotate_columns(c, gk)
    got = be.decode(dec.decrypt(rc))
    np.testing.assert_array_equal(got, vals[32:] + vals[:32])
    # negative rotation via NAF decomposition path
    r2 = ev.rotate_rows(c, -1, gk)
    got = be.decode(dec.decrypt(r2))
    want = [row[-1]] + row[:-1]
    np.testing.assert_array_equal(got, want + [v + 32 for v in want])


def test_slot_products():
    ctx, keygen = make(n=64, plain=PlainModulus.batching(64, 20).value)
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    rk = keygen.create_relin_keys()
    a = list(range(1, 65))
    b = list(range(2, 66))
    ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
    prod = ev.relinearize(ev.multiply(ca, cb), rk)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(prod)), [x * y for x, y in zip(a, b)]
    )
