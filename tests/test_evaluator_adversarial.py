"""Adversarial evaluator battery, ported behavior-for-behavior from the
reference suite (native/tests/seal/evaluator.cpp): malformed keys, seeded
objects in computation, NTT-form mismatches that must not mutate operands,
subnormal scales, size-0/size>2 ciphertexts, and exact-hex relinearize /
apply_galois chains."""

import sys

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.data import Ciphertext, Plaintext, RelinKeys
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, Modulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def _bfv_ctx(n=128, t=1 << 6, bits=(40, 40, 40, 40)):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(t)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    return ctx, keygen


@pytest.fixture(scope="module")
def bfv128():
    ctx, keygen = _bfv_ctx()
    return {
        "ctx": ctx,
        "keygen": keygen,
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
    }


# ---------------------------------------------------------------------------
# exact-hex relinearize chains (EvaluatorTest.BFVRelinearize)
# ---------------------------------------------------------------------------

def test_bfv_relinearize_exact_chain(bfv128):
    ev, enc, dec = bfv128["ev"], bfv128["enc"], bfv128["dec"]
    rlk = bfv128["keygen"].create_relin_keys()
    ct = enc.encrypt(Plaintext.from_hex("1x^10 + 2"))
    ct = ev.relinearize(ev.square(ct), rlk)
    ct = ev.mod_switch_to_next(ct)
    assert dec.decrypt(ct).to_string() == "1x^20 + 4x^10 + 4"
    ct = ev.relinearize(ev.square(ct), rlk)
    ct = ev.mod_switch_to_next(ct)
    assert dec.decrypt(ct).to_string() == "1x^40 + 8x^30 + 18x^20 + 20x^10 + 10"


def test_relinearize_lower_level(bfv128):
    """Mod switch first so decomp size < key limb count: relinearization must
    still succeed (the >= contract, EvaluatorTest.RelinearizeLowerLevel)."""
    ev, enc, dec = bfv128["ev"], bfv128["enc"], bfv128["dec"]
    rlk = bfv128["keygen"].create_relin_keys()
    ct = ev.square(enc.encrypt(Plaintext.from_hex("1x^10 + 2")))
    ct = ev.mod_switch_to_next(ct)
    ct = ev.relinearize(ct, rlk)
    assert dec.decrypt(ct).to_string() == "1x^20 + 4x^10 + 4"


def test_relinearize_size_chain(bfv128):
    """Size-4 ciphertext relinearized back to 2 with count=2 keys."""
    ev, enc, dec = bfv128["ev"], bfv128["enc"], bfv128["dec"]
    rlk2 = bfv128["keygen"].create_relin_keys(count=2)
    p = Plaintext.from_hex("1x^1 + 3")
    ct = enc.encrypt(p)
    prod3 = ev.multiply(ev.multiply(ct, ct), ct)  # size 4
    assert prod3.size == 4
    out = ev.relinearize(prod3, rlk2)
    assert out.size == 2
    # (x+3)^3 = x^3 + 9x^2 + 27x + 27 (hex: 1x^3 + 9x^2 + 1Bx^1 + 1B)
    assert dec.decrypt(out).to_string() == "1x^3 + 9x^2 + 1Bx^1 + 1B"


# ---------------------------------------------------------------------------
# malformed keys (RelinearizeEmptyKeySlot / RelinearizeShortKeyVector)
# ---------------------------------------------------------------------------

def test_relinearize_empty_key_slot(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    rlk = bfv128["keygen"].create_relin_keys()
    ct = ev.square(enc.encrypt(Plaintext.from_hex("1x^10 + 2")))
    bad = RelinKeys()
    bad.parms_id = rlk.parms_id
    bad.keys = [None]  # the slot for key power 2 is empty
    with pytest.raises(ValueError):
        ev.relinearize(ct, bad)


def test_relinearize_short_key_vector(bfv128):
    """Truncate the decomposition axis as a truncated unsafe-loaded blob
    could; the key-switch must reject, not read out of bounds."""
    ev, enc = bfv128["ev"], bfv128["enc"]
    rlk = bfv128["keygen"].create_relin_keys()
    ct = ev.square(enc.encrypt(Plaintext.from_hex("1x^10 + 2")))
    entry = rlk.key(2)
    short = RelinKeys()
    short.parms_id = rlk.parms_id
    short.keys = [{
        "c0": (entry["c0"][0][:1], entry["c0"][1][:1]),
        "c1": (entry["c1"][0][:1], entry["c1"][1][:1]),
        "seeds": None,
    }]
    with pytest.raises(ValueError):
        ev.relinearize(ct, short)


def test_relinearize_wrong_parms_id(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    rlk = bfv128["keygen"].create_relin_keys()
    ct = ev.square(enc.encrypt(Plaintext.from_hex("2")))
    bad = RelinKeys()
    bad.parms_id = (1, 2, 3, 4)
    bad.keys = rlk.keys
    with pytest.raises(ValueError):
        ev.relinearize(ct, bad)


# ---------------------------------------------------------------------------
# seeded objects in computation (SeededCiphertextRejectedByComputation)
# ---------------------------------------------------------------------------

def test_seeded_ciphertext_rejected_by_computation(bfv128):
    ev, enc, dec = bfv128["ev"], bfv128["enc"], bfv128["dec"]
    normal = enc.encrypt_symmetric(Plaintext.from_hex("5"))
    assert normal.seed_info is None
    out = ev.negate(ev.negate(normal))
    assert dec.decrypt(out).to_string() == "5"

    seeded = enc.encrypt_symmetric(Plaintext.from_hex("5"), save_seed=True)
    assert seeded.seed_info is not None
    with pytest.raises(ValueError):
        ev.negate(seeded)
    with pytest.raises(ValueError):
        ev.add(seeded, normal)


# ---------------------------------------------------------------------------
# NTT-form mismatch must reject without mutating (ApplyGaloisRejectsWrongNttForm)
# ---------------------------------------------------------------------------

def test_apply_galois_wrong_ntt_form_no_mutation():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(8)
    parms.set_plain_modulus(257)
    parms.set_coeff_modulus(CoeffModulus.create(8, [40, 40]))
    ctx = SealContext(parms, False, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    glk = keygen.create_galois_keys([3])
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    ev = Evaluator(ctx)

    ct = enc.encrypt(Plaintext.from_hex("1x^3 + 2x^2 + 1x^1 + 1"))
    before = ct.to_np().copy()
    ct.is_ntt_form = True  # inconsistent flag
    with pytest.raises(ValueError):
        ev.apply_galois(ct, 3, glk)
    np.testing.assert_array_equal(ct.to_np(), before)
    assert ct.is_ntt_form


def test_bfv_multiply_rejects_ntt_form(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    ct = enc.encrypt(Plaintext.from_hex("3"))
    bad = ct.copy()
    bad.is_ntt_form = True
    with pytest.raises(ValueError):
        ev.multiply(bad, bad)


# ---------------------------------------------------------------------------
# apply_galois exact values (EvaluatorTest.BFVApplyGalois)
# ---------------------------------------------------------------------------

def test_bfv_apply_galois_exact():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(8)
    parms.set_plain_modulus(257)
    parms.set_coeff_modulus(CoeffModulus.create(8, [40, 40]))
    ctx = SealContext(parms, False, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    glk = keygen.create_galois_keys([1, 3, 5, 15])
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)

    ct = enc.encrypt(Plaintext.from_hex("1x^3 + 2x^2 + 1x^1 + 1"))
    ct = ev.apply_galois(ct, 1, glk)
    assert dec.decrypt(ct).to_string() == "1x^3 + 2x^2 + 1x^1 + 1"
    ct = ev.apply_galois(ct, 3, glk)
    assert dec.decrypt(ct).to_string() == "2x^6 + 1x^3 + 100x^1 + 1"
    ct = ev.apply_galois(ct, 5, glk)
    assert dec.decrypt(ct).to_string() == "100x^7 + FFx^6 + 100x^5 + 1"
    ct = ev.apply_galois(ct, 15, glk)
    assert dec.decrypt(ct).to_string() == "1x^3 + 2x^2 + 1x^1 + 1"


def test_apply_galois_invalid_elt(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    glk = bfv128["keygen"].create_galois_keys([3])
    ct = enc.encrypt(Plaintext.from_hex("1"))
    with pytest.raises(ValueError):
        ev.apply_galois(ct, 2, glk)  # even element
    with pytest.raises(ValueError):
        ev.apply_galois(ct, 257, glk)  # >= 2n
    with pytest.raises(ValueError):
        ev.apply_galois(ct, 5, glk)  # key not generated


# ---------------------------------------------------------------------------
# size-0 / oversize ciphertexts
# ---------------------------------------------------------------------------

def test_undersized_ciphertext_rejected(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    glk = bfv128["keygen"].create_galois_keys([3])
    ct = enc.encrypt(Plaintext.from_hex("1"))
    bad = ct.copy()
    bad.data = (ct.data[0][:1], ct.data[1][:1])  # size-1 buffer
    with pytest.raises(ValueError):
        ev.negate(bad)
    with pytest.raises(ValueError):
        ev.apply_galois(bad, 3, glk)


def test_apply_galois_size3_rejected(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    glk = bfv128["keygen"].create_galois_keys([3])
    ct = enc.encrypt(Plaintext.from_hex("2"))
    big = ev.multiply(ct, ct)  # size 3
    with pytest.raises(ValueError):
        ev.apply_galois(big, 3, glk)


# ---------------------------------------------------------------------------
# subnormal / out-of-bounds scales (CKKSRescaleRejectsSubnormalScale)
# ---------------------------------------------------------------------------

def test_ckks_rescale_rejects_subnormal_scale():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(8)
    parms.set_coeff_modulus(CoeffModulus.create(8, [40, 40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    encoder = CKKSEncoder(ctx)
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    ev = Evaluator(ctx)

    plain = encoder.encode(np.zeros(encoder.slot_count), scale=sys.float_info.min)
    ct = enc.encrypt(plain)
    assert ct.scale >= sys.float_info.min  # still a normal double
    with pytest.raises(ValueError):
        ev.rescale_to_next(ct)


def test_ckks_multiply_scale_overflow_rejected():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(8)
    parms.set_coeff_modulus(CoeffModulus.create(8, [40, 40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    encoder = CKKSEncoder(ctx)
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    ev = Evaluator(ctx)
    ct = enc.encrypt(encoder.encode(np.ones(encoder.slot_count), scale=2.0**60))
    with pytest.raises(ValueError):
        ev.multiply(ct, ct)  # scale 2^120 >= 120-bit total modulus


# ---------------------------------------------------------------------------
# transparent result rail
# ---------------------------------------------------------------------------

def test_transparent_sub_rejected(bfv128):
    ev, enc = bfv128["ev"], bfv128["enc"]
    ct = enc.encrypt(Plaintext.from_hex("7"))
    with pytest.raises(ValueError):
        ev.sub(ct, ct)


def test_transparent_allowed_when_disabled(bfv128):
    ev2 = Evaluator(bfv128["ctx"], throw_on_transparent=False)
    ct = bfv128["enc"].encrypt(Plaintext.from_hex("7"))
    out = ev2.sub(ct, ct)
    assert bfv128["dec"].decrypt(out).to_string() == "0"


# ---------------------------------------------------------------------------
# BGV relinearize exact chain with 60-bit moduli (EvaluatorTest.BGVRelinearize)
# ---------------------------------------------------------------------------

def test_bgv_relinearize_exact_chain():
    parms = EncryptionParameters(SchemeType.BGV)
    parms.set_poly_modulus_degree(128)
    parms.set_plain_modulus(65)
    parms.set_coeff_modulus(CoeffModulus.create(128, [60, 60, 60, 60]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    rlk = keygen.create_relin_keys()
    enc = Encryptor(ctx, public_key=keygen.create_public_key())
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)

    ct = enc.encrypt(Plaintext.from_hex("1x^10 + 2"))
    ct = ev.relinearize(ev.square(ct), rlk)
    assert dec.decrypt(ct).to_string() == "1x^20 + 4x^10 + 4"
    ct = ev.relinearize(ev.square(ct), rlk)
    # ((x^10+2)^2)^2 mod 65: x^40 + 8x^30 + 24x^20 + 32x^10 + 16
    assert dec.decrypt(ct).to_string() == "1x^40 + 8x^30 + 18x^20 + 20x^10 + 10"


# ---------------------------------------------------------------------------
# exponentiate / multiply_many edge cases
# ---------------------------------------------------------------------------

def test_exponentiate_zero_rejected(bfv128):
    rlk = bfv128["keygen"].create_relin_keys()
    ct = bfv128["enc"].encrypt(Plaintext.from_hex("2"))
    with pytest.raises(ValueError):
        bfv128["ev"].exponentiate(ct, 0, rlk)


def test_multiply_many_empty_rejected(bfv128):
    rlk = bfv128["keygen"].create_relin_keys()
    with pytest.raises(ValueError):
        bfv128["ev"].multiply_many([], rlk)


def test_multiply_many_exact(bfv128):
    ev, enc, dec = bfv128["ev"], bfv128["enc"], bfv128["dec"]
    rlk = bfv128["keygen"].create_relin_keys()
    cts = [enc.encrypt(Plaintext.from_hex(h)) for h in ("2", "3", "4", "5")]
    out = ev.multiply_many(cts, rlk)
    # 2*3*4*5 = 120 ≡ 56 (mod t=64) = 0x38
    assert dec.decrypt(out).to_string() == "38"


def test_user_modulus_cap_60_bits():
    """61-bit user coeff moduli must be rejected (defines.h:40)."""
    from seal_tpu import numth

    with pytest.raises(ValueError):
        CoeffModulus.create(128, [61, 61])
    p61 = numth.get_primes(256, 61, 1)[0]
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(128)
    parms.set_plain_modulus(257)
    parms.set_coeff_modulus([Modulus(p61), Modulus(p61 - 0)][:1])
    ctx = SealContext(parms, False, SecurityLevel.NONE)
    assert not ctx.parameters_set
