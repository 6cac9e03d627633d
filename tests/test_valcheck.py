"""Validity-check and adversarial-input tests (mirrors the reference's
evaluator adversarial cases and valcheck unit tests)."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Ciphertext, Plaintext, RelinKeys
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu import valcheck


@pytest.fixture(scope="module")
def setup():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(PlainModulus.batching(64, 20).value)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    return ctx, keygen, enc


def test_metadata_checks(setup):
    ctx, keygen, enc = setup
    ct = enc.encrypt_symmetric(Plaintext.from_hex("1x^2 + 2"))
    assert valcheck.is_metadata_valid_for(ct, ctx)
    assert valcheck.is_data_valid_for(ct, ctx)
    assert valcheck.is_valid_for(ct, ctx)

    # wrong parms_id
    bad = ct.copy()
    bad.parms_id = (1, 2, 3, 4)
    assert not valcheck.is_metadata_valid_for(bad, ctx)

    # key-level ciphertext is rejected for data use
    key_level = ct.copy()
    key_level.parms_id = ctx.key_parms_id
    assert not valcheck.is_metadata_valid_for(key_level, ctx)
    assert valcheck.is_metadata_valid_for(key_level, ctx, allow_pure_key_levels=True) in (True, False)

    # out-of-bounds coefficients fail the data check
    import jax.numpy as jnp

    evil = ct.copy()
    evil.data = (jnp.full_like(ct.data[0], 0xFFFFFFFF), jnp.full_like(ct.data[1], 0xFFFFFFFF))
    assert not valcheck.is_data_valid_for(evil, ctx)


def test_ntt_form_mismatch_rejected(setup):
    ctx, keygen, enc = setup
    ev = Evaluator(ctx)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("1x^2 + 2"))
    bad = ct.copy()
    bad.is_ntt_form = True
    with pytest.raises(ValueError):
        ev.add(ct, bad)
    with pytest.raises(ValueError):
        ev.multiply(bad, bad)  # BFV multiply requires non-NTT form


def test_size_and_level_mismatches(setup):
    ctx, keygen, enc = setup
    ev = Evaluator(ctx)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("3"))
    lower = ev.mod_switch_to_next(ct)
    with pytest.raises(ValueError):
        ev.add(ct, lower)
    # relinearize with destination_size out of range
    rk = keygen.create_relin_keys()
    with pytest.raises(ValueError):
        ev.relinearize(ct, rk, destination_size=3)
    # rotation with step too large
    gk = keygen.create_galois_keys()
    with pytest.raises(ValueError):
        ev.rotate_rows(ct, 64, gk)


def test_missing_keys_rejected(setup):
    ctx, keygen, enc = setup
    ev = Evaluator(ctx)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("2"))
    prod = ev.multiply(ct, ct)
    empty = RelinKeys()
    empty.parms_id = ctx.key_parms_id
    empty.keys = [None]
    with pytest.raises(ValueError):
        ev.relinearize(prod, empty)
    wrong = RelinKeys()
    wrong.parms_id = (9, 9, 9, 9)
    with pytest.raises(ValueError):
        ev.relinearize(prod, wrong)


def test_transparent_ciphertext_rejected(setup):
    ctx, keygen, enc = setup
    ev = Evaluator(ctx)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("5"))
    with pytest.raises(ValueError):
        ev.sub(ct, ct)  # difference of identical cts is transparent


def test_plaintext_bounds(setup):
    ctx, keygen, enc = setup
    t = ctx.first_context_data().parms.plain_modulus.value
    p = Plaintext.from_coeffs(np.array([t + 1], dtype=np.uint64))
    assert not valcheck.is_data_valid_for(p, ctx)
