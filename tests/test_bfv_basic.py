"""First end-to-end slice: BFV keygen/encrypt/decrypt round trips with tiny
insecure parameters (mirrors ``tests/seal/encryptor.cpp`` patterns)."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, Modulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def small_context(n=64, plain=65537, bits=(40, 40)):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(plain)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    return SealContext(parms, True, SecurityLevel.NONE)


def test_context_chain():
    ctx = small_context(bits=(40, 40, 40))
    assert ctx.parameters_set, ctx.parameter_error_message()
    key_cd = ctx.key_context_data()
    first_cd = ctx.first_context_data()
    assert key_cd.chain_index == 2
    assert first_cd.chain_index == 1
    assert ctx.using_keyswitching
    assert len(first_cd.parms.coeff_modulus) == 2
    assert ctx.last_context_data().chain_index == 0


def test_bfv_sk_encrypt_decrypt_roundtrip():
    ctx = small_context()
    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)

    for hexpoly in ["0", "1", "7FFF", "1x^28 + 1x^25 + 1x^21 + 1x^20 + 1x^18 + 1x^14 + 1x^12 + 1x^10 + 1x^9 + 1x^6 + 1x^5 + 1x^4 + 1x^3"]:
        plain = Plaintext.from_hex(hexpoly)
        ct = enc.encrypt_symmetric(plain)
        out = dec.decrypt(ct)
        assert out.to_string() == plain.to_string(), hexpoly
        assert dec.invariant_noise_budget(ct) > 0


def test_bfv_pk_encrypt_decrypt_roundtrip():
    ctx = small_context()
    keygen = KeyGenerator(ctx)
    pk = keygen.create_public_key()
    enc = Encryptor(ctx, public_key=pk)
    dec = Decryptor(ctx, keygen.secret_key)

    rng = np.random.default_rng(0x5EA1)
    coeffs = rng.integers(0, 65537, 64, dtype=np.uint64)
    plain = Plaintext.from_coeffs(coeffs)
    ct = enc.encrypt(plain)
    assert ct.size == 2 and not ct.is_ntt_form
    out = dec.decrypt(ct)
    assert (out.coeff_data == coeffs[: len(out.coeff_data)]).all()
    assert dec.invariant_noise_budget(ct) > 0


def test_bfv_seeded_symmetric():
    """Seeded symmetric ciphertexts must decrypt after c1 regeneration."""
    ctx = small_context()
    keygen = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)

    plain = Plaintext.from_hex("3x^3 + 2x^2 + 1")
    ct = enc.encrypt_symmetric(plain, save_seed=True)
    assert ct.seed_info is not None
    out = dec.decrypt(ct)
    assert out.to_string() == plain.to_string()
