"""KeyGenerator / Decryptor adversarial and contract tests
(keygenerator.cpp / decryptor.cpp behavior parity)."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext, SecretKey
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def _ctx(bits, n=64, t=257, scheme=SchemeType.BFV, expand=True):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    if scheme != SchemeType.CKKS:
        parms.set_plain_modulus(t)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    return SealContext(parms, expand, SecurityLevel.NONE)


def test_keygen_requires_valid_context():
    parms = EncryptionParameters(SchemeType.BFV)  # nothing set
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert not ctx.parameters_set
    with pytest.raises(ValueError):
        KeyGenerator(ctx)


def test_single_prime_context_has_no_keyswitching():
    ctx = _ctx([40])
    assert not ctx.using_keyswitching
    kg = KeyGenerator(ctx)
    with pytest.raises(ValueError):
        kg.create_relin_keys()
    with pytest.raises(ValueError):
        kg.create_galois_keys()


def test_relin_count_bounds():
    kg = KeyGenerator(_ctx([40, 40]))
    with pytest.raises(ValueError):
        kg.create_relin_keys(count=0)
    with pytest.raises(ValueError):
        kg.create_relin_keys(count=15)  # > CIPHERTEXT_SIZE_MAX - 2


def test_galois_elt_validation():
    kg = KeyGenerator(_ctx([40, 40]))
    with pytest.raises(ValueError):
        kg.create_galois_keys([2])  # even
    with pytest.raises(ValueError):
        kg.create_galois_keys([129])  # >= 2n = 128


def test_secret_key_reuse_reproduces_keys():
    """A KeyGenerator restarted from the same secret key must decrypt
    ciphertexts made under the original (keygenerator.h secret-key ctor)."""
    ctx = _ctx([40, 40])
    kg1 = KeyGenerator(ctx)
    enc = Encryptor(ctx, public_key=kg1.create_public_key())
    p = Plaintext.from_hex("2x^3 + 1")
    ct = enc.encrypt(p)

    kg2 = KeyGenerator(ctx, kg1.secret_key)
    dec2 = Decryptor(ctx, kg2.secret_key)
    assert dec2.decrypt(ct).to_string() == p.to_string()
    # relin keys from the restarted generator work on old ciphertexts
    rlk = kg2.create_relin_keys()
    ev = Evaluator(ctx)
    out = ev.relinearize(ev.square(ct), rlk)
    assert dec2.decrypt(out).to_string() == "4x^6 + 4x^3 + 1"


def test_decryptor_wrong_key_gives_garbage_not_crash():
    ctx = _ctx([40, 40])
    kg1, kg2 = KeyGenerator(ctx), KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg1.secret_key)
    dec_wrong = Decryptor(ctx, kg2.secret_key)
    p = Plaintext.from_hex("5x^2 + 1")
    got = dec_wrong.decrypt(enc.encrypt_symmetric(p))
    assert got.to_string() != p.to_string()


def test_decryptor_rejects_mismatched_context_key():
    ctx_a = _ctx([40, 40])
    ctx_b = _ctx([40, 40, 40])
    kg_b = KeyGenerator(ctx_b)
    with pytest.raises(ValueError):
        Decryptor(ctx_a, kg_b.secret_key)


def test_noise_budget_zero_means_garbage():
    """Drive the noise over budget with unrelinearized squarings; the budget
    must hit 0 and decryption must stop matching (invariant_noise_budget
    semantics, decryptor.cpp:409-486)."""
    ctx = _ctx([30, 30], n=64, t=65537)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("3x^1 + 2"))
    budgets = [dec.invariant_noise_budget(ct)]
    for _ in range(4):
        ct = ev.square(ct)
        budgets.append(dec.invariant_noise_budget(ct))
        if budgets[-1] == 0:
            break
    assert budgets[0] > 0
    assert budgets[-1] == 0
    assert all(b2 <= b1 for b1, b2 in zip(budgets, budgets[1:]))


def test_ckks_has_no_noise_budget():
    ctx = _ctx([40, 40, 40], scheme=SchemeType.CKKS)
    kg = KeyGenerator(ctx)
    from seal_tpu.ckks_encoder import CKKSEncoder

    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    encoder = CKKSEncoder(ctx)
    ct = enc.encrypt_symmetric(encoder.encode(np.ones(32), 2.0**20))
    with pytest.raises(ValueError):
        dec.invariant_noise_budget(ct)


def test_secret_key_zeroize():
    ctx = _ctx([40, 40])
    kg = KeyGenerator(ctx)
    sk = kg.secret_key
    sk.zeroize()
    import numpy as _np
    from seal_tpu.ops import u64 as U

    arr = U.to_np_u64(sk.data)
    assert (_np.asarray(arr) == 0).all()


def test_encryptor_requires_some_key():
    ctx = _ctx([40, 40])
    with pytest.raises(ValueError):
        Encryptor(ctx)
    kg = KeyGenerator(ctx)
    enc_pk_only = Encryptor(ctx, public_key=kg.create_public_key())
    with pytest.raises(ValueError):
        enc_pk_only.encrypt_symmetric(Plaintext.from_hex("1"))
