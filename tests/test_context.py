"""Context validation tests (mirrors ``tests/seal/context.cpp``): qualifier
flags and the full error taxonomy."""

import pytest

from seal_tpu import (
    CoeffModulus, EncryptionParameters, ErrorType, Modulus, PlainModulus,
    SchemeType, SealContext, SecurityLevel,
)


def make(scheme=SchemeType.BFV, n=64, coeff=None, plain=65537, sec=SecurityLevel.NONE):
    parms = EncryptionParameters(scheme)
    if n:
        parms.set_poly_modulus_degree(n)
    if coeff is not None:
        parms.set_coeff_modulus(coeff)
    if scheme != SchemeType.CKKS and plain is not None:
        parms.set_plain_modulus(plain)
    return SealContext(parms, True, sec)


def test_success_and_flags():
    ctx = make(coeff=CoeffModulus.create(64, [40, 40]), plain=PlainModulus.batching(64, 20).value)
    q = ctx.first_context_data().qualifiers
    assert q.parameters_set
    assert q.using_fft and q.using_ntt and q.using_batching
    assert q.using_fast_plain_lift  # 40-bit primes > 20-bit t
    assert q.using_descending_modulus_chain


def test_invalid_scheme():
    parms = EncryptionParameters(SchemeType.NONE)
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_SCHEME


def test_non_prime_modulus_rejected():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(65537)
    parms.set_coeff_modulus([Modulus((1 << 40) - 2)])  # even, not prime
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_COEFF_MODULUS_NON_PRIME


def test_no_ntt_modulus():
    # prime not == 1 mod 2n: NTT unavailable -> invalid
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(65537)
    parms.set_coeff_modulus([Modulus(0)])  # zero modulus: below min bit count
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_COEFF_MODULUS_BIT_COUNT
    with pytest.raises(ValueError):
        Modulus(0x7FFFFFFFFFFFFFE7)  # 63-bit: rejected at construction

    from seal_tpu.numth import get_primes

    p = get_primes(2, 40, 1)[0]  # == 1 mod 2 only
    if (p - 1) % 128 != 0:
        parms.set_coeff_modulus([Modulus(p)])
        ctx = SealContext(parms, True, SecurityLevel.NONE)
        assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_COEFF_MODULUS_NO_NTT


def test_plain_modulus_errors():
    coeff = CoeffModulus.create(64, [40])
    # t not coprime with q
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(coeff)
    parms.set_plain_modulus(coeff[0].value)
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_PLAIN_MODULUS_COPRIMALITY
    # t too large
    parms.set_coeff_modulus([Modulus(257)])
    parms.set_plain_modulus(65537)
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.key_context_data().qualifiers.parameter_error in (
        ErrorType.INVALID_PLAIN_MODULUS_TOO_LARGE, ErrorType.INVALID_COEFF_MODULUS_NO_NTT,
    )
    # CKKS requires zero plain modulus
    parms2 = EncryptionParameters(SchemeType.CKKS)
    parms2.set_poly_modulus_degree(64)
    parms2.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    with pytest.raises(ValueError):
        parms2.set_plain_modulus(2)


def test_security_gate():
    # 109 bits at n=4096 is the tc128 bound; one more bit must fail
    coeff = CoeffModulus.create(4096, [60, 50])  # 110 bits
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(4096)
    parms.set_plain_modulus(65537)
    parms.set_coeff_modulus(coeff)
    ctx = SealContext(parms, True, SecurityLevel.TC128)
    assert ctx.key_context_data().qualifiers.parameter_error == ErrorType.INVALID_PARAMETERS_INSECURE
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set
    assert ctx.key_context_data().qualifiers.sec_level == SecurityLevel.NONE


def test_expand_mod_chain_flag():
    coeff = CoeffModulus.create(64, [30, 30, 30, 30])
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(65537)
    parms.set_coeff_modulus(coeff)
    full = SealContext(parms, True, SecurityLevel.NONE)
    flat = SealContext(parms, False, SecurityLevel.NONE)
    assert full.key_context_data().chain_index == 3
    assert flat.key_context_data().chain_index == 1
    assert flat.first_parms_id == flat.last_parms_id


def test_parms_id_changes_with_params():
    p1 = EncryptionParameters(SchemeType.BFV)
    p1.set_poly_modulus_degree(64)
    p1.set_plain_modulus(65537)
    p1.set_coeff_modulus(CoeffModulus.create(64, [40]))
    id1 = p1.parms_id
    p1.set_plain_modulus(65539 if False else 786433)
    assert p1.parms_id != id1
