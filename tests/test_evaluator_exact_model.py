"""Exact-value evaluator battery: every arithmetic op x BFV/BGV x several
(N, modulus-chain) parameter points, asserted bit-exactly against an
independent plaintext polynomial model over Z_t[x]/(x^N+1).

This mirrors the reference's style of exhaustive exact-hex Evaluator tests
(native/tests/seal/evaluator.cpp:25-2500) without copying its fixtures: the
model recomputes the expected polynomial for arbitrary random inputs, so
every op is checked at multiple sizes with dense data, not just one
monomial."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


# ---------------------------------------------------------------------------
# plaintext polynomial model over Z_t[x]/(x^N + 1)
# ---------------------------------------------------------------------------

def p_add(a, b, t):
    return (a + b) % t


def p_sub(a, b, t):
    return (a - b) % t


def p_neg(a, t):
    return (-a) % t


def p_mul(a, b, t):
    """Negacyclic product via integer convolution then x^N = -1 folding."""
    n = len(a)
    full = np.convolve(a.astype(object), b.astype(object))
    out = np.zeros(n, dtype=object)
    for k, c in enumerate(full):
        if k < n:
            out[k] += c
        else:
            out[k - n] -= c
    return (out % t).astype(object)


def _rand_poly(rng, n, t):
    return rng.integers(0, int(t), n).astype(object)


def _pt(coeffs, t):
    return Plaintext.from_coeffs(np.asarray([int(c) % int(t) for c in coeffs], dtype=np.uint64))


def _dec_eq(dec, ct, expect, t):
    got = dec.decrypt(ct)
    want = _pt(expect, t)
    assert got.to_string() == want.to_string()


CONFIGS = [
    # (scheme, n, t, bits)
    (SchemeType.BFV, 64, 257, [40, 40]),
    (SchemeType.BFV, 128, 1 << 6, [40, 40, 40]),
    (SchemeType.BFV, 256, 65537, [30, 30, 30, 30]),
    (SchemeType.BGV, 64, 257, [40, 40]),
    (SchemeType.BGV, 128, 65, [40, 40, 40]),
    (SchemeType.BGV, 256, 65537, [30, 30, 30, 30]),
]


@pytest.fixture(scope="module", params=CONFIGS, ids=lambda c: f"{c[0].name}-n{c[1]}-t{c[2]}")
def env(request):
    scheme, n, t, bits = request.param
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(t)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    keygen = KeyGenerator(ctx)
    rng = np.random.default_rng(n * 1000 + int(t))
    return {
        "scheme": scheme, "n": n, "t": t, "ctx": ctx, "rng": rng,
        "keygen": keygen,
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
    }


def test_encrypt_decrypt_exact(env):
    n, t = env["n"], env["t"]
    for _ in range(3):
        a = _rand_poly(env["rng"], n, t)
        ct = env["enc"].encrypt(_pt(a, t))
        _dec_eq(env["dec"], ct, a, t)
        ct_sym = env["enc"].encrypt_symmetric(_pt(a, t))
        _dec_eq(env["dec"], ct_sym, a, t)


def test_negate_exact(env):
    n, t = env["n"], env["t"]
    a = _rand_poly(env["rng"], n, t)
    ct = env["enc"].encrypt(_pt(a, t))
    _dec_eq(env["dec"], env["ev"].negate(ct), p_neg(a, t), t)
    # double negation returns the input
    _dec_eq(env["dec"], env["ev"].negate(env["ev"].negate(ct)), a, t)


def test_add_sub_exact(env):
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca, cb = env["enc"].encrypt(_pt(a, t)), env["enc"].encrypt(_pt(b, t))
    _dec_eq(env["dec"], env["ev"].add(ca, cb), p_add(a, b, t), t)
    _dec_eq(env["dec"], env["ev"].sub(ca, cb), p_sub(a, b, t), t)


def test_add_many_exact(env):
    n, t = env["n"], env["t"]
    polys = [_rand_poly(env["rng"], n, t) for _ in range(5)]
    cts = [env["enc"].encrypt(_pt(p, t)) for p in polys]
    expect = polys[0]
    for p in polys[1:]:
        expect = p_add(expect, p, t)
    _dec_eq(env["dec"], env["ev"].add_many(cts), expect, t)


def test_multiply_exact(env):
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca, cb = env["enc"].encrypt(_pt(a, t)), env["enc"].encrypt(_pt(b, t))
    prod = env["ev"].multiply(ca, cb)
    assert prod.size == 3
    _dec_eq(env["dec"], prod, p_mul(a, b, t), t)


def test_square_exact(env):
    n, t = env["n"], env["t"]
    a = _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    _dec_eq(env["dec"], env["ev"].square(ca), p_mul(a, a, t), t)
    # square must equal multiply(ct, ct-copy) exactly
    cb = env["enc"].encrypt(_pt(a, t))
    got_sq = env["dec"].decrypt(env["ev"].square(ca)).to_string()
    got_mul = env["dec"].decrypt(env["ev"].multiply(ca, env["ev"].add(cb, env["ev"].sub(ca, cb)))).to_string()
    assert got_sq == got_mul


def test_multiply_relin_exact(env):
    n, t = env["n"], env["t"]
    rlk = env["keygen"].create_relin_keys()
    a, b, c = (_rand_poly(env["rng"], n, t) for _ in range(3))
    ca, cb, cc = (env["enc"].encrypt(_pt(p, t)) for p in (a, b, c))
    prod = env["ev"].relinearize(env["ev"].multiply(ca, cb), rlk)
    assert prod.size == 2
    _dec_eq(env["dec"], prod, p_mul(a, b, t), t)
    # second product on the relinearized result (needs noise headroom:
    # skip on single-data-limb chains where depth 2 exceeds the budget)
    if len(env["ctx"].first_context_data().parms.coeff_modulus) >= 2:
        prod2 = env["ev"].relinearize(env["ev"].multiply(prod, cc), rlk)
        _dec_eq(env["dec"], prod2, p_mul(p_mul(a, b, t), c, t), t)


def test_size3_arithmetic_exact(env):
    """Size-3 ciphertexts support add/sub/negate without relinearization."""
    n, t = env["n"], env["t"]
    a, b, c = (_rand_poly(env["rng"], n, t) for _ in range(3))
    ca, cb, cc = (env["enc"].encrypt(_pt(p, t)) for p in (a, b, c))
    p1 = env["ev"].multiply(ca, cb)      # size 3
    _dec_eq(env["dec"], env["ev"].add(p1, cc), p_add(p_mul(a, b, t), c, t), t)
    _dec_eq(env["dec"], env["ev"].negate(p1), p_neg(p_mul(a, b, t), t), t)
    p2 = env["ev"].multiply(cb, cc)
    _dec_eq(env["dec"], env["ev"].sub(p1, p2), p_sub(p_mul(a, b, t), p_mul(b, c, t), t), t)


def test_add_sub_plain_exact(env):
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    _dec_eq(env["dec"], env["ev"].add_plain(ca, _pt(b, t)), p_add(a, b, t), t)
    _dec_eq(env["dec"], env["ev"].sub_plain(ca, _pt(b, t)), p_sub(a, b, t), t)


def test_multiply_plain_general_exact(env):
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    _dec_eq(env["dec"], env["ev"].multiply_plain(ca, _pt(b, t)), p_mul(a, b, t), t)


def test_multiply_plain_monomial_exact(env):
    """Monomial fast path (evaluator.cpp:2048-2096): c*x^e for several e,
    including the wrap-around with sign flip."""
    n, t = env["n"], env["t"]
    a = _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    for e, c in ((0, 5), (1, 1), (n // 2, 3), (n - 1, int(t) - 1)):
        mono = np.zeros(n, dtype=object)
        mono[e] = c % int(t)
        if mono[e] == 0:
            continue
        out = env["ev"].multiply_plain(ca, _pt(mono, t))
        _dec_eq(env["dec"], out, p_mul(a, mono, t), t)


def test_mod_switch_value_preserving(env):
    n, t = env["n"], env["t"]
    if env["ctx"].first_context_data().next_context_data is None:
        pytest.skip("chain too short")
    a = _rand_poly(env["rng"], n, t)
    ct = env["enc"].encrypt(_pt(a, t))
    out = env["ev"].mod_switch_to_next(ct)
    _dec_eq(env["dec"], out, a, t)
    # walk the whole chain with mod_switch_to
    last = env["ctx"].last_context_data()
    out2 = env["ev"].mod_switch_to(ct, last.parms_id)
    _dec_eq(env["dec"], out2, a, t)


def test_exponentiate_exact(env):
    n, t = env["n"], env["t"]
    if len(env["ctx"].first_context_data().parms.coeff_modulus) < 2:
        pytest.skip("not enough noise budget for depth 2 at one data limb")
    rlk = env["keygen"].create_relin_keys()
    # low-norm plaintext: keeps depth-2 noise inside the smallest chains
    a = (env["rng"].integers(0, 3, n) % int(t)).astype(object)
    ca = env["enc"].encrypt(_pt(a, t))
    expect = p_mul(p_mul(a, a, t), a, t)
    _dec_eq(env["dec"], env["ev"].exponentiate(ca, 3, rlk), expect, t)


def test_bfv_ntt_transform_roundtrip_exact(env):
    if env["scheme"] != SchemeType.BFV:
        pytest.skip("BFV only")
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    ntt_ct = env["ev"].transform_to_ntt(ca)
    plain_ntt = env["ev"].transform_plain_to_ntt(_pt(b, t), ntt_ct.parms_id)
    prod = env["ev"].multiply_plain(ntt_ct, plain_ntt)
    out = env["ev"].transform_from_ntt(prod)
    _dec_eq(env["dec"], out, p_mul(a, b, t), t)


def test_bgv_correction_factor_mixing(env):
    """Add ciphertexts whose correction factors differ (after a mod switch):
    the balancing path (evaluator.cpp:56-118) must produce exact results."""
    if env["scheme"] != SchemeType.BGV:
        pytest.skip("BGV only")
    if env["ctx"].first_context_data().next_context_data is None:
        pytest.skip("chain too short")
    n, t = env["n"], env["t"]
    a, b = _rand_poly(env["rng"], n, t), _rand_poly(env["rng"], n, t)
    ca = env["enc"].encrypt(_pt(a, t))
    cb = env["enc"].encrypt(_pt(b, t))
    ca_l = env["ev"].mod_switch_to_next(ca)   # correction factor changes
    cb_l = env["ev"].mod_reduce_to_next(cb)   # drop variant: factor unchanged
    if ca_l.correction_factor == cb_l.correction_factor:
        pytest.skip("correction factors happen to coincide")
    _dec_eq(env["dec"], env["ev"].add(ca_l, cb_l), p_add(a, b, t), t)
    _dec_eq(env["dec"], env["ev"].sub(ca_l, cb_l), p_sub(a, b, t), t)


def test_noise_budget_decreases(env):
    dec = env["dec"]
    n, t = env["n"], env["t"]
    a = _rand_poly(env["rng"], n, t)
    ct = env["enc"].encrypt(_pt(a, t))
    fresh = dec.invariant_noise_budget(ct)
    assert fresh > 0
    prod = env["ev"].multiply(ct, ct)
    after = dec.invariant_noise_budget(prod)
    assert after < fresh
