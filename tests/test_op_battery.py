"""Every-op x every-scheme battery at two parameter points.

Mirrors the reference's 60-test evaluator battery
(``native/tests/seal/evaluator.cpp:25-6352``) with the same structure —
round-trip value assertions per op — at a tiny insecure point (n=256, as
the reference uses N=64..256) AND a production-shaped point (n=4096,
default 128-bit chain, ``util/globals.cpp:43``), which the reference
battery never exercises.  Contexts/keys are module-scoped so jit-compile
cost is paid once per (scheme, n).

Exactness: BFV/BGV assert exact slot values through every op; CKKS asserts
within a delta tied to the scale (tests/seal/ckks.cpp convention).
"""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def _mk(scheme, n):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    if n == 256:
        parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, 14).value)
        sec = SecurityLevel.NONE
    else:
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        if scheme != SchemeType.CKKS:
            parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
        sec = SecurityLevel.TC128
    ctx = SealContext(parms, True, sec)
    assert ctx.parameters_set, ctx.parameter_error_message()
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    # full default elt set (powers-of-two steps + conjugation, galois.cpp:106):
    # rotations by non-power steps then exercise the NAF fallback, and
    # complex_conjugate finds its elt — as the reference battery does
    gk = kg.create_galois_keys()
    env = {
        "ctx": ctx, "kg": kg, "rk": rk, "gk": gk,
        "enc": Encryptor(ctx, public_key=kg.create_public_key(), secret_key=kg.secret_key),
        "dec": Decryptor(ctx, kg.secret_key),
        "ev": Evaluator(ctx),
        "t": parms.plain_modulus.value if scheme != SchemeType.CKKS else None,
        "n": n,
    }
    return env


# -- module-scoped environments (compile once per scheme x n) ---------------

_ENVS = {}


def _env(scheme, n):
    key = (scheme, n)
    if key not in _ENVS:
        _ENVS[key] = _mk(scheme, n)
    return _ENVS[key]


@pytest.fixture(params=[256, 4096], ids=["n256", "n4096"])
def bfv(request):
    return _env(SchemeType.BFV, request.param)


@pytest.fixture(params=[256, 4096], ids=["n256", "n4096"])
def bgv(request):
    return _env(SchemeType.BGV, request.param)


@pytest.fixture(params=[256, 4096], ids=["n256", "n4096"])
def ckks(request):
    return _env(SchemeType.CKKS, request.param)


def _ints(env):
    n, t = env["n"], env["t"]
    return [(5 * i + 3) % min(t, 9999) for i in range(n)]


def _roundtrip(env, ct):
    be = BatchEncoder(env["ctx"])
    return be.decode(env["dec"].decrypt(ct))


# ---------------------------------------------------------------------------
# BFV / BGV exact batteries (shared op surface)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", [SchemeType.BFV, SchemeType.BGV], ids=["bfv", "bgv"])
@pytest.mark.parametrize("n", [256, 4096], ids=["n256", "n4096"])
def test_int_scheme_full_arith_chain(scheme, n):
    env = _env(scheme, n)
    ev, t, n = env["ev"], env["t"], env["n"]
    be = BatchEncoder(env["ctx"])
    a = _ints(env)
    b = [(2 * i + 1) % 101 for i in range(n)]
    pa, pb = be.encode(a), be.encode(b)
    ca = env["enc"].encrypt_symmetric(pa)
    cb = env["enc"].encrypt(pb)            # asymmetric path too

    # negate / add / sub / add_plain / sub_plain
    assert _roundtrip(env, ev.negate(ca)) == [(-x) % t for x in a]
    assert _roundtrip(env, ev.add(ca, cb)) == [(x + y) % t for x, y in zip(a, b)]
    assert _roundtrip(env, ev.sub(ca, cb)) == [(x - y) % t for x, y in zip(a, b)]
    assert _roundtrip(env, ev.add_plain(ca, pb)) == [(x + y) % t for x, y in zip(a, b)]
    assert _roundtrip(env, ev.sub_plain(ca, pb)) == [(x - y) % t for x, y in zip(a, b)]

    # add_many
    s = ev.add_many([ca, cb, ca])
    assert _roundtrip(env, s) == [(2 * x + y) % t for x, y in zip(a, b)]

    # multiply / square / relinearize
    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    rel = ev.relinearize(prod, env["rk"])
    assert rel.size == 2
    assert _roundtrip(env, rel) == [x * y % t for x, y in zip(a, b)]
    assert _roundtrip(env, ev.square(ca)) == [x * x % t for x in a]

    # multiply_plain (general + NTT-form plaintext path)
    assert _roundtrip(env, ev.multiply_plain(ca, pb)) == [x * y % t for x, y in zip(a, b)]

    # multiply_many / exponentiate (binary tree, BFV/BGV only) — depth 2:
    # the n=4096 default chain's noise budget (47 bits fresh, ~31/mult at
    # t=2^20, measured) is exhausted at depth 2, so exactness holds only on
    # the tiny point (the reference batteries also run these at N<=256)
    if n == 256:
        m3 = ev.multiply_many([ca, cb, ca], env["rk"])
        assert _roundtrip(env, m3) == [x * x * y % t for x, y in zip(a, b)]
        e3 = ev.exponentiate(ca, 3, env["rk"])
        assert _roundtrip(env, e3) == [pow(x, 3, t) for x in a]

    # mod switch with exactness + noise budget sanity
    ms = ev.mod_switch_to_next(rel)
    assert _roundtrip(env, ms) == [x * y % t for x, y in zip(a, b)]
    assert env["dec"].invariant_noise_budget(ms) > 0

    # mod_switch_to (target the last level)
    last = env["ctx"].last_parms_id
    ms2 = ev.mod_switch_to(ca, last)
    assert _roundtrip(env, ms2) == a


@pytest.mark.parametrize("scheme", [SchemeType.BFV, SchemeType.BGV], ids=["bfv", "bgv"])
@pytest.mark.parametrize("n", [256, 4096], ids=["n256", "n4096"])
def test_int_scheme_rotations(scheme, n):
    env = _env(scheme, n)
    ev, t, n = env["ev"], env["t"], env["n"]
    be = BatchEncoder(env["ctx"])
    a = _ints(env)
    ct = env["enc"].encrypt_symmetric(be.encode(a))
    half = n // 2
    av = np.array(a)

    r1 = _roundtrip(env, ev.rotate_rows(ct, 1, env["gk"]))
    exp1 = np.concatenate([np.roll(av[:half], -1), np.roll(av[half:], -1)]).tolist()
    assert r1 == exp1
    rm1 = _roundtrip(env, ev.rotate_rows(ct, -1, env["gk"]))
    expm1 = np.concatenate([np.roll(av[:half], 1), np.roll(av[half:], 1)]).tolist()
    assert rm1 == expm1
    # NAF fallback: step 3 = 4 - 1, composed from power-of-two keys
    r3 = _roundtrip(env, ev.rotate_rows(ct, 3, env["gk"]))
    exp3 = np.concatenate([np.roll(av[:half], -3), np.roll(av[half:], -3)]).tolist()
    assert r3 == exp3
    rc = _roundtrip(env, ev.rotate_columns(ct, env["gk"]))
    assert rc == np.concatenate([av[half:], av[:half]]).tolist()


def test_bfv_ntt_transform_roundtrip(bfv):
    env = bfv
    ev, t, n = env["ev"], env["t"], env["n"]
    be = BatchEncoder(env["ctx"])
    a = _ints(env)
    pb = be.encode([3] * n)
    ct = env["enc"].encrypt_symmetric(be.encode(a))
    ct_ntt = ev.transform_to_ntt(ct)
    assert ct_ntt.is_ntt_form
    # NTT-domain plain multiply (multiply_plain_ntt fast path)
    pt_ntt = ev.transform_plain_to_ntt(pb, ct.parms_id)
    prod = ev.multiply_plain(ct_ntt, pt_ntt)
    back = ev.transform_from_ntt(prod)
    assert _roundtrip(env, back) == [3 * x % t for x in a]


def test_bgv_mod_switch_chain_correction_factors(bgv):
    """Walk the whole chain; correction factors must compose so decrypt
    stays exact at every level (evaluator.cpp BGV mod-switch semantics)."""
    env = bgv
    ev, t = env["ev"], env["t"]
    be = BatchEncoder(env["ctx"])
    a = _ints(env)
    ct = env["enc"].encrypt_symmetric(be.encode(a))
    cf_seen = {ct.correction_factor}
    while env["ctx"].get_context_data(ct.parms_id).next_context_data is not None:
        ct = ev.mod_switch_to_next(ct)
        cf_seen.add(ct.correction_factor)
        assert _roundtrip(env, ct) == a
    assert len(cf_seen) > 1  # factors actually changed along the chain
    # adding two cts with different correction factors balances exactly
    ct0 = env["enc"].encrypt_symmetric(be.encode(a))
    ct1 = ev.mod_switch_to_next(ct0)
    ct0b = ev.mod_switch_to(ct0, ct1.parms_id)
    if ct0b.correction_factor != ct1.correction_factor:
        s = ev.add(ct0b, ct1)
        assert _roundtrip(env, s) == [2 * x % t for x in a]


def test_bfv_monomial_plain_fast_path(bfv):
    """multiply_plain by c*x^e hits the negacyclic monomial path
    (evaluator.cpp:2048-2096)."""
    env = bfv
    ev, t, n = env["ev"], env["t"], env["n"]
    from seal_tpu.data import Plaintext

    a_poly = Plaintext.from_hex("2x^1 + 1")
    ct = env["enc"].encrypt_symmetric(a_poly)
    mono = Plaintext.from_hex("3x^2")
    out = env["dec"].decrypt(ev.multiply_plain(ct, mono))
    assert out.to_string() == "6x^3 + 3x^2"


# ---------------------------------------------------------------------------
# CKKS battery (delta-bounded)
# ---------------------------------------------------------------------------

def test_ckks_full_chain(ckks):
    env = ckks
    from seal_tpu.ckks_encoder import CKKSEncoder

    ev, n = env["ev"], env["n"]
    encoder = CKKSEncoder(env["ctx"])
    scale = 2.0 ** 30 if n == 256 else 2.0 ** 30
    rng = np.random.default_rng(n)
    a = rng.uniform(-2, 2, n // 2)
    b = rng.uniform(-2, 2, n // 2)
    pa, pb = encoder.encode(a, scale), encoder.encode(b, scale)
    ca = env["enc"].encrypt_symmetric(pa)
    cb = env["enc"].encrypt(pb)
    dec, tol = env["dec"], 1e-4

    def got(ct):
        return np.real(encoder.decode(dec.decrypt(ct)))

    assert np.allclose(got(ev.add(ca, cb)), a + b, atol=tol)
    assert np.allclose(got(ev.sub(ca, cb)), a - b, atol=tol)
    assert np.allclose(got(ev.negate(ca)), -a, atol=tol)
    assert np.allclose(got(ev.add_plain(ca, pb)), a + b, atol=tol)

    prod = ev.rescale_to_next(ev.relinearize(ev.multiply(ca, cb), env["rk"]))
    assert np.allclose(got(prod), a * b, atol=1e-2)
    sq = ev.rescale_to_next(ev.relinearize(ev.square(ca), env["rk"]))
    assert np.allclose(got(sq), a * a, atol=1e-2)
    mp = ev.rescale_to_next(ev.multiply_plain(ca, pb))
    assert np.allclose(got(mp), a * b, atol=1e-2)

    # rotations + conjugate: key-switch noise scales with q_special/scale,
    # ~2e-4 at scale 2^30 on the n=4096 chain — bound at 1e-3 (the
    # reference's CKKS batteries likewise use op-dependent deltas)
    ks_tol = 1e-3
    assert np.allclose(got(ev.rotate_vector(ca, 1, env["gk"])), np.roll(a, -1), atol=ks_tol)
    conj = ev.complex_conjugate(ca, env["gk"])
    cvals = encoder.decode(dec.decrypt(conj))
    assert np.allclose(np.real(cvals), a, atol=ks_tol)

    # drop-variant mod switch preserves values
    dropped = ev.mod_switch_to_next(ca)
    assert np.allclose(got(dropped), a, atol=tol)

    # rescale_to / mod_reduce_to across two levels
    if len(env["ctx"].first_context_data().coeff_modulus_values) >= 3:
        two_down = ev.mod_reduce_to(
            ca, env["ctx"].get_context_data(dropped.parms_id).next_context_data.parms_id)
        assert np.allclose(got(two_down), a, atol=tol)


def test_ckks_scale_management(ckks):
    env = ckks
    from seal_tpu.ckks_encoder import CKKSEncoder

    ev, n = env["ev"], env["n"]
    encoder = CKKSEncoder(env["ctx"])
    scale = 2.0 ** 30
    a = np.linspace(-1, 1, n // 2)
    ca = env["enc"].encrypt_symmetric(encoder.encode(a, scale))
    prod = ev.multiply(ca, ca)
    assert prod.scale == pytest.approx(scale * scale)
    res = ev.rescale_to_next(ev.relinearize(prod, env["rk"]))
    last_prime = env["ctx"].get_context_data(ca.parms_id).coeff_modulus_values[-1]
    assert res.scale == pytest.approx(scale * scale / last_prime)
