"""Plaintext-operand battery across NTT domains and levels: the
transform_plain_to_ntt / multiply_plain(_ntt) / add_plain / plain
mod-switch surface the reference exercises throughout evaluator.cpp's
multiply_plain and transform sections — asserted exactly against the
Z_t[x]/(x^N+1) model at several levels, for all three schemes' domain
conventions (BFV coeff, BGV/CKKS NTT)."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def p_mul(a, b, t):
    n = len(a)
    full = np.convolve(a.astype(object), b.astype(object))
    out = np.zeros(n, dtype=object)
    for k, c in enumerate(full):
        if k < n:
            out[k] += c
        else:
            out[k - n] -= c
    return (out % t).astype(object)


def _mk(scheme, n=64, bits=(40, 40, 40), t_bits=17):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(bits)))
    parms.set_plain_modulus(PlainModulus.batching(n, t_bits))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    return {
        "n": n,
        "t": parms.plain_modulus.value,
        "ctx": ctx,
        "kg": kg,
        "enc": Encryptor(ctx, secret_key=kg.secret_key),
        "dec": Decryptor(ctx, kg.secret_key),
        "ev": Evaluator(ctx),
    }


@pytest.fixture(scope="module", params=[SchemeType.BFV, SchemeType.BGV],
                ids=["bfv", "bgv"])
def env(request):
    return _mk(request.param)


def _pt(coeffs, t):
    return Plaintext.from_coeffs(
        np.asarray([int(c) % int(t) for c in coeffs], dtype=np.uint64)
    )


def _full(pt, n):
    out = np.zeros(n, dtype=object)
    c = np.asarray(pt.coeff_data, dtype=np.uint64)
    out[: len(c)] = c.astype(object)
    return out


def test_multiply_plain_dense_every_level(env):
    """multiply_plain at the first level and after each mod switch must stay
    exact (the plain operand is lifted at the ciphertext's own level)."""
    n, t, ev = env["n"], env["t"], env["ev"]
    rng = np.random.default_rng(3)
    a = rng.integers(0, t, n).astype(object)
    p = rng.integers(0, t, n).astype(object)
    ct = env["enc"].encrypt_symmetric(_pt(a, t))
    want = p_mul(a, p, t)
    while True:
        out = ev.multiply_plain(ct, _pt(p, t))
        assert np.array_equal(_full(env["dec"].decrypt(out), n), want)
        cd = env["ctx"].get_context_data(ct.parms_id)
        if cd.next_context_data is None:
            break
        ct = ev.mod_switch_to_next(ct)


def test_multiply_plain_ntt_pretransformed(env):
    """BFV: transform ct and plain to NTT, multiply in the NTT domain,
    transform back — must equal the coeff-domain multiply_plain exactly.
    (reference multiply_plain_ntt, evaluator.cpp)"""
    if env["ctx"].first_context_data().parms.scheme != SchemeType.BFV:
        pytest.skip("explicit transform is the BFV flow; BGV is NTT-native")
    n, t, ev = env["n"], env["t"], env["ev"]
    rng = np.random.default_rng(5)
    a = rng.integers(0, t, n).astype(object)
    p = rng.integers(0, t, n).astype(object)
    ct = env["enc"].encrypt_symmetric(_pt(a, t))
    ref = ev.multiply_plain(ct, _pt(p, t))
    ct_ntt = ev.transform_to_ntt(ct)
    p_ntt = ev.transform_plain_to_ntt(_pt(p, t), ct.parms_id)
    out = ev.transform_from_ntt(ev.multiply_plain(ct_ntt, p_ntt))
    d_ref = _full(env["dec"].decrypt(ref), n)
    d_out = _full(env["dec"].decrypt(out), n)
    assert np.array_equal(d_ref, d_out)
    assert np.array_equal(d_out, p_mul(a, p, t))


def test_multiply_plain_monomial_matches_dense(env):
    """The monomial fast path (single nonzero coefficient) must be
    bit-identical to the general dense path for every monomial degree class:
    constant, mid, and top coefficient."""
    n, t, ev = env["n"], env["t"], env["ev"]
    rng = np.random.default_rng(7)
    a = rng.integers(0, t, n).astype(object)
    ct = env["enc"].encrypt_symmetric(_pt(a, t))
    for deg, coef in [(0, 5), (n // 2, 3), (n - 1, int(t) - 1)]:
        mono = np.zeros(n, dtype=object)
        mono[deg] = coef
        out = ev.multiply_plain(ct, _pt(mono[: deg + 1], t))
        assert np.array_equal(
            _full(env["dec"].decrypt(out), n), p_mul(a, mono, t)
        ), f"monomial x^{deg}*{coef}"


def test_add_sub_plain_every_level(env):
    n, t, ev = env["n"], env["t"], env["ev"]
    rng = np.random.default_rng(11)
    a = rng.integers(0, t, n).astype(object)
    p = rng.integers(0, t, n).astype(object)
    ct = env["enc"].encrypt_symmetric(_pt(a, t))
    while True:
        got_add = _full(env["dec"].decrypt(ev.add_plain(ct, _pt(p, t))), n)
        got_sub = _full(env["dec"].decrypt(ev.sub_plain(ct, _pt(p, t))), n)
        assert np.array_equal(got_add, (a + p) % t)
        assert np.array_equal(got_sub, (a - p) % t)
        cd = env["ctx"].get_context_data(ct.parms_id)
        if cd.next_context_data is None:
            break
        ct = ev.mod_switch_to_next(ct)


def test_plain_mod_switch_tracks_ciphertext(env):
    """mod_switch_plain_to must produce a plaintext usable at the target
    level with unchanged semantics (reference mod_switch_to for plain —
    NTT-form plaintexts carry a parms_id)."""
    n, t, ev = env["n"], env["t"], env["ev"]
    if env["ctx"].first_context_data().parms.scheme != SchemeType.BFV:
        pytest.skip("plain NTT-form switch exercised through the BFV flow")
    rng = np.random.default_rng(13)
    a = rng.integers(0, t, n).astype(object)
    p = rng.integers(0, t, n).astype(object)
    ct = ev.mod_switch_to_next(env["enc"].encrypt_symmetric(_pt(a, t)))
    p_ntt = ev.transform_plain_to_ntt(_pt(p, t), env["ctx"].first_context_data().parms_id)
    p_sw = ev.mod_switch_plain_to(p_ntt, ct.parms_id)
    out = ev.multiply_plain(ev.transform_to_ntt(ct), p_sw)
    got = _full(env["dec"].decrypt(ev.transform_from_ntt(out)), n)
    assert np.array_equal(got, p_mul(a, p, t))


def test_multiply_plain_zero_is_transparent(env):
    """A zero plaintext would produce a transparent ciphertext; the default
    evaluator must refuse (reference throws 'result ciphertext is
    transparent')."""
    n, t, ev = env["n"], env["t"], env["ev"]
    ct = env["enc"].encrypt_symmetric(_pt([1, 2, 3], t))
    with pytest.raises(ValueError):
        ev.multiply_plain(ct, _pt([0], t))


def test_transform_guards(env):
    """Double transforms and wrong-form plain ops must be rejected without
    mutating the operand."""
    if env["ctx"].first_context_data().parms.scheme != SchemeType.BFV:
        pytest.skip("BFV transform guards")
    n, t, ev = env["n"], env["t"], env["ev"]
    ct = env["enc"].encrypt_symmetric(_pt([1, 2], t))
    ntt_ct = ev.transform_to_ntt(ct)
    with pytest.raises(ValueError):
        ev.transform_to_ntt(ntt_ct)
    with pytest.raises(ValueError):
        ev.transform_from_ntt(ct)
    # NTT-form ct x coeff-form plain is ALLOWED (the plain is lifted — the
    # reference's BGV-era multiply_plain branch); coeff-form ct x NTT-form
    # plain is ALSO allowed: the reference transforms the ciphertext to NTT,
    # multiplies, and transforms back (evaluator.cpp:2006-2010)
    out = ev.multiply_plain(ntt_ct, _pt([1, 2, 3], t))
    assert out.is_ntt_form
    p_ntt = ev.transform_plain_to_ntt(_pt([1, 2, 3], t), ct.parms_id)
    out2 = ev.multiply_plain(ct, p_ntt)
    assert not out2.is_ntt_form
    ref = ev.multiply_plain(ct, _pt([1, 2, 3], t))
    assert env["dec"].decrypt(out2).to_string() == env["dec"].decrypt(ref).to_string()
