"""CKKS evaluation battery across several (N, chain) parameter points with
delta-bounded assertions tied to the scale, mirroring the reference's CKKS
Evaluator tests (tests/seal/evaluator.cpp:358-899 style: random vectors,
repeated ops, 0.5-ulp-at-scale tolerances)."""

import numpy as np
import pytest

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType

# scale matches the mid-chain prime size so rescale preserves precision,
# and scale^2 stays below the data-level modulus product
CONFIGS = [
    (64, [40, 30, 30, 40], 2.0**30),
    (128, [50, 30, 30, 50], 2.0**30),
    (256, [60, 40, 40, 60], 2.0**40),
]


@pytest.fixture(scope="module", params=CONFIGS, ids=lambda c: f"n{c[0]}")
def env(request):
    n, bits, scale = request.param
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    return {
        "n": n, "scale": scale, "ctx": ctx, "keygen": keygen,
        "rng": np.random.default_rng(n),
        "enc": Encryptor(ctx, public_key=keygen.create_public_key(), secret_key=keygen.secret_key),
        "dec": Decryptor(ctx, keygen.secret_key),
        "ev": Evaluator(ctx),
        "encoder": CKKSEncoder(ctx),
    }


def _enc(env, vals):
    return env["enc"].encrypt(env["encoder"].encode(vals, env["scale"]))


def _dec(env, ct):
    return np.asarray(env["encoder"].decode(env["dec"].decrypt(ct)))


def _tol(env):
    # decoded error is the RLWE noise over the working scale
    return max(512.0 / env["scale"], 1e-6)


def test_add_sub_negate(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-5, 5, slots)
    b = env["rng"].uniform(-5, 5, slots)
    ca, cb = _enc(env, a), _enc(env, b)
    assert np.allclose(_dec(env, env["ev"].add(ca, cb)).real, a + b, atol=_tol(env))
    assert np.allclose(_dec(env, env["ev"].sub(ca, cb)).real, a - b, atol=_tol(env))
    assert np.allclose(_dec(env, env["ev"].negate(ca)).real, -a, atol=_tol(env))


def test_complex_values(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-2, 2, slots) + 1j * env["rng"].uniform(-2, 2, slots)
    ca = _enc(env, a)
    got = _dec(env, ca)
    assert np.allclose(got, a, atol=_tol(env))


def test_multiply_relin_rescale_chain(env):
    slots = env["n"] // 2
    rlk = env["keygen"].create_relin_keys()
    a = env["rng"].uniform(-1, 1, slots)
    b = env["rng"].uniform(-1, 1, slots)
    ca, cb = _enc(env, a), _enc(env, b)
    prod = env["ev"].rescale_to_next(env["ev"].relinearize(env["ev"].multiply(ca, cb), rlk))
    assert np.allclose(_dec(env, prod).real, a * b, atol=1e-3)
    # one more multiply at the lower level against a mod-switched operand
    # (only when the remaining modulus has room for scale^2)
    import math

    lower_cd = env["ctx"].get_context_data(prod.parms_id)
    if lower_cd.total_coeff_modulus_bit_count > 2 * math.log2(prod.scale) + 1:
        cc = _enc(env, a)
        cc = env["ev"].mod_switch_to(cc, prod.parms_id)
        cc.scale = prod.scale
        prod2 = env["ev"].rescale_to_next(env["ev"].relinearize(env["ev"].multiply(prod, cc), rlk))
        assert np.allclose(_dec(env, prod2).real, a * a * b, atol=1e-2)


def test_square_matches_multiply(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-1, 1, slots)
    ca = _enc(env, a)
    sq = _dec(env, env["ev"].square(ca))
    mu = _dec(env, env["ev"].multiply(ca, ca.copy()))
    np.testing.assert_allclose(sq, mu, atol=0)  # bit-identical paths


def test_multiply_plain_and_add_plain(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-2, 2, slots)
    b = env["rng"].uniform(-2, 2, slots)
    ca = _enc(env, a)
    pb = env["encoder"].encode(b, env["scale"])
    pb_dev = env["ev"].transform_plain_to_ntt(pb, ca.parms_id) if not pb.is_ntt_form else pb
    prod = env["ev"].multiply_plain(ca, pb_dev)
    assert np.allclose(_dec(env, prod).real, a * b, atol=1e-3)
    added = env["ev"].add_plain(ca, pb_dev)
    assert np.allclose(_dec(env, added).real, a + b, atol=_tol(env))


def test_rotate_and_conjugate_battery(env):
    slots = env["n"] // 2
    gk = env["keygen"].create_galois_keys()
    a = env["rng"].uniform(-1, 1, slots) + 1j * env["rng"].uniform(-1, 1, slots)
    ca = _enc(env, a)
    for steps in (1, 2, slots // 2, -1):
        rot = env["ev"].rotate_vector(ca, steps, gk)
        assert np.allclose(_dec(env, rot), np.roll(a, -steps), atol=1e-4), steps
    conj = env["ev"].complex_conjugate(ca, gk)
    assert np.allclose(_dec(env, conj), np.conj(a), atol=1e-4)


def test_mod_switch_drop_preserves_values(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-3, 3, slots)
    ca = _enc(env, a)
    dropped = env["ev"].mod_switch_to_next(ca)
    assert dropped.parms_id != ca.parms_id
    assert np.allclose(_dec(env, dropped).real, a, atol=_tol(env))


def test_scalar_and_int_encode(env):
    slots = env["n"] // 2
    a = env["rng"].uniform(-2, 2, slots)
    ca = _enc(env, a)
    # scalar double encode fills all slots
    p5 = env["encoder"].encode(2.5, parms_id=ca.parms_id, scale=env["scale"])
    out = env["ev"].add_plain(ca, p5)
    assert np.allclose(_dec(env, out).real, a + 2.5, atol=_tol(env))
    # int64 encode is exact, scale 1
    p_int = env["encoder"].encode_int(3, parms_id=ca.parms_id)
    prod = env["ev"].multiply_plain(ca, p_int)
    assert np.allclose(_dec(env, prod).real, 3 * a, atol=3 * _tol(env))
