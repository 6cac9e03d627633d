"""Large-N existence proofs: n=16384 (k=9) and n=32768 (k=16) default chains.

The reference treats these sizes as first-class (default 128-bit chains at
``util/globals.cpp:57-71``, N<=131072 at ``util/defines.h:52``) and benches
every op there (``bench/bench.cpp:135-226``).  Round-2 review flagged that
nothing >=16384 was tested anywhere; these tests close that: full
keygen -> encrypt -> evaluate -> decrypt round trips on the real default
chains, plus NTT forward/inverse self-consistency at both sizes.

Runtime is kept sane with session-scoped contexts and one round-trip per
(scheme, size) rather than the full op battery (which runs at small N).
"""

import os

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def _context(scheme, n):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.bfv_default(n))  # k=9 / k=16 chains
    if scheme != SchemeType.CKKS:
        parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
    ctx = SealContext(parms, True, SecurityLevel.TC128)
    assert ctx.parameters_set, ctx.parameter_error_message()
    return ctx


@pytest.fixture(scope="module")
def bfv16384():
    ctx = _context(SchemeType.BFV, 16384)
    kg = KeyGenerator(ctx)
    return ctx, kg


def test_bfv_16384_chain_shape(bfv16384):
    ctx, _ = bfv16384
    cd = ctx.first_context_data()
    # default 128-bit chain at 16384: 9 primes total (globals.cpp:57-59),
    # first (data) level drops the special prime
    assert len(ctx.key_context_data().coeff_modulus_values) == 9
    assert len(cd.coeff_modulus_values) == 8


def test_bfv_16384_mul_relin_roundtrip(bfv16384):
    ctx, kg = bfv16384
    from seal_tpu.encoders import BatchEncoder

    n = 16384
    t = ctx.first_context_data().parms.plain_modulus.value
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    rk = kg.create_relin_keys()
    encoder = BatchEncoder(ctx)
    vals = [(3 * i + 1) % 1000 for i in range(n)]
    pt = encoder.encode(vals)
    ct = enc.encrypt_symmetric(pt)

    prod = ev.multiply(ct, ct)
    prod = ev.relinearize(prod, rk)
    prod = ev.mod_switch_to_next(prod)
    got = encoder.decode(dec.decrypt(prod))
    np.testing.assert_array_equal(got, [v * v % t for v in vals])
    assert dec.invariant_noise_budget(prod) > 0


def test_ckks_16384_square_rescale_roundtrip():
    n = 16384
    ctx = _context(SchemeType.CKKS, n)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    rk = kg.create_relin_keys()
    from seal_tpu.ckks_encoder import CKKSEncoder

    encoder = CKKSEncoder(ctx)
    scale = 2.0 ** 40
    rng = np.random.default_rng(5)
    vals = rng.uniform(-2, 2, n // 2)
    ct = enc.encrypt_symmetric(encoder.encode(vals, scale))
    sq = ev.rescale_to_next(ev.relinearize(ev.square(ct), rk))
    got = np.real(encoder.decode(dec.decrypt(sq)))
    assert np.max(np.abs(got - vals * vals)) < 1e-2


def test_bgv_32768_add_mul_plain_roundtrip():
    n = 32768
    ctx = _context(SchemeType.BGV, n)
    assert len(ctx.key_context_data().coeff_modulus_values) == 16  # globals.cpp:66-71
    kg = KeyGenerator(ctx)
    from seal_tpu.encoders import BatchEncoder

    t = ctx.first_context_data().parms.plain_modulus.value
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    encoder = BatchEncoder(ctx)
    vals = [(7 * i + 3) % 50000 for i in range(n)]
    pt = encoder.encode(vals)
    ct = enc.encrypt_symmetric(pt)
    out = ev.multiply_plain(ev.add(ct, ct), pt)
    got = encoder.decode(dec.decrypt(out))
    np.testing.assert_array_equal(got, [2 * v * v % t for v in vals])


def test_ckks_32768_encode_encrypt_roundtrip():
    n = 32768
    ctx = _context(SchemeType.CKKS, n)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    from seal_tpu.ckks_encoder import CKKSEncoder

    encoder = CKKSEncoder(ctx)
    scale = 2.0 ** 40
    rng = np.random.default_rng(9)
    vals = rng.uniform(-1, 1, n // 2)
    ct = enc.encrypt_symmetric(encoder.encode(vals, scale))
    out = ev.add(ct, ct)
    got = np.real(encoder.decode(dec.decrypt(out)))
    assert np.max(np.abs(got - 2 * vals)) < 1e-4


@pytest.mark.parametrize("n", [16384, 32768])
def test_ntt_large_n_roundtrip(n):
    """Forward->inverse identity + linearity on the default chain's tables."""
    from seal_tpu.ntt_tables import build_limb_tables
    from seal_tpu.ops import ntt as NTT
    from seal_tpu.ops import u64 as U

    mods = CoeffModulus.bfv_default(n)[:2]
    tables = build_limb_tables(int(n).bit_length() - 1, mods)
    qv = np.array([m.value for m in mods], dtype=np.uint64)
    rng = np.random.default_rng(n)
    x = rng.integers(0, qv[:, None], (len(mods), n), dtype=np.uint64)
    xd = U.from_np_u64(x)
    fwd = NTT.ntt_forward(xd, tables)
    back = U.to_np_u64(NTT.ntt_inverse(fwd, tables))
    assert np.array_equal(back, x)
    # negacyclic convolution sanity: NTT(x) .* NTT(1) == NTT(x)
    one = np.zeros_like(x)
    one[:, 0] = 1
    fwd_one = U.to_np_u64(NTT.ntt_forward(U.from_np_u64(one), tables))
    assert np.all(fwd_one == 1)


def test_ckks_65536_single_chip_roundtrip():
    """N=65536 as a single-chip first-class size (util/defines.h:52 allows
    N<=131072): functional encrypt -> square -> rescale -> decrypt on a
    real (64-entry) chain prefix."""
    from seal_tpu.ckks_encoder import CKKSEncoder

    n = 65536
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [60, 40, 40, 60]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    ce = CKKSEncoder(ctx)
    vals = np.linspace(-1.0, 1.0, n // 2)
    ct = enc.encrypt_symmetric(ce.encode(vals, 2.0 ** 40))
    sq = ev.rescale_to_next(ev.multiply(ct, ct))
    got = np.real(ce.decode(dec.decrypt(sq)))
    assert np.max(np.abs(got - vals * vals)) < 1e-3


@pytest.mark.parametrize("n", [65536, 131072])
def test_ntt_htop_sizes_roundtrip(n):
    """NTT forward->inverse identity at 65536 and the N=131072 ceiling."""
    from seal_tpu.modulus import Modulus
    from seal_tpu import numth
    from seal_tpu.ntt_tables import build_limb_tables
    from seal_tpu.ops import ntt as NTT
    from seal_tpu.ops import u64 as U

    mods = [Modulus(p) for p in numth.get_primes(2 * n, 50, 1)]
    tables = build_limb_tables(int(n).bit_length() - 1, mods)
    qv = np.array([m.value for m in mods], dtype=np.uint64)
    rng = np.random.default_rng(n)
    x = rng.integers(0, qv[:, None], (1, n), dtype=np.uint64)
    xd = U.from_np_u64(x)
    back = U.to_np_u64(NTT.ntt_inverse(NTT.ntt_forward(xd, tables), tables))
    assert np.array_equal(back, x)


def test_131072_context_validates():
    """The N ceiling (util/defines.h:52) is accepted and builds a chain."""
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(131072)
    parms.set_coeff_modulus(CoeffModulus.create(131072, [50, 40, 50]))
    ctx = SealContext(parms, False, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()


@pytest.mark.skipif(
    not os.environ.get("SEAL_TPU_LARGE_N"),
    reason="~6 min of 131072-degree NTTs on a 2-core CPU; set "
    "SEAL_TPU_LARGE_N=1 (the CI large-n job does) or run on TPU",
)
def test_ckks_131072_full_roundtrip():
    """Full pipeline at the reference's MAX degree (defines.h:52):
    keygen (relin + Galois) -> encrypt -> multiply -> relinearize ->
    rotate -> decrypt -> decode.  This is where VMEM pressure is real on
    TPU: the staged Pallas NTT needs the balanced n1=512/n2=256
    factorization (ntt_tables.build_mxu_tables) and key-switch takes the
    staged path (pallas_switch_key.fits_fused).  k=2 ([60, 60]) keeps the
    CPU-mesh CI job tractable while still exercising key-switching; the
    richer k=4 chain runs on real TPU hardware in benchmarks/run_all.py
    (BENCH_DETAIL ckks_131072) and passed there end-to-end."""
    from seal_tpu.ckks_encoder import CKKSEncoder

    n = 131072
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [60, 40, 60]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    assert ctx.parameters_set, ctx.parameter_error_message()
    kg = KeyGenerator(ctx)
    rlk = kg.create_relin_keys()
    gk = kg.create_galois_keys_from_steps([1])
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    ce = CKKSEncoder(ctx)
    # scale 2^40: key-switch noise at this degree is ~n*sigma ~ 2^20
    # coefficients, so a 2^25-type scale would drown the rotation output
    scale = 2.0 ** 40
    vals = np.linspace(0.1, 1.0, n // 2)
    ct = enc.encrypt_symmetric(ce.encode(vals, scale))
    sq = ev.rescale_to_next(ev.relinearize(ev.multiply(ct, ct), rlk))
    got = np.real(ce.decode(dec.decrypt(sq)))
    assert np.max(np.abs(got - vals * vals)) < 1e-3
    rot = ev.rotate_vector(ct, 1, gk)
    gotr = np.real(ce.decode(dec.decrypt(rot)))
    assert np.max(np.abs(gotr[:-1] - vals[1:])) < 1e-4
