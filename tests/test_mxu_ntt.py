"""Four-step MXU NTT: bit-exact parity with the staged-butterfly kernel.

The matmul kernel must be indistinguishable (same values, same NTT form) from
``ops/ntt.py``'s staged butterflies, which are themselves parity-tested
against the reference's Harvey NTT vectors (test_reference_vectors.py).
"""

import numpy as np
import pytest

from seal_tpu import numth
from seal_tpu.modulus import CoeffModulus, Modulus
from seal_tpu.ntt_tables import build_limb_tables, build_mxu_tables
from seal_tpu.ops import mxu_ntt as M
from seal_tpu.ops import ntt as NTT
from seal_tpu.ops import u64 as U


def _rand_limbs(mods, n, rng, bound_mult=1):
    qv = np.array([m.value for m in mods], dtype=np.uint64)[:, None]
    vals = rng.integers(0, 1 << 62, (len(mods), n)).astype(np.uint64) % (
        qv * np.uint64(bound_mult)
    )
    return vals, qv


@pytest.mark.parametrize(
    "n,bits",
    [(256, [30, 40, 60]), (4096, [36, 36, 37]), (8192, [43, 43, 44, 44, 44])],
)
def test_mxu_forward_inverse_parity(n, bits):
    logn = n.bit_length() - 1
    mods = CoeffModulus.create(n, bits)
    lt = build_limb_tables(logn, mods)
    mt = build_mxu_tables(logn, mods)
    rng = np.random.default_rng(7)
    vals, _ = _rand_limbs(mods, n, rng)
    x = U.from_np_u64(vals)
    ref_f = U.to_np_u64(NTT.ntt_forward(x, lt))
    got_f = U.to_np_u64(M.mxu_ntt_forward(x, mt))
    np.testing.assert_array_equal(ref_f, got_f)
    xr = U.from_np_u64(ref_f)
    ref_i = U.to_np_u64(NTT.ntt_inverse(xr, lt))
    got_i = U.to_np_u64(M.mxu_ntt_inverse(xr, mt))
    np.testing.assert_array_equal(ref_i, got_i)
    np.testing.assert_array_equal(ref_i, vals)  # roundtrip


def test_mxu_61bit_aux_primes_split_contraction():
    """61-bit Bsk-style moduli force the chunked (overflow-safe) contraction
    whenever a contraction axis is 128 wide (128*(2^61)^2 > 2^128)."""
    n, logn = 8192, 13
    mods = [Modulus(p) for p in numth.get_primes(2 * n, 61, 2)]
    lt = build_limb_tables(logn, mods)
    mt = build_mxu_tables(logn, mods)
    assert mt.n2 == 128 and mt.kchunk_b == 64
    rng = np.random.default_rng(8)
    vals, _ = _rand_limbs(mods, n, rng)
    x = U.from_np_u64(vals)
    np.testing.assert_array_equal(
        U.to_np_u64(NTT.ntt_forward(x, lt)), U.to_np_u64(M.mxu_ntt_forward(x, mt))
    )
    f = U.from_np_u64(U.to_np_u64(NTT.ntt_forward(x, lt)))
    np.testing.assert_array_equal(
        U.to_np_u64(NTT.ntt_inverse(f, lt)), U.to_np_u64(M.mxu_ntt_inverse(f, mt))
    )


def test_mxu_accepts_lazy_domain_input():
    """Forward accepts the [0, 4q) lazy domain like ntt_negacyclic_harvey."""
    n, logn = 256, 8
    mods = CoeffModulus.create(n, [50, 50])
    lt = build_limb_tables(logn, mods)
    mt = build_mxu_tables(logn, mods)
    rng = np.random.default_rng(9)
    vals, qv = _rand_limbs(mods, n, rng, bound_mult=4)
    x = U.from_np_u64(vals)
    np.testing.assert_array_equal(
        U.to_np_u64(NTT.ntt_forward(x, lt)), U.to_np_u64(M.mxu_ntt_forward(x, mt))
    )


def test_mxu_batched_leading_dims():
    n, logn = 512, 9
    mods = CoeffModulus.create(n, [45, 46])
    lt = build_limb_tables(logn, mods)
    mt = build_mxu_tables(logn, mods)
    rng = np.random.default_rng(10)
    qv = np.array([m.value for m in mods], dtype=np.uint64)[None, :, None]
    vals = rng.integers(0, 1 << 62, (3, 2, n)).astype(np.uint64) % qv
    x = U.from_np_u64(vals)
    np.testing.assert_array_equal(
        U.to_np_u64(NTT.ntt_forward(x, lt)), U.to_np_u64(M.mxu_ntt_forward(x, mt))
    )


def test_dispatch_end_to_end_bfv(monkeypatch):
    """Force SEAL_TPU_NTT=mxu through the whole BFV pipeline: results must be
    bit-identical to the default path (fresh context so every op retraces)."""
    monkeypatch.setenv("SEAL_TPU_NTT", "mxu")
    from seal_tpu.context import SealContext
    from seal_tpu.decryptor import Decryptor
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.random import PRNGType, UniformRandomGeneratorFactory

    n = 128
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(n, 17))
    parms.set_random_generator(
        UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, (11,) * 8)
    )
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, public_key=kg.create_public_key(), secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)

    vals = np.arange(n, dtype=np.uint64) % parms.plain_modulus.value
    ct = enc.encrypt(be.encode(vals))
    ct2 = ev.multiply(ct, ct)
    ct2 = ev.relinearize(ct2, rk)
    out = np.asarray(be.decode(dec.decrypt(ct2)), dtype=np.uint64)
    expect = (vals * vals) % np.uint64(parms.plain_modulus.value)
    np.testing.assert_array_equal(out, expect)
