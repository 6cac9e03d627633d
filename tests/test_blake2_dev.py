"""Device blake2xb XOF + samplers: byte parity with the native C path.

The device expansion (ops/blake2_dev.py) must produce byte-identical
streams to native/blake2.c (itself wire-verified against the reference's
vendored blake2xb), and the device samplers must match the host samplers
(random/sampler.py) draw for draw — including the sequential rejection
redraws of sample_poly_uniform.
"""

import struct

import numpy as np
import pytest

import jax

from seal_tpu import native, numth
from seal_tpu.ops import blake2_dev as B
from seal_tpu.ops import u64 as U
from seal_tpu.random.prng import Blake2xbPRNG
from seal_tpu.random.sampler import sample_poly_cbd, sample_poly_uniform

SEEDS = [tuple(range(1, 9)), tuple(range(101, 109))]
SEED_NP = np.array(SEEDS, dtype=np.uint64)


def _prime_near(x, two_n):
    c = x - (x % two_n) + 1
    while not numth.is_prime(c):
        c -= two_n
    return c


def test_expand_stream_words_byte_exact():
    sw = U.from_np_u64(SEED_NP)
    nwords = 1200  # crosses buffer boundaries; exercises the scan chunking
    got = U.to_np_u64(
        jax.jit(lambda s: B.expand_stream_words(s, nwords, chunk_buffers=2))(sw)
    )
    for i, s in enumerate(SEEDS):
        ref = np.frombuffer(
            native.blake2xb_fill(nwords * 8, 0, struct.pack("<8Q", *s)), dtype="<u8"
        )
        np.testing.assert_array_equal(got[i], ref)


def test_cbd_noise_parity():
    n = 512
    sw = U.from_np_u64(SEED_NP)
    w = B.expand_stream_words(sw, (64 + 6 * n + 7) // 8)
    got = np.asarray(B.cbd_noise_from_words(w, n, skip_bytes=64))
    for i, s in enumerate(SEEDS):
        prng = Blake2xbPRNG(s)
        prng.generate(64)  # the bootstrap seed draw precedes the noise
        ref = sample_poly_cbd(prng, n, [97])
        lifted = np.where(got[i] < 0, 97 + got[i], got[i]).astype(np.uint64)
        np.testing.assert_array_equal(ref[0], lifted)


@pytest.mark.parametrize(
    "moduli_kind", ["default61", "high_rejection", "mixed"]
)
def test_uniform_rejection_parity(moduli_kind):
    """Byte-exact incl. the per-limb sequential redraw semantics."""
    n = 512
    if moduli_kind == "default61":
        moduli = tuple(numth.get_primes(2 * 4096, 61, 3))
    elif moduli_kind == "high_rejection":
        # rho ~ 1/16: forces the lax.cond fix-up path and multi-limb
        # stream-offset chaining
        moduli = (
            _prime_near(3 << 60, 2 * n),
            _prime_near((3 << 60) - (1 << 55), 2 * n),
        )
    else:
        moduli = (
            _prime_near((1 << 30) + (1 << 29), 2 * n),
            _prime_near(3 << 60, 2 * n),
        )
    sw = U.from_np_u64(SEED_NP)
    vals, ovf = jax.jit(lambda s: B.uniform_from_seed_words(s, n, moduli))(sw)
    assert not np.any(np.asarray(ovf))
    got = U.to_np_u64(vals)
    for i, s in enumerate(SEEDS):
        ref = sample_poly_uniform(Blake2xbPRNG(s), n, moduli)
        np.testing.assert_array_equal(got[i], ref)


def test_lift_signed():
    vals = np.array([[0, 1, -1, 24, -24]], dtype=np.int32)
    moduli = [97, 193]
    out = U.to_np_u64(B.lift_signed(vals, moduli))
    expect = np.stack(
        [np.where(vals[0] < 0, q + vals[0], vals[0]).astype(np.uint64) for q in moduli]
    )
    np.testing.assert_array_equal(out[0], expect)


def test_device_vs_host_kswitch_keygen_byte_identical():
    """The batched device keygen equals the sequential host path bit for
    bit (and both equal the reference construction, pinned separately by
    tests/test_wire_compat.py)."""
    import os

    from seal_tpu.context import SealContext
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.random import PRNGType, UniformRandomGeneratorFactory

    n = 128
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(n, 17))
    parms.set_random_generator(
        UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, (7,) * 8)
    )
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    old = os.environ.get("SEAL_TPU_DEVICE_SAMPLING")
    try:
        os.environ["SEAL_TPU_DEVICE_SAMPLING"] = "1"
        dev = kg.create_relin_keys(save_seed=True)
        os.environ["SEAL_TPU_DEVICE_SAMPLING"] = "0"
        host = kg.create_relin_keys(save_seed=True)
    finally:
        if old is None:
            os.environ.pop("SEAL_TPU_DEVICE_SAMPLING", None)
        else:
            os.environ["SEAL_TPU_DEVICE_SAMPLING"] = old
    kd, kh = dev.keys[0], host.keys[0]
    np.testing.assert_array_equal(U.to_np_u64(kd["c0"]), U.to_np_u64(kh["c0"]))
    np.testing.assert_array_equal(U.to_np_u64(kd["c1"]), U.to_np_u64(kh["c1"]))
    assert [s.seed for s in kd["seeds"]] == [s.seed for s in kh["seeds"]]
