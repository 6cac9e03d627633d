"""Noise-distribution / PRNG configuration surface.

Runtime analog of the reference's SEAL_NOISE_SAMPLER /
SEAL_USE_GAUSSIAN_NOISE / SEAL_DEFAULT_PRNG build options
(CMakeLists.txt:298-305): both noise flavors and both PRNGs must be
reachable from EncryptionParameters and produce working encryptions.
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
from seal_tpu.random import PRNGType, UniformRandomGeneratorFactory


def _ctx(noise="cbd", prng=PRNGType.BLAKE2XB, n=128):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(n, 17))
    parms.set_random_generator(UniformRandomGeneratorFactory(prng, (13,) * 8))
    parms.set_noise_sampler(noise)
    return SealContext(parms, True, SecurityLevel.NONE)


@pytest.mark.parametrize("noise", ["cbd", "gaussian"])
@pytest.mark.parametrize("prng", [PRNGType.BLAKE2XB, PRNGType.SHAKE256])
def test_noise_and_prng_roundtrip(noise, prng):
    ctx = _ctx(noise, prng)
    kg = KeyGenerator(ctx)
    rk = kg.create_relin_keys()
    enc = Encryptor(ctx, public_key=kg.create_public_key(), secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    be = BatchEncoder(ctx)
    t = ctx.first_context_data().parms.plain_modulus.value
    vals = np.arange(128, dtype=np.uint64) % np.uint64(t)
    for ct in (enc.encrypt(be.encode(vals)), enc.encrypt_symmetric(be.encode(vals))):
        prod = ev.relinearize(ev.multiply(ct, ct), rk)
        got = np.asarray(be.decode(dec.decrypt(prod)), dtype=np.uint64)
        np.testing.assert_array_equal(got, vals * vals % np.uint64(t))


def test_gaussian_noise_actually_differs_from_cbd():
    """Same seed, different samplers -> different ciphertexts (the knob is
    actually wired through, not silently ignored)."""
    from seal_tpu.ops import u64 as U

    cts = []
    for noise in ("cbd", "gaussian"):
        ctx = _ctx(noise)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, secret_key=kg.secret_key)
        be = BatchEncoder(ctx)
        cts.append(U.to_np_u64(enc.encrypt_symmetric(be.encode([1, 2, 3])).data))
    assert not np.array_equal(cts[0], cts[1])


def test_invalid_noise_sampler_rejected():
    parms = EncryptionParameters(SchemeType.BFV)
    with pytest.raises(ValueError):
        parms.set_noise_sampler("uniform")
