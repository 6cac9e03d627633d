"""Legacy-compat uniform samplers (SEAL 3.4 / 3.5 seeded-ciphertext
expansion) pinned byte-for-byte against vectors produced by the reference
library (util/rlwe.cpp:134-188 via tools/wire_compat/
gen_legacy_sampler_vectors.cpp, fixed blake2xb seed)."""

import os
import struct

import numpy as np
import pytest

from seal_tpu.random.prng import Blake2xbPRNG
from seal_tpu.random.sampler import (
    sample_poly_uniform_seal_3_4,
    sample_poly_uniform_seal_3_5,
)

WIRE = os.path.join(os.path.dirname(__file__), "data", "wire")
SEED = (0x5EA1, 1, 2, 3, 4, 5, 6, 7)
N = 64


def _moduli():
    path = os.path.join(WIRE, "legacy_uniform_moduli.txt")
    if not os.path.exists(path):
        pytest.skip("legacy sampler vectors not generated")
    with open(path) as f:
        return [int(line) for line in f if line.strip()]


def _vector(name):
    with open(os.path.join(WIRE, name), "rb") as f:
        raw = f.read()
    return np.frombuffer(raw, dtype="<u8").copy()


@pytest.mark.parametrize(
    "sampler,vec",
    [
        (sample_poly_uniform_seal_3_4, "legacy_uniform_3_4.bin"),
        (sample_poly_uniform_seal_3_5, "legacy_uniform_3_5.bin"),
    ],
)
def test_legacy_uniform_matches_reference(sampler, vec):
    moduli = _moduli()
    expected = _vector(vec).reshape(len(moduli), N)
    got = sampler(Blake2xbPRNG(SEED), N, moduli)
    np.testing.assert_array_equal(got, expected)


def test_legacy_variants_differ_from_modern():
    """The three variants consume the stream differently — a regression
    guard that the dispatch in ciphertext_load actually matters."""
    from seal_tpu.random.sampler import sample_poly_uniform

    moduli = _moduli()
    a = sample_poly_uniform(Blake2xbPRNG(SEED), N, moduli)
    b = sample_poly_uniform_seal_3_4(Blake2xbPRNG(SEED), N, moduli)
    c = sample_poly_uniform_seal_3_5(Blake2xbPRNG(SEED), N, moduli)
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(b, c)


def test_rejection_path_3_4():
    """With a modulus close to 2^63 the 3.4 sampler's 63-bit attempts get
    rejected often enough to exercise the redraw path; determinism and
    range are what we can assert without a reference vector."""
    q = (1 << 60) - 257  # large modulus -> max_multiple leaves a visible gap
    out1 = sample_poly_uniform_seal_3_4(Blake2xbPRNG(SEED), 256, [q])
    out2 = sample_poly_uniform_seal_3_4(Blake2xbPRNG(SEED), 256, [q])
    np.testing.assert_array_equal(out1, out2)
    assert int(out1.max()) < q
