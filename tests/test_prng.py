"""PRNG parity tests: vectors generated from the reference's vendored
blake2xb.c (compiled separately; see values below) and stream semantics."""

import hashlib
import struct

from seal_tpu.native import blake2b, blake2xb, blake2xb_fill
from seal_tpu.random.prng import Blake2xbPRNG, Shake256PRNG, UniformRandomGeneratorInfo, PRNGType

# Vectors produced by the reference's blake2xb with:
#   key = bytes((i*7+1) & 0xFF for i in range(64)); input = LE64(42); outlen = 4096
REF_B2X_FIRST32 = "3d4bd3c09529ce68a4b160a7a19bfdb5aa520448e6fff303c1b321e53e2ff52c"
REF_B2X_LAST32 = "2fc795b4332f3cceaadf0086f3a05472e44b68f8bd27c882d876bfc67e29f1ad"
# blake2b-256 over LE64 words [1, 64, 0xffffee001, 65537] (a parms_id preimage)
REF_B2B_PARMS = "702945c7c749d3cffd143557f640d2f0cb2de8e5d5c9c6460b66c7e1cd1d197f"


def test_blake2b_matches_hashlib_and_reference():
    data = struct.pack("<4Q", 1, 64, 0xFFFFEE001, 65537)
    assert blake2b(32, data).hex() == REF_B2B_PARMS
    assert blake2b(32, data) == hashlib.blake2b(data, digest_size=32).digest()
    # keyed
    key = b"k" * 32
    assert blake2b(64, b"abc", key) == hashlib.blake2b(b"abc", digest_size=64, key=key).digest()


def test_blake2xb_reference_vectors():
    key = bytes((i * 7 + 1) & 0xFF for i in range(64))
    out = blake2xb(4096, struct.pack("<Q", 42), key)
    assert out[:32].hex() == REF_B2X_FIRST32
    assert out[4064:].hex() == REF_B2X_LAST32


def test_blake2xb_fill_counter_mode():
    seed = bytes(range(64))
    stream = blake2xb_fill(8192, 0, seed)
    b0 = blake2xb(4096, struct.pack("<Q", 0), seed)
    b1 = blake2xb(4096, struct.pack("<Q", 1), seed)
    assert stream == b0 + b1


def test_prng_stream_and_info():
    seed = tuple(range(8))
    p = Blake2xbPRNG(seed)
    a = p.generate(10)
    b = p.generate(5000)
    p2 = Blake2xbPRNG(seed)
    assert p2.generate(5010) == a + b
    info = p.info()
    assert info.prng_type == PRNGType.BLAKE2XB and info.seed == seed
    data = info.save_members()
    assert UniformRandomGeneratorInfo.load_members(data) == info


def test_shake_prng():
    seed = tuple(range(8))
    p = Shake256PRNG(seed)
    out = p.generate(100)
    want = hashlib.shake_256(struct.pack("<8Q", *seed) + struct.pack("<Q", 0)).digest(4096)[:100]
    assert out == want
