"""Exact-value parity vectors taken from the reference's own unit tests
(``native/tests/seal/util/ntt.cpp``) — pins root selection, table ordering
and the transform itself to the reference bit-for-bit."""

import numpy as np

from seal_tpu import numth
from seal_tpu.modulus import Modulus
from seal_tpu.ntt_tables import HostNTTTables, build_limb_tables
from seal_tpu.ops import ntt as NTT
from seal_tpu.ops import u64 as U

Q = 0xFFFFFFFFFFC0001


def test_ntt_primitive_roots_reference_vectors():
    # NTTTablesTest.NTTPrimitiveRootsTest
    tab = HostNTTTables(1, Modulus(Q))
    assert tab.root_powers[0] == 1
    assert tab.root_powers[1] == 288794978602139552
    inv = numth.invert_mod(288794978602139552, Q)
    assert tab.inv_root_powers[1] == inv

    tab = HostNTTTables(2, Modulus(Q))
    assert tab.root_powers[0] == 1
    assert tab.root_powers[1] == 288794978602139552
    assert tab.root_powers[2] == 178930308976060547
    assert tab.root_powers[3] == 748001537669050592


def test_negacyclic_ntt_reference_vectors():
    # NTTTablesTest.NegacyclicNTTTest
    t = build_limb_tables(1, [Modulus(Q)])

    def fwd(vals):
        x = U.from_np_u64(np.array([vals], dtype=np.uint64))
        return [int(v) for v in U.to_np_u64(NTT.ntt_forward(x, t))[0]]

    assert fwd([0, 0]) == [0, 0]
    assert fwd([1, 0]) == [1, 1]
    assert fwd([1, 1]) == [288794978602139553, 864126526004445282]


def test_inverse_ntt_roundtrip_reference_style():
    # NTTTablesTest.InverseNegacyclicNTTTest (roundtrip over random poly)
    t = build_limb_tables(3, [Modulus(Q)])
    rng = np.random.default_rng(0x5EA1)
    vals = rng.integers(0, Q, 8, dtype=np.uint64)
    x = U.from_np_u64(vals[None, :])
    out = U.to_np_u64(NTT.ntt_inverse(NTT.ntt_forward(x, t), t))[0]
    assert (out == vals).all()


def test_get_prime_matches_reference_search():
    # get_prime(4, 60) used by the reference's NTTBasics test must be the
    # deterministic descending-search result
    p = numth.get_primes(4, 60, 1)[0]
    assert p % 4 == 1 and numth.is_prime(p) and p.bit_length() == 60
    # primes returned in strictly descending order
    ps = numth.get_primes(8, 50, 3)
    assert ps == sorted(ps, reverse=True)
