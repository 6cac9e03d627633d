"""Edge-value batteries for the u64-on-u32-lane kernels.

Mirrors the reference's hand-computed kernel tests
(native/tests/seal/util/uintarithsmallmod.cpp) with adversarial operand
classes instead of copied fixtures: extremes of the 61-bit modulus range,
lazy-domain inputs, accumulator boundaries — each checked against exact
Python-int arithmetic.
"""

import numpy as np
import pytest

import jax

from seal_tpu import numth
from seal_tpu.ops import u64 as U
from seal_tpu.rns_host import shoup_pair

M64 = (1 << 64) - 1


def _pairs(vals):
    return U.from_np_u64(np.array(vals, dtype=np.uint64))


def _ints(x):
    return [int(v) for v in U.to_np_u64(x)]


# operand classes: tiny, powers of two, alternating bits, near 2^32
# boundaries (lane seams), near 2^61 / 2^63 / 2^64 extremes
EDGE_VALUES = [
    0, 1, 2, 3,
    0xFFFF, 0x10000, 0x7FFFFFFF, 0x80000000, 0xFFFFFFFF, 0x100000000,
    0x5555555555555555, 0xAAAAAAAAAAAAAAAA,
    (1 << 61) - 1, 1 << 61, (1 << 62) - 1, (1 << 63) - 1, 1 << 63,
    M64 - 1, M64,
]

MODULI = [
    3, 257, 65537,
    (1 << 30) + 0x35,            # not near a power of two
    0x7FFFFFFFE0001,             # 51-bit NTT prime shape
    (1 << 60) - 0x11FF7,         # near-2^60
    2305843009213693951,         # 2^61 - 1 (Mersenne, largest internal-ish)
]


def test_add_sub_mul_wide_edges():
    a = EDGE_VALUES
    b = list(reversed(EDGE_VALUES))
    xa, xb = _pairs(a), _pairs(b)
    np.testing.assert_array_equal(
        U.to_np_u64(jax.jit(U.add64)(xa, xb)),
        np.array([(x + y) & M64 for x, y in zip(a, b)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        U.to_np_u64(jax.jit(U.sub64)(xa, xb)),
        np.array([(x - y) & M64 for x, y in zip(a, b)], dtype=np.uint64),
    )
    w = jax.jit(U.mul64_wide)(xa, xb)
    got = [
        int(w[0][i]) | (int(w[1][i]) << 32) | (int(w[2][i]) << 64) | (int(w[3][i]) << 96)
        for i in range(len(a))
    ]
    assert got == [x * y for x, y in zip(a, b)]
    np.testing.assert_array_equal(
        U.to_np_u64(jax.jit(U.mullo64)(xa, xb)),
        np.array([(x * y) & M64 for x, y in zip(a, b)], dtype=np.uint64),
    )
    np.testing.assert_array_equal(
        U.to_np_u64(jax.jit(U.mulhi64)(xa, xb)),
        np.array([(x * y) >> 64 for x, y in zip(a, b)], dtype=np.uint64),
    )


@pytest.mark.parametrize("q", MODULI)
def test_barrett_reduce_64_full_range(q):
    vals = [v for v in EDGE_VALUES] + [q - 1, q, q + 1, 2 * q - 1 if 2 * q < M64 else q]
    x = _pairs(vals)
    rhi = (1 << 128) // q >> 64
    rhi_c = U.const_u64(rhi)
    q_c = U.const_u64(q)
    got = _ints(jax.jit(U.barrett_reduce_64)(x, q_c, rhi_c))
    assert got == [v % q for v in vals]


@pytest.mark.parametrize("q", MODULI)
def test_barrett_reduce_128_extremes(q):
    """128-bit reduction incl. z just below 2^128 and products of maximal
    operands (the accumulator states the key-switch contraction reaches)."""
    ratio = (1 << 128) // q
    cases = [
        0, 1, q - 1, q, q + 1,
        (q - 1) * (q - 1),
        ((q - 1) * (q - 1)) * 2,
        (1 << 127) - 1, (1 << 127), (1 << 128) - 1,
        64 * (4 * q - 4) * (q - 1) if 64 * 4 * q * q < (1 << 128) else (1 << 128) - q,
    ]
    w = [np.array([(z >> (32 * i)) & 0xFFFFFFFF for z in cases], dtype=np.uint32)
         for i in range(4)]
    z = tuple(map(np.asarray, w))
    got = _ints(jax.jit(
        lambda z: U.barrett_reduce_128(
            z, U.const_u64(q),
            U.const_u64(ratio & M64), U.const_u64(ratio >> 64),
        )
    )(z))
    assert got == [c % q for c in cases]


@pytest.mark.parametrize("q", MODULI)
def test_shoup_multiply_lazy_domain_inputs(q):
    """Shoup multiplication stays exact for x beyond q (lazy [0, 4q)
    operands, as the NTT uses it) and for operands at q-1."""
    ys = [1, 2, q // 2, q - 2, q - 1]
    xs = [0, 1, q - 1, min(2 * q - 1, M64), min(4 * q - 4, M64)]
    for y in ys:
        op, qt = shoup_pair(y, q)
        xa = _pairs(xs)
        got = _ints(jax.jit(
            lambda x: U.mul_mod_shoup(
                x, U.const_u64(op), U.const_u64(qt), U.const_u64(q)
            )
        )(xa))
        assert got == [(x * y) % q for x in xs], y
        lazy = _ints(jax.jit(
            lambda x: U.mul_mod_shoup_lazy(
                x, U.const_u64(op), U.const_u64(qt), U.const_u64(q)
            )
        )(xa))
        for g, x in zip(lazy, xs):
            assert g % q == (x * y) % q and g < 2 * q, (y, x)


@pytest.mark.parametrize("q", MODULI)
def test_mod_add_sub_neg_boundaries(q):
    xs = [0, 1, q // 2, q - 2, q - 1]
    ys = [0, 1, q // 2, q - 1, q - 1]
    q_c = U.const_u64(q)
    xa, ya = _pairs(xs), _pairs(ys)
    assert _ints(jax.jit(U.add_mod)(xa, ya, q_c)) == [(x + y) % q for x, y in zip(xs, ys)]
    assert _ints(jax.jit(U.sub_mod)(xa, ya, q_c)) == [(x - y) % q for x, y in zip(xs, ys)]
    assert _ints(jax.jit(U.neg_mod)(xa, q_c)) == [(-x) % q for x in xs]


def test_compare_select_shift_edges():
    a = EDGE_VALUES
    b = list(reversed(EDGE_VALUES))
    xa, xb = _pairs(a), _pairs(b)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(U.ge64)(xa, xb)), np.array([x >= y for x, y in zip(a, b)])
    )
    np.testing.assert_array_equal(
        np.asarray(jax.jit(U.eq64)(xa, xb)), np.array([x == y for x, y in zip(a, b)])
    )
    for sh in (1, 16, 31, 32, 33, 63):
        got = _ints(jax.jit(lambda x: U.shr64(x, sh))(xa))
        assert got == [x >> sh for x in a], sh
        got = _ints(jax.jit(lambda x: U.shl64(x, sh))(xa))
        assert got == [(x << sh) & M64 for x in a], sh


def test_add128_carry_chains():
    cases = [
        (0, 0), (1, (1 << 128) - 1), ((1 << 64) - 1, 1),
        ((1 << 96) - 1, (1 << 96) + 5), ((1 << 127), (1 << 127)),
        ((1 << 128) - 1, (1 << 128) - 1),
    ]
    def words(z):
        return np.array([(z >> (32 * i)) & 0xFFFFFFFF for i in range(4)], dtype=np.uint32)
    for x, y in cases:
        xa = tuple(np.array([w]) for w in words(x))
        ya = tuple(np.array([w]) for w in words(y))
        out = jax.jit(U.add128)(xa, ya)
        got = sum(int(out[i][0]) << (32 * i) for i in range(4))
        assert got == (x + y) % (1 << 128), (x, y)


def test_clz32_all_positions():
    from seal_tpu.ops.crt_compose import _clz32

    vals = [0] + [1 << i for i in range(32)] + [(1 << i) | 1 for i in range(1, 32)]
    x = np.array(vals, dtype=np.uint32)
    got = list(np.asarray(jax.jit(_clz32)(x)))
    want = [32] + [31 - i for i in range(32)] + [31 - i for i in range(1, 32)]
    assert got == want
