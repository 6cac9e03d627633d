"""Exact-value tests for the 32-bit-lane u64 arithmetic core.

Mirrors the reference's kernel-level test style
(``native/tests/seal/util/uintarithsmallmod.cpp``): every primitive is
validated against exact Python-int arithmetic on random and edge-case inputs.
"""

import numpy as np
import pytest

from seal_tpu.ops import u64 as U


RNG = np.random.default_rng(0x5EA1)


def rand_u64(n, bits=64):
    hi = (1 << bits) - 1
    vals = RNG.integers(0, hi, size=n, dtype=np.uint64, endpoint=True)
    # sprinkle edge cases
    edge = np.array([0, 1, hi, hi - 1, 1 << 32, (1 << 32) - 1], dtype=np.uint64)
    vals[: len(edge)] = edge[: min(len(edge), n)]
    return vals


def as_int(a):
    return [int(x) for x in np.asarray(a, dtype=np.uint64)]


def test_roundtrip():
    x = rand_u64(64)
    assert (U.to_np_u64(U.from_np_u64(x)) == x).all()


def test_mul32_wide():
    a32 = rand_u64(256) & np.uint64(0xFFFFFFFF)
    b32 = rand_u64(256) & np.uint64(0xFFFFFFFF)
    import jax.numpy as jnp

    lo, hi = U.mul32_wide(jnp.asarray(a32.astype(np.uint32)), jnp.asarray(b32.astype(np.uint32)))
    got = np.asarray(lo, np.uint64) | (np.asarray(hi, np.uint64) << np.uint64(32))
    want = (a32.astype(object) * b32.astype(object)) % (1 << 64)
    assert (got.astype(object) == want).all()


def test_add_sub_64():
    x, y = rand_u64(256), rand_u64(256)
    got = U.to_np_u64(U.add64(U.from_np_u64(x), U.from_np_u64(y)))
    want = (x.astype(object) + y.astype(object)) % (1 << 64)
    assert (got.astype(object) == want).all()

    got = U.to_np_u64(U.sub64(U.from_np_u64(x), U.from_np_u64(y)))
    want = (x.astype(object) - y.astype(object)) % (1 << 64)
    assert (got.astype(object) == want).all()


def test_mul64():
    x, y = rand_u64(256), rand_u64(256)
    xs, ys = U.from_np_u64(x), U.from_np_u64(y)
    full = [a * b for a, b in zip(as_int(x), as_int(y))]

    got = U.to_np_u64(U.mullo64(xs, ys))
    assert all(int(g) == (f % (1 << 64)) for g, f in zip(got, full))

    got = U.to_np_u64(U.mulhi64(xs, ys))
    assert all(int(g) == (f >> 64) for g, f in zip(got, full))

    w = U.mul64_wide(xs, ys)
    got128 = [
        int(a) | (int(b) << 32) | (int(c) << 64) | (int(d) << 96)
        for a, b, c, d in zip(*[np.asarray(t) for t in w])
    ]
    assert got128 == full


def test_compare_select():
    x, y = rand_u64(256), rand_u64(256)
    xs, ys = U.from_np_u64(x), U.from_np_u64(y)
    ge = np.asarray(U.ge64(xs, ys))
    assert (ge == (x >= y)).all()
    sel = U.to_np_u64(U.select64(U.ge64(xs, ys), xs, ys))
    assert (sel == np.maximum(x, y)).all()


@pytest.mark.parametrize("qval", [2, 3, (1 << 31) - 1, 0x7E00001, 0x3FFFFFFF000001, (1 << 61) - 1, 0x1FFFFFFFFFE00001])
def test_barrett_reduce_64(qval):
    x = rand_u64(256)
    ratio = (1 << 128) // qval
    q = U.const_u64(qval)
    rhi = U.const_u64(ratio >> 64)
    got = U.to_np_u64(U.barrett_reduce_64(U.from_np_u64(x), q, rhi))
    want = x.astype(object) % qval
    assert (got.astype(object) == want).all()


@pytest.mark.parametrize("qval", [3, 0x7E00001, 0x3FFFFFFF000001, (1 << 61) - 1, 0x1FFFFFFFFFE00001])
def test_mul_mod_barrett(qval):
    x, y = rand_u64(256), rand_u64(256)
    ratio = (1 << 128) // qval
    q = U.const_u64(qval)
    rlo, rhi = U.const_u64(ratio & ((1 << 64) - 1)), U.const_u64(ratio >> 64)
    got = U.to_np_u64(U.mul_mod(U.from_np_u64(x), U.from_np_u64(y), q, rlo, rhi))
    want = [(a * b) % qval for a, b in zip(as_int(x), as_int(y))]
    assert [int(g) for g in got] == want


@pytest.mark.parametrize("qval", [0x7E00001, 0x3FFFFFFF000001, 0x1FFFFFFFFFE00001])
def test_mod_add_sub_neg(qval):
    x = rand_u64(256) % np.uint64(qval)
    y = rand_u64(256) % np.uint64(qval)
    xs, ys, q = U.from_np_u64(x), U.from_np_u64(y), U.const_u64(qval)
    assert [int(v) for v in U.to_np_u64(U.add_mod(xs, ys, q))] == [
        (a + b) % qval for a, b in zip(as_int(x), as_int(y))
    ]
    assert [int(v) for v in U.to_np_u64(U.sub_mod(xs, ys, q))] == [
        (a - b) % qval for a, b in zip(as_int(x), as_int(y))
    ]
    assert [int(v) for v in U.to_np_u64(U.neg_mod(xs, q))] == [(-a) % qval for a in as_int(x)]


@pytest.mark.parametrize("qval", [0x7E00001, 0x3FFFFFFF000001, 0x1FFFFFFFFFE00001])
def test_mul_mod_shoup(qval):
    x = rand_u64(256)
    y = rand_u64(256) % np.uint64(qval)
    yq = np.array([(int(v) << 64) // qval for v in y], dtype=object)
    yq64 = np.array([v & ((1 << 64) - 1) for v in yq], dtype=np.uint64)
    xs, ys, q = U.from_np_u64(x), U.from_np_u64(y), U.const_u64(qval)
    got = U.to_np_u64(U.mul_mod_shoup(xs, ys, U.from_np_u64(yq64), q))
    want = [(a * b) % qval for a, b in zip(as_int(x), as_int(y))]
    assert [int(g) for g in got] == want
    # lazy variant: in [0, 2q) and congruent
    lazy = U.to_np_u64(U.mul_mod_shoup_lazy(xs, ys, U.from_np_u64(yq64), q))
    for g, w in zip(as_int(lazy), want):
        assert g % qval == w and g < 2 * qval


@pytest.mark.parametrize("qval", [0x7E00001, 0x1FFFFFFFFFE00001])
def test_mul_add_mod(qval):
    x, y, z = rand_u64(128), rand_u64(128), rand_u64(128)
    ratio = (1 << 128) // qval
    q = U.const_u64(qval)
    rlo, rhi = U.const_u64(ratio & ((1 << 64) - 1)), U.const_u64(ratio >> 64)
    got = U.to_np_u64(
        U.mul_add_mod(U.from_np_u64(x), U.from_np_u64(y), U.from_np_u64(z), q, rlo, rhi)
    )
    want = [(a * b + c) % qval for a, b, c in zip(as_int(x), as_int(y), as_int(z))]
    assert [int(g) for g in got] == want


def test_shifts():
    x = rand_u64(64)
    xs = U.from_np_u64(x)
    for n in (0, 1, 7, 31, 32, 33, 63):
        got = U.to_np_u64(U.shr64(xs, n))
        assert (got.astype(object) == (x.astype(object) >> n)).all(), n
        got = U.to_np_u64(U.shl64(xs, n))
        assert (got.astype(object) == ((x.astype(object) << n) % (1 << 64))).all(), n
