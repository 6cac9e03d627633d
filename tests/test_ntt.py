"""NTT kernel tests (mirrors reference ``native/tests/seal/util/ntt.cpp``):
exact-value checks against a slow host evaluation, round-trip, negacyclic
convolution property, and NTT-form ordering convention."""

import numpy as np
import pytest

from seal_tpu.modulus import Modulus
from seal_tpu.ntt_tables import HostNTTTables, build_limb_tables
from seal_tpu.ops import ntt as NTT
from seal_tpu.ops import u64 as U


def host_ntt(a, tab: HostNTTTables):
    """Slow exact forward NTT (same butterfly recursion, plain modular math)."""
    q = tab.modulus.value
    n = tab.n
    a = [int(v) % q for v in a]
    for s in range(tab.log_n):
        m = 1 << s
        gap = n >> (s + 1)
        for i in range(m):
            r = tab.root_powers[m + i]
            off = i * 2 * gap
            for j in range(off, off + gap):
                u = a[j]
                v = a[j + gap] * r % q
                a[j] = (u + v) % q
                a[j + gap] = (u - v) % q
    return a


def host_intt(a, tab: HostNTTTables):
    q = tab.modulus.value
    n = tab.n
    a = [int(v) % q for v in a]
    offset = 1
    for s in range(tab.log_n):
        m = n >> (s + 1)
        gap = 1 << s
        for i in range(m):
            r = tab.inv_root_powers[offset + i]
            off = i * 2 * gap
            for j in range(off, off + gap):
                u, v = a[j], a[j + gap]
                a[j] = (u + v) % q
                a[j + gap] = (u - v) * r % q
        offset += m
    inv_n = tab.inv_degree
    return [v * inv_n % q for v in a]


def negacyclic_mul(a, b, q):
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                out[k] = (out[k] + a[i] * b[j]) % q
            else:
                out[k - n] = (out[k - n] - a[i] * b[j]) % q
    return out


MODULI = [Modulus(0xFFFFEE001), Modulus(113)]  # 36-bit NTT prime; tiny prime


def test_tables_basic():
    tab = HostNTTTables(3, Modulus(113))  # n=8, need 16 | 112: 113-1=112=16*7 OK
    q = 113
    assert pow(tab.root, 8, q) == q - 1
    assert tab.root * tab.inv_root % q == 1
    # minimal: no smaller primitive 16th root
    for cand in range(1, tab.root):
        assert pow(cand, 8, q) != q - 1


def test_ordering_convention():
    """Forward NTT output index i holds A(psi^(2*bitrev(i)+1)) — the
    standard bit-reversed evaluation order the reference produces."""
    from seal_tpu.numth import reverse_bits

    tab = HostNTTTables(3, Modulus(113))
    q, n = 113, 8
    rng = np.random.default_rng(1)
    a = [int(x) for x in rng.integers(0, q, n)]
    out = host_ntt(a, tab)
    psi = tab.root
    for i in range(n):
        e = (2 * reverse_bits(i, 3) + 1)
        want = sum(a[j] * pow(psi, e * j, q) for j in range(n)) % q
        assert out[i] == want


@pytest.mark.parametrize("log_n", [2, 5, 10])
@pytest.mark.parametrize("mod", MODULI)
def test_host_roundtrip_and_convolution(log_n, mod):
    if (mod.value - 1) % (2 << log_n):
        pytest.skip("modulus not NTT-friendly for this n")
    tab = HostNTTTables(log_n, mod)
    q, n = mod.value, 1 << log_n
    rng = np.random.default_rng(log_n)
    a = [int(x) for x in rng.integers(0, q, n)]
    b = [int(x) for x in rng.integers(0, q, n)]
    assert host_intt(host_ntt(a, tab), tab) == a
    prod = [x * y % q for x, y in zip(host_ntt(a, tab), host_ntt(b, tab))]
    assert host_intt(prod, tab) == negacyclic_mul(a, b, q)


@pytest.mark.parametrize("log_n", [3, 8, 12])
def test_device_matches_host(log_n):
    moduli = [Modulus(0xFFFFEE001), Modulus(0x7FFFFFFFE90001), Modulus(0x7E00001)]
    moduli = [m for m in moduli if (m.value - 1) % (2 << log_n) == 0]
    tabs = [HostNTTTables(log_n, m) for m in moduli]
    t = build_limb_tables(log_n, moduli, tabs)
    n, k = 1 << log_n, len(moduli)
    rng = np.random.default_rng(7)
    a = np.stack([rng.integers(0, m.value, n, dtype=np.uint64) for m in moduli])

    x = U.from_np_u64(a)
    fwd = U.to_np_u64(NTT.ntt_forward(x, t))
    for i, (m, tab) in enumerate(zip(moduli, tabs)):
        assert [int(v) for v in fwd[i]] == host_ntt(a[i], tab), f"fwd limb {i}"

    inv = U.to_np_u64(NTT.ntt_inverse(U.from_np_u64(fwd), t))
    assert (inv == a).all()

    # lazy variants: congruent and bounded
    fwd_lazy = U.to_np_u64(NTT.ntt_forward(x, t, lazy=True))
    for i, m in enumerate(moduli):
        assert ((fwd_lazy[i].astype(object) % m.value) == (fwd[i].astype(object))).all()
        assert (fwd_lazy[i].astype(object) < 4 * m.value).all()
    inv_lazy = U.to_np_u64(NTT.ntt_inverse(U.from_np_u64(fwd), t, lazy=True))
    for i, m in enumerate(moduli):
        assert ((inv_lazy[i].astype(object) % m.value) == inv[i].astype(object) % m.value).all()
        assert (inv_lazy[i].astype(object) < 2 * m.value).all()


def test_device_batch_axis():
    """Leading batch axes vectorize transparently."""
    log_n = 6
    moduli = [Modulus(0xFFFFEE001)]
    t = build_limb_tables(log_n, moduli)
    rng = np.random.default_rng(3)
    a = rng.integers(0, moduli[0].value, (4, 1, 64), dtype=np.uint64)
    out = U.to_np_u64(NTT.ntt_inverse(NTT.ntt_forward(U.from_np_u64(a), t), t))
    assert (out == a).all()
