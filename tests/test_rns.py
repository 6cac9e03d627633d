"""RNS machinery tests (mirrors ``native/tests/seal/util/rns.cpp``):
base conversion exactness, BEHZ composite ops, divide-and-round."""

import numpy as np
import pytest

from seal_tpu.modulus import Modulus
from seal_tpu.ntt_tables import build_limb_tables
from seal_tpu.ops import rns as R
from seal_tpu.ops import u64 as U
from seal_tpu.rns_host import HostBaseConverter, HostRNSBase, HostRNSTool


def u64arr(mat):
    return U.from_np_u64(np.asarray(mat, dtype=np.uint64))


def test_rns_base_compose_decompose():
    base = HostRNSBase([Modulus(3), Modulus(5), Modulus(7)])
    assert base.base_prod == 105
    for v in (0, 1, 104, 53):
        assert base.compose(base.decompose(v)) == v
    arr = np.array([0, 1, 9, 104], dtype=object)
    dec = base.decompose_array(arr)
    assert base.compose_array(dec) == [0, 1, 9, 104]


def test_fast_convert_exact_small():
    ib = HostRNSBase([Modulus(3), Modulus(5)])
    ob = HostRNSBase([Modulus(7), Modulus(11)])
    conv = HostBaseConverter(ib, ob)
    # FBC formula: out_j = sum_i ([x_i * ~q_i]_{q_i} * (Q/q_i)) mod p_j
    xs = [[0, 1, 2, 2], [0, 1, 4, 3]]  # residues mod 3, mod 5
    got = U.to_np_u64(R.fast_convert_array(u64arr(xs), conv))
    for j, p in enumerate([7, 11]):
        for c in range(4):
            want = sum(
                (xs[i][c] * ib.inv_punctured[i] % ib.values[i]) * ib.punctured_prod[i]
                for i in range(2)
            ) % p
            assert int(got[j][c]) == want


def test_fast_convert_large_bases():
    rng = np.random.default_rng(11)
    iq = [Modulus(v) for v in (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)]
    oq = [Modulus(v) for v in (0x7FFFFFFFE90001, 0x7FFFFFFFBF0001)]
    ib, ob = HostRNSBase(iq), HostRNSBase(oq)
    conv = HostBaseConverter(ib, ob)
    n = 64
    xs = np.stack([rng.integers(0, m.value, n, dtype=np.uint64) for m in iq])
    got = U.to_np_u64(R.fast_convert_array(U.from_np_u64(xs), conv))
    for j, p in enumerate(ob.values):
        for c in range(n):
            want = sum(
                (int(xs[i][c]) * ib.inv_punctured[i] % ib.values[i]) * ib.punctured_prod[i]
                for i in range(ib.size)
            ) % p
            assert int(got[j][c]) == want, (j, c)


def test_exact_convert_array():
    """Exact conversion must equal (x mod Q) mod t exactly (for x < Q)."""
    rng = np.random.default_rng(5)
    iq = [Modulus(v) for v in (0xFFFFEE001, 0xFFFFC4001, 0x1FFFFE0001)]
    ib = HostRNSBase(iq)
    t = Modulus(65537)
    conv = HostBaseConverter(ib, HostRNSBase([t]))
    n = 64
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 40)) % ib.base_prod for _ in range(n)]
    xs = ib.decompose_array(np.array(vals, dtype=object))
    got = U.to_np_u64(R.exact_convert_array(U.from_np_u64(xs), conv))
    want = [v % t.value for v in vals]
    assert [int(g) for g in got[0]] == want


@pytest.fixture(scope="module")
def tool_small():
    q = HostRNSBase([Modulus(0xFFFFEE001), Modulus(0xFFFFC4001), Modulus(0x1FFFFE0001)])
    return HostRNSTool(32, q, Modulus(65537))


def test_behz_extend_and_return(tool_small):
    """fastbconv_m_tilde -> sm_mrq must reproduce x exactly in base Bsk
    (Montgomery reduction removes the m_tilde factor and q-overflows)."""
    tool = tool_small
    rng = np.random.default_rng(9)
    n = 32
    vals = [
        ((int(a) << 60) | int(b)) % tool.base_q.base_prod
        for a, b in zip(rng.integers(0, 1 << 60, n), rng.integers(0, 1 << 60, n))
    ]
    xs = tool.base_q.decompose_array(np.array(vals, dtype=object))
    ext = R.fastbconv_m_tilde(U.from_np_u64(xs), tool)
    red = U.to_np_u64(R.sm_mrq(ext, tool))
    # sm_mrq yields x + c*Q for small |c| <= 1 (the BEHZ overflow slack);
    # the offset c must be consistent across all Bsk limbs.
    Q = tool.base_q.base_prod
    for c in range(n):
        common = {-1, 0, 1}
        for i, q in enumerate(tool.base_Bsk.values):
            got = int(red[i][c])
            common &= {cand for cand in (-1, 0, 1) if got == (vals[c] + cand * Q) % q}
        assert common, f"coeff {c}: no consistent small offset"


def test_fast_floor_and_bconv_sk(tool_small):
    """fast_floor(x) == floor(x/Q) + small error; fastbconv_sk exact for
    values < Q*B/2 (Shenoy-Kumaresan with centered alpha)."""
    tool = tool_small
    rng = np.random.default_rng(13)
    n = 32
    Q = tool.base_q.base_prod
    # x spanning q U Bsk exactly (x < Q * something small)
    vals = [int(a) * Q + int(b) for a, b in zip(rng.integers(0, 1 << 50, n), rng.integers(0, 1 << 30, n))]
    full_base = HostRNSBase(tool.base_q.moduli + tool.base_Bsk.moduli)
    xs = full_base.decompose_array(np.array(vals, dtype=object))
    floored = R.fast_floor(U.from_np_u64(xs), tool)
    got = U.to_np_u64(floored)
    # fast_floor returns floor(x/Q) - alpha with alpha in [0, k_q) (the FBC
    # overflow slack, cf. BEHZ16); alpha must be consistent across limbs.
    k_q = tool.base_q.size
    alphas = []
    for c in range(len(vals)):
        common = set(range(k_q))
        for i, q in enumerate(tool.base_Bsk.values):
            gi = int(got[i][c])
            common &= {a for a in range(k_q) if gi == (vals[c] // Q - a) % q}
        assert common, f"coeff {c}: no consistent alpha"
        alphas.append(min(common))
    # Convert back to q with Shenoy-Kumaresan: exact for values << Q*B/2, so
    # the result is the same integer floor(x/Q) - alpha reduced mod q_i.
    back = U.to_np_u64(R.fastbconv_sk(floored, tool))
    for i, q in enumerate(tool.base_q.values):
        want = [(v // Q - a) % q for v, a in zip(vals, alphas)]
        assert [int(x) for x in back[i]] == want, f"sk limb {i}"


def test_divide_and_round(tool_small):
    tool = tool_small
    rng = np.random.default_rng(17)
    n = 32
    Q = tool.base_q.base_prod
    q_last = tool.base_q.values[-1]
    vals = [int(v) % Q for v in rng.integers(0, 1 << 63, n).astype(object)]
    # make small values too (rounding edge)
    vals[:4] = [0, 1, q_last // 2, q_last // 2 + 1]
    xs = tool.base_q.decompose_array(np.array(vals, dtype=object))
    out = U.to_np_u64(R.divide_and_round_q_last(U.from_np_u64(xs), tool))
    # expected: round(v / q_last) mod q_i — with "round half up" on the
    # centered representative: floor((v + half) / q_last) where half = q_last>>1
    half = q_last >> 1
    for i, q in enumerate(tool.base_q.values[:-1]):
        want = [((v + half) // q_last) % q for v in vals]
        assert [int(x) for x in out[i]] == want, i


def test_divide_and_round_ntt(tool_small):
    from seal_tpu.ops import ntt as NTT

    tool = tool_small
    logn = 5
    tables = build_limb_tables(logn, tool.base_q.moduli)
    rng = np.random.default_rng(19)
    n = 32
    Q = tool.base_q.base_prod
    q_last = tool.base_q.values[-1]
    vals = [int(v) % Q for v in rng.integers(0, 1 << 63, n).astype(object)]
    xs = tool.base_q.decompose_array(np.array(vals, dtype=object))
    x_ntt = NTT.ntt_forward(U.from_np_u64(xs), tables)
    out_ntt = R.divide_and_round_q_last_ntt(x_ntt, tool, tables)
    out = U.to_np_u64(NTT.ntt_inverse(out_ntt, R.slice_limbs(tables, 0, 2)))
    half = q_last >> 1
    for i, q in enumerate(tool.base_q.values[:-1]):
        want = [((v + half) // q_last) % q for v in vals]
        assert [int(x) for x in out[i]] == want, i


def test_decrypt_scale_and_round(tool_small):
    """round(t/Q * x) mod t via {t, gamma} base."""
    tool = tool_small
    rng = np.random.default_rng(23)
    n = 32
    Q = tool.base_q.base_prod
    t = tool.t.value
    # x = Delta*m + small error, so t*x/Q ~ m + tiny
    delta = Q // t
    ms = rng.integers(0, t, n)
    es = rng.integers(-100, 100, n)
    vals = [(int(m) * delta + int(e)) % Q for m, e in zip(ms, es)]
    xs = tool.base_q.decompose_array(np.array(vals, dtype=object))
    out = U.to_np_u64(R.decrypt_scale_and_round(U.from_np_u64(xs), tool))
    for c in range(n):
        # exact rounding of t*v/Q
        num = t * vals[c]
        want = ((num + Q // 2) // Q) % t
        assert int(out[0][c]) == want, c


def test_decrypt_modt(tool_small):
    tool = tool_small
    rng = np.random.default_rng(29)
    n = 32
    Q = tool.base_q.base_prod
    vals = [int(v) % Q for v in rng.integers(0, 1 << 62, n).astype(object)]
    xs = tool.base_q.decompose_array(np.array(vals, dtype=object))
    out = U.to_np_u64(R.decrypt_modt(U.from_np_u64(xs), tool))
    assert [int(x) for x in out[0]] == [v % tool.t.value for v in vals]
