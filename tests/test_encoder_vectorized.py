"""Vectorized CKKS encode/decode paths vs exact Python-int references.

The round-1 decode was an O(n) Python-int loop (flagged in VERDICT round 1);
round 2 replaced it with an exact word-plane numpy compose
(`HostRNSBase.compose_scaled_centered_double`) and the >52-bit encode tier
with a device frexp/pow2 reduction.  These tests pin both against the
original exact formulations (cf. reference ckks.h:558-787).
"""

import math

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.rns_host import HostRNSBase
from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.ops import u64 as U
from seal_tpu.ops import ntt as NTT


def _ref_centered_double(base, scaled, uh, inv_scale):
    """The reference's exact big-int compose + 2^64 double ladder."""
    Q = base.base_prod
    out = []
    for i in range(scaled.shape[1]):
        v = sum(int(scaled[j, i]) * base.punctured_prod[j] for j in range(base.size)) % Q
        c = v - Q if v >= uh else v
        neg = c < 0
        c = -c if neg else c
        acc = 0.0
        p = inv_scale
        while c:
            acc += (c & 0xFFFFFFFFFFFFFFFF) * p
            c >>= 64
            p *= 18446744073709551616.0
        out.append(-acc if neg else acc)
    return np.array(out)


@pytest.mark.parametrize("bits", [[30], [60, 40, 40, 60], [50] * 16, [61] * 30])
def test_compose_scaled_centered_double_bit_exact(bits):
    if max(bits) > 60:
        # 61-bit primes are *internal* only (aux bases); the user-facing
        # CoeffModulus.create caps at 60 bits (util/defines.h:40), so build
        # them directly via the prime sampler as RNSTool does (rns.cpp:625-636).
        from seal_tpu import numth
        from seal_tpu.modulus import Modulus
        mods = [Modulus(p) for p in numth.get_primes(2 << 12, 61, len(bits))]
    else:
        mods = CoeffModulus.create(1 << 12, bits)
    base = HostRNSBase(mods)
    qv = np.array([m.value for m in mods], dtype=np.uint64)
    n = 64
    rng = np.random.default_rng(42)
    scaled = rng.integers(0, qv[:, None], (len(bits), n), dtype=np.uint64)
    Q = base.base_prod
    uh = (Q + 1) >> 1
    # boundary values: 0, Q-1, uh-1, uh (sign flip edge)
    for idx, v in enumerate([0, Q - 1, uh - 1, uh]):
        for j, m in enumerate(mods):
            scaled[j, idx] = (v % m.value) * base.inv_punctured[j] % m.value
    got = base.compose_scaled_centered_double(scaled, uh, 2.0 ** -40)
    want = _ref_centered_double(base, scaled, uh, 2.0 ** -40)
    assert np.array_equal(got, want)


def _ckks_context(n, bits):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, bits))
    return SealContext(parms, True, SecurityLevel.NONE)


def test_wide_tier_encode_matches_python_int_path():
    n = 256
    ctx = _ckks_context(n, [60, 60, 60, 60])
    enc = CKKSEncoder(ctx)
    cd = ctx.first_context_data()
    rng = np.random.default_rng(7)
    vals = rng.uniform(-2.0, 2.0, n // 2) + 1j * rng.uniform(-1, 1, n // 2)
    scale = 2.0 ** 100  # forces the >52-bit tier
    pt = enc.encode(vals, scale)

    conj = np.zeros(n, dtype=np.complex128)
    conj[enc.index_map[: len(vals)]] = vals
    conj[enc.index_map[enc.slots : enc.slots + len(vals)]] = np.conj(vals)
    coeffs = enc._fft_from_rev(conj, scale / n).real
    qv = cd.coeff_modulus_values
    rns = np.zeros((len(qv), n), dtype=np.uint64)
    rounded = [int(math.floor(abs(c) + 0.5)) * (-1 if c < 0 else 1) for c in coeffs]
    for j, q in enumerate(qv):
        rns[j] = np.array([r % q for r in rounded], dtype=np.uint64)
    want = U.to_np_u64(NTT.ntt_forward(U.from_np_u64(rns), cd.limb_tables()))
    got = U.to_np_u64(pt.rns_data)
    assert np.array_equal(got, want)

    dec = enc.decode(pt)
    assert np.max(np.abs(dec - vals)) < 1e-10


def test_wide_tier_roundtrip_large_n():
    n = 2048
    ctx = _ckks_context(n, [50, 50, 50, 50, 50])
    enc = CKKSEncoder(ctx)
    rng = np.random.default_rng(3)
    vals = rng.uniform(-5.0, 5.0, n // 2)
    pt = enc.encode(vals, 2.0 ** 80)
    dec = np.real(enc.decode(pt))
    assert np.max(np.abs(dec - vals)) < 1e-8
