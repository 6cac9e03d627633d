"""BatchEncoder / CKKSEncoder edge-case battery (batchencoder.cpp /
ckks.cpp contract parity: bounds, int64 wrap, orbit structure)."""

import numpy as np
import pytest

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.encoders import BatchEncoder
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


def _bfv_ctx(n=64, tbits=20):
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(n)
    parms.set_plain_modulus(PlainModulus.batching(n, tbits).value)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40]))
    return SealContext(parms, True, SecurityLevel.NONE)


def test_batch_encoder_requires_batching():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(257)  # 257 % 128 = 1? 257 = 2*128+1 -> supports batching
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    BatchEncoder(ctx)  # fine
    parms2 = EncryptionParameters(SchemeType.BFV)
    parms2.set_poly_modulus_degree(64)
    parms2.set_plain_modulus(255)  # not ≡ 1 mod 2N
    parms2.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    ctx2 = SealContext(parms2, True, SecurityLevel.NONE)
    with pytest.raises(ValueError):
        BatchEncoder(ctx2)


def test_batch_encoder_roundtrip_full_and_partial():
    ctx = _bfv_ctx()
    be = BatchEncoder(ctx)
    t = ctx.first_context_data().parms.plain_modulus.value
    rng = np.random.default_rng(1)
    full = rng.integers(0, t, 64, dtype=np.uint64)
    assert np.array_equal(np.asarray(be.decode(be.encode(full)), dtype=np.uint64), full)
    # shorter input is zero-padded
    part = rng.integers(0, t, 10, dtype=np.uint64)
    got = np.asarray(be.decode(be.encode(part)), dtype=np.uint64)
    assert np.array_equal(got[:10], part) and (got[10:] == 0).all()


def test_batch_encoder_rejects_oversize_and_out_of_range():
    ctx = _bfv_ctx()
    be = BatchEncoder(ctx)
    t = ctx.first_context_data().parms.plain_modulus.value
    with pytest.raises(ValueError):
        be.encode(np.zeros(65, dtype=np.uint64))
    with pytest.raises(ValueError):
        be.encode(np.array([t], dtype=np.uint64))


def test_batch_encoder_int64_wrap():
    """Negative int64 values wrap mod t (batchencoder.cpp:150-194)."""
    ctx = _bfv_ctx()
    be = BatchEncoder(ctx)
    t = int(ctx.first_context_data().parms.plain_modulus.value)
    vals = [-1, -2, 5, -(t // 2)]
    pt = be.encode_int64(vals)
    got = be.decode_int64(pt)
    np.testing.assert_array_equal(got[: len(vals)], vals)
    # unsigned view of -1 is t-1
    raw = np.asarray(be.decode(pt), dtype=np.uint64)
    assert int(raw[0]) == t - 1


def test_batch_encoder_row_structure():
    """Slot layout is a 2 x (N/2) matrix (rotate_rows semantics)."""
    ctx = _bfv_ctx()
    be = BatchEncoder(ctx)
    vals = list(range(64))
    pt = be.encode(vals)
    got = be.decode(pt)
    assert list(got) == vals


def test_ckks_encoder_slot_count_and_bounds():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    enc = CKKSEncoder(ctx)
    assert enc.slot_count == 32
    with pytest.raises(ValueError):
        enc.encode(np.zeros(33), 2.0**20)
    with pytest.raises(ValueError):
        enc.encode(np.array([np.inf]), 2.0**20)
    with pytest.raises(ValueError):
        enc.encode(np.zeros(4), -1.0)


def test_ckks_encode_decode_precision_tiers():
    """Values that force >52-bit encoded coefficients exercise the wide
    tier; round-trip must stay accurate (ckks.h:558-667 three tiers)."""
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [60, 60, 60]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    enc = CKKSEncoder(ctx)
    vals = np.linspace(1.0, 2.0, 32)
    for scale in (2.0**30, 2.0**55, 2.0**80):
        got = np.asarray(enc.decode(enc.encode(vals, scale)))
        assert np.allclose(got.real, vals, rtol=1e-9), scale


def test_ckks_scalar_fill():
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(64)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    enc = CKKSEncoder(ctx)
    got = np.asarray(enc.decode(enc.encode(1.25, 2.0**20)))
    assert np.allclose(got.real, 1.25, atol=1e-4)
    got_i = np.asarray(enc.decode(enc.encode_int(-7)))
    assert np.allclose(got_i.real, -7, atol=1e-6)
