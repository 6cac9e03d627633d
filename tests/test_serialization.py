"""Serialization round-trip tests (mirrors ``tests/seal/serialization.cpp``
and object-level save/load tests)."""

import numpy as np
import pytest

from seal_tpu import serialization as S
from seal_tpu.context import SealContext
from seal_tpu.data import GaloisKeys, Plaintext, RelinKeys
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


@pytest.fixture(scope="module")
def setup():
    parms = EncryptionParameters(SchemeType.BFV)
    parms.set_poly_modulus_degree(64)
    parms.set_plain_modulus(PlainModulus.batching(64, 20).value)
    parms.set_coeff_modulus(CoeffModulus.create(64, [40, 40, 40]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    keygen = KeyGenerator(ctx)
    return ctx, parms, keygen


def test_header_roundtrip():
    data = b"hello seal tpu" * 10
    for mode in (S.COMPR_NONE, S.COMPR_ZLIB):
        blob = S.save_header_wrapped(data, mode)
        out, consumed = S.load_header_wrapped(blob)
        assert out == data and consumed == len(blob)
    with pytest.raises(ValueError):
        S.load_header_wrapped(b"\x00" * 16)


def test_params_roundtrip(setup):
    ctx, parms, _ = setup
    blob = S.params_save(parms)
    out, _ = S.params_load(blob)
    assert out.parms_id == parms.parms_id


def test_plaintext_roundtrip(setup):
    ctx, parms, _ = setup
    p = Plaintext.from_hex("3x^5 + 2x^1 + 1")
    blob = S.plaintext_save(p)
    out, _ = S.plaintext_load(blob, ctx)
    assert out.to_string() == p.to_string()


def test_ciphertext_roundtrip(setup):
    ctx, parms, keygen = setup
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    p = Plaintext.from_hex("7x^9 + 5x^2 + 4")
    ct = enc.encrypt_symmetric(p)
    blob = S.ciphertext_save(ct)
    out, _ = S.ciphertext_load(blob, ctx)
    assert dec.decrypt(out).to_string() == p.to_string()


def test_seeded_ciphertext_roundtrip(setup):
    """Seeded save stores half the data; load must expand via the PRNG."""
    ctx, parms, keygen = setup
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    p = Plaintext.from_hex("1x^10 + 2")
    ct = enc.encrypt_symmetric(p, save_seed=True)
    blob_seeded = S.ciphertext_save(ct)
    ct_full = enc.encrypt_symmetric(p, save_seed=False)
    blob_full = S.ciphertext_save(ct_full)
    # seeded representation is roughly half the size
    assert len(blob_seeded) < 0.7 * len(blob_full)
    out, _ = S.ciphertext_load(blob_seeded, ctx)
    assert dec.decrypt(out).to_string() == p.to_string()


def test_seeded_key_roundtrips(setup):
    """Seed-compressed relin/Galois keys are ~half size and still work
    (Serializable<RelinKeys/GaloisKeys>, keygenerator.h create_*_keys)."""
    ctx, parms, keygen = setup
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    dec = Decryptor(ctx, keygen.secret_key)
    ev = Evaluator(ctx)
    p = Plaintext.from_hex("5x^3 + 1")

    rk_seeded = keygen.create_relin_keys(save_seed=True)
    rk_full = keygen.create_relin_keys(save_seed=False)
    blob_seeded = S.kswitch_keys_save(rk_seeded, ctx, S.COMPR_NONE)
    blob_full = S.kswitch_keys_save(rk_full, ctx, S.COMPR_NONE)
    assert len(blob_seeded) < 0.7 * len(blob_full)
    rk2, _ = S.kswitch_keys_load(blob_seeded, ctx, RelinKeys)
    prod = ev.relinearize(ev.multiply(enc.encrypt_symmetric(p), enc.encrypt_symmetric(p)), rk2)
    assert dec.decrypt(prod).to_string() == "19x^6 + Ax^3 + 1"

    gk_seeded = keygen.create_galois_keys(save_seed=True)
    gk2, _ = S.kswitch_keys_load(S.kswitch_keys_save(gk_seeded, ctx, S.COMPR_NONE), ctx, GaloisKeys)
    from seal_tpu.encoders import BatchEncoder

    be = BatchEncoder(ctx)
    vals = list(range(64))
    ct = enc.encrypt_symmetric(be.encode(vals))
    got = be.decode(dec.decrypt(ev.rotate_rows(ct, 1, gk2)))
    row = vals[:32]
    want = row[1:] + row[:1]
    np.testing.assert_array_equal(got, want + [v + 32 for v in want])


def test_zstd_default_when_available():
    """The default compression mode must match the reference's (zstd) when the
    backend is importable (serialization.h:49)."""
    try:
        import zstandard  # noqa: F401
    except Exception:
        pytest.skip("zstandard not available")
    assert S.COMPR_MODE_DEFAULT == S.COMPR_ZSTD
    data = b"seal tpu zstd roundtrip" * 20
    blob = S.save_header_wrapped(data, S.COMPR_ZSTD)
    out, consumed = S.load_header_wrapped(blob)
    assert out == data and consumed == len(blob)


def test_key_roundtrips(setup):
    ctx, parms, keygen = setup
    # secret key
    blob = S.secret_key_save(keygen.secret_key)
    sk2, _ = S.secret_key_load(blob, ctx)
    dec2 = Decryptor(ctx, sk2)
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    p = Plaintext.from_hex("5x^3 + 1")
    assert dec2.decrypt(enc.encrypt_symmetric(p)).to_string() == p.to_string()
    # public key
    pk = keygen.create_public_key()
    pk2, _ = S.public_key_load(S.public_key_save(pk), ctx)
    enc2 = Encryptor(ctx, public_key=pk2)
    assert dec2.decrypt(enc2.encrypt(p)).to_string() == p.to_string()
    # relin keys
    rk = keygen.create_relin_keys()
    rk2, _ = S.kswitch_keys_load(S.kswitch_keys_save(rk, ctx), ctx, RelinKeys)
    ev = Evaluator(ctx)
    prod = ev.relinearize(ev.multiply(enc.encrypt_symmetric(p), enc.encrypt_symmetric(p)), rk2)
    assert dec2.decrypt(prod).to_string() == "19x^6 + Ax^3 + 1"
    # galois keys
    gk = keygen.create_galois_keys()
    gk2, _ = S.kswitch_keys_load(S.kswitch_keys_save(gk, ctx), ctx, GaloisKeys)
    from seal_tpu.encoders import BatchEncoder

    be = BatchEncoder(ctx)
    vals = list(range(64))
    ct = enc.encrypt_symmetric(be.encode(vals))
    rot = ev.rotate_rows(ct, 1, gk2)
    got = be.decode(dec2.decrypt(rot))
    row = vals[:32]
    want = row[1:] + row[:1]
    np.testing.assert_array_equal(got, want + [v + 32 for v in want])


def test_legacy_3_4_header_upgrade():
    """A Microsoft SEAL 3.4 header (serialization.h:352: u16 magic, u8 zero,
    u8 compr_mode, u32 size, u64 reserved) is auto-upgraded on load, like
    the reference's Serialization::LoadHeader (serialization.cpp:138-168)."""
    import struct

    from seal_tpu import serialization as S

    members = struct.pack("<Q", 0x1234567890ABCDEF)
    for compr in (S.COMPR_NONE, S.COMPR_ZLIB):
        payload = S._compress(members, compr)
        legacy = struct.pack(
            "<HBBIQ", S.SEAL_MAGIC, 0, compr, S.SEAL_HEADER_SIZE + len(payload), 0
        ) + payload
        got, consumed = S.load_header_wrapped(legacy)
        assert got == members and consumed == len(legacy)
        # the leaf loader accepts the legacy wrapping end to end
        value, consumed2 = S.modulus_load(legacy)
        assert value == 0x1234567890ABCDEF and consumed2 == len(legacy)


def test_legacy_3_4_header_invalid_still_rejected():
    import struct

    import pytest

    from seal_tpu import serialization as S

    # nonzero zero_byte: neither a valid modern nor a valid 3.4 header
    bad = struct.pack("<HBBIQ", S.SEAL_MAGIC, 7, S.COMPR_NONE, 24, 0) + b"x" * 8
    with pytest.raises(ValueError):
        S.load_header_wrapped(bad)
    # legacy size pointing past the buffer
    trunc = struct.pack("<HBBIQ", S.SEAL_MAGIC, 0, S.COMPR_NONE, 1 << 20, 0)
    with pytest.raises(ValueError):
        S.load_header_wrapped(trunc)
