"""Serialization adversarial tests: malformed headers, truncated payloads,
wrong-context loads, compression-bomb bounds (serialization.cpp +
ztools.cpp hardening, tests/seal/serialization.cpp patterns)."""

import struct
import zlib

import numpy as np
import pytest

from seal_tpu import serialization as S
from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encryptor import Encryptor
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
    enc = Encryptor(ctx, secret_key=keygen.secret_key)
    ct = enc.encrypt_symmetric(Plaintext.from_hex("3x^2 + 1"))
    return ctx, parms, keygen, enc, ct


def test_wrong_magic_rejected(setup):
    ctx, parms, *_ = setup
    blob = bytearray(S.params_save(parms))
    blob[0] ^= 0xFF
    with pytest.raises(ValueError):
        S.params_load(bytes(blob))


def test_wrong_header_size_rejected(setup):
    ctx, parms, *_ = setup
    blob = bytearray(S.params_save(parms))
    blob[2] = 0x20  # header size field
    with pytest.raises(ValueError):
        S.params_load(bytes(blob))


def test_unsupported_version_rejected(setup):
    ctx, parms, *_ = setup
    blob = bytearray(S.params_save(parms))
    blob[3] = 99  # major version
    with pytest.raises(ValueError):
        S.params_load(bytes(blob))


def test_truncated_payload_rejected(setup):
    ctx, parms, _, _, ct = setup
    blob = S.ciphertext_save(ct, S.COMPR_NONE)
    for cut in (8, 15, len(blob) // 2, len(blob) - 1):
        with pytest.raises(ValueError):
            S.ciphertext_load(blob[:cut], ctx)


def test_short_header_rejected():
    with pytest.raises(ValueError):
        S.load_header_wrapped(b"\xa1\x5e")


def test_garbage_payload_rejected(setup):
    ctx, *_ = setup
    members = b"\x00" * 64
    blob = S.save_header_wrapped(members, S.COMPR_NONE)
    with pytest.raises(ValueError):
        S.ciphertext_load(blob, ctx)


def test_ciphertext_wrong_context_rejected(setup):
    ctx, parms, _, _, ct = setup
    other = EncryptionParameters(SchemeType.BFV)
    other.set_poly_modulus_degree(128)
    other.set_plain_modulus(PlainModulus.batching(128, 20).value)
    other.set_coeff_modulus(CoeffModulus.create(128, [40, 40]))
    ctx2 = SealContext(other, True, SecurityLevel.NONE)
    blob = S.ciphertext_save(ct)
    with pytest.raises(ValueError):
        S.ciphertext_load(blob, ctx2)


def test_oversized_dynarray_rejected(setup):
    """A blob declaring more coefficients than the metadata allows must be
    rejected (DynArray bound check on load)."""
    ctx, parms, _, _, ct = setup
    members, _ = S.load_header_wrapped(S.ciphertext_save(ct, S.COMPR_NONE))
    # metadata: parms_id(32) + ntt(1) + size(8) + degree(8) + k(8) + scale(8) + cf(8)
    k = 3
    degree = 64
    arr = np.zeros(2 * k * degree + 64, dtype="<u8")
    body = members[:73] + S.dynarray_save(arr)
    blob = S.save_header_wrapped(body, S.COMPR_NONE)
    with pytest.raises(ValueError):
        S.ciphertext_load(blob, ctx)


def test_zlib_bomb_bound():
    """Decompressed size beyond the declared bound must be rejected, not
    allocated (ztools.cpp CVE-hardening, CHANGES v4.3.3)."""
    huge = zlib.compress(b"\x00" * (1 << 20), 9)  # 1 MiB of zeros, ~1 KiB blob
    size = S.SEAL_HEADER_SIZE + len(huge)
    header = struct.pack(
        "<HBBBBHQ", S.SEAL_MAGIC, S.SEAL_HEADER_SIZE, S.VERSION_MAJOR,
        S.VERSION_MINOR, S.COMPR_ZLIB, 0, size,
    )
    out, _ = S.load_header_wrapped(header + huge)
    assert len(out) == 1 << 20  # under the global bound: fine
    # now patch the module bound down and confirm rejection
    old = S.MAX_DECOMPRESSED_SIZE
    try:
        S.MAX_DECOMPRESSED_SIZE = 1 << 10
        with pytest.raises(ValueError):
            S.load_header_wrapped(header + huge)
    finally:
        S.MAX_DECOMPRESSED_SIZE = old


def test_seeded_ciphertext_with_wrong_size_rejected(setup):
    """A seeded blob claiming size != 2 is malformed."""
    ctx, parms, keygen, enc, _ = setup
    ct = enc.encrypt_symmetric(Plaintext.from_hex("1"), save_seed=True)
    blob = bytearray(S.ciphertext_save(ct, S.COMPR_NONE))
    members, consumed = S.load_header_wrapped(bytes(blob))
    m = bytearray(members)
    m[33:41] = struct.pack("<Q", 3)  # size field after parms_id+ntt byte
    bad = S.save_header_wrapped(bytes(m), S.COMPR_NONE)
    with pytest.raises(ValueError):
        S.ciphertext_load(bad, ctx)


def test_loaded_ciphertext_still_decrypts_after_roundtrip_chain(setup):
    """save -> load -> save -> load across compression modes."""
    ctx, parms, keygen, enc, ct = setup
    dec = Decryptor(ctx, keygen.secret_key)
    modes = [S.COMPR_NONE, S.COMPR_ZLIB]
    if S.COMPR_MODE_DEFAULT == S.COMPR_ZSTD:
        modes.append(S.COMPR_ZSTD)
    blob = None
    cur = ct
    for mode in modes:
        blob = S.ciphertext_save(cur, mode)
        cur, _ = S.ciphertext_load(blob, ctx)
    assert dec.decrypt(cur).to_string() == "3x^2 + 1"


def test_secret_key_wrong_level_rejected(setup):
    """A secret key blob whose parms_id is a data level (not the key level)
    must be rejected by Decryptor construction."""
    ctx, parms, keygen, *_ = setup
    blob = bytearray(S.secret_key_save(keygen.secret_key))
    # corrupt parms_id inside the plaintext members: flip a byte far enough
    # into the payload to hit the id (header 16 + 0..32 = parms_id)
    blob[17] ^= 0x01
    loaded = None
    try:
        loaded, _ = S.secret_key_load(bytes(blob), ctx)
    except ValueError:
        return  # rejected at load: fine
    with pytest.raises(ValueError):
        Decryptor(ctx, loaded)
