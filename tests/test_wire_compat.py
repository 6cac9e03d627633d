"""Wire-format cross-compatibility against reference-produced blobs.

``tests/data/wire`` holds blobs emitted by the REFERENCE implementation
(built from /root/reference with compression off) via
``tools/wire_compat/gen_blobs.cpp``, with a fixed blake2xb PRNG seed.
These tests prove:

  * byte-identical save for deterministic formats (EncryptionParameters),
  * bit-exact PRNG/sampler parity (fixed-seed keygen reproduces the
    reference's secret key byte-for-byte),
  * functional parity (reference ciphertexts/keys decrypt and key-switch
    correctly here, including seeded half-size objects),
  * and, when the reference binary is present (tools/wire_compat/build.sh),
    the reverse direction: blobs we save load and decrypt in the reference.

Reference anchors: serialization.h:58-97, ciphertext.cpp:190-247,
rlwe.cpp:104-135 (sample_poly_uniform), keygenerator.cpp:56-120.
"""

import os
import struct
import subprocess

import numpy as np
import pytest

from seal_tpu import (
    BatchEncoder,
    CKKSEncoder,
    Decryptor,
    Encryptor,
    Evaluator,
    GaloisKeys,
    KeyGenerator,
    Plaintext,
    RelinKeys,
    SealContext,
    SecurityLevel,
)
from seal_tpu import serialization as ser
from seal_tpu.random.prng import PRNGType, UniformRandomGeneratorFactory

DATA = os.path.join(os.path.dirname(__file__), "data", "wire")

FIXED_SEED = tuple(0x1111111111111111 * (i + 1) for i in range(8))


def _blob(name: str) -> bytes:
    with open(os.path.join(DATA, name), "rb") as f:
        return f.read()


def _manifest() -> dict:
    out = {"ckks_vals": {}, "bfv4096_rot_slots": {}}
    with open(os.path.join(DATA, "manifest.txt")) as f:
        for line in f:
            parts = line.strip().split(" ", 1)
            if not parts[0]:
                continue
            if parts[0] == "ckks_val":
                idx, val = parts[1].split(" ", 1)
                out["ckks_vals"][int(idx)] = float(val)
            elif parts[0] == "bfv4096_rot_slot":
                idx, val = parts[1].split(" ", 1)
                out["bfv4096_rot_slots"][int(idx)] = int(val)
            elif parts[0].endswith("_hex"):
                out[parts[0]] = parts[1]
    return out


def _context(scheme: str) -> SealContext:
    parms, _ = ser.params_load(_blob(f"{scheme}_parms.bin"))
    parms.set_random_generator(
        UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, default_seed=FIXED_SEED)
    )
    return SealContext(parms, expand_mod_chain=True, sec_level=SecurityLevel.NONE)


MANIFEST = _manifest()


# ---------------------------------------------------------------------------
# Byte-identical deterministic formats
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["bfv", "bgv", "ckks"])
def test_params_byte_identical(scheme):
    raw = _blob(f"{scheme}_parms.bin")
    parms, consumed = ser.params_load(raw)
    assert consumed == len(raw)
    assert ser.params_save(parms, ser.COMPR_NONE) == raw


# ---------------------------------------------------------------------------
# PRNG/sampler parity: fixed-seed keygen reproduces the reference secret key
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme", ["bfv", "bgv", "ckks"])
def test_fixed_seed_secret_key_byte_identical(scheme):
    ctx = _context(scheme)
    keygen = KeyGenerator(ctx)
    ours = ser.secret_key_save(keygen.secret_key, ser.COMPR_NONE)
    assert ours == _blob(f"{scheme}_sk.bin")


def test_fixed_seed_public_key_matches_reference():
    # pk = encrypt_zero_symmetric under the same PRNG stream; matching bytes
    # proves ternary/CBD/uniform sampler + NTT parity end-to-end.
    ctx = _context("bfv")
    keygen = KeyGenerator(ctx)
    pk = keygen.create_public_key()
    ours = ser.public_key_save(pk, ser.COMPR_NONE)
    assert ours == _blob("bfv_pk.bin")


# ---------------------------------------------------------------------------
# Reference ciphertexts decrypt correctly here
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scheme,key", [("bfv", "bfv_pt_hex"), ("bgv", "bgv_pt_hex")])
def test_reference_ciphertext_decrypts(scheme, key):
    ctx = _context(scheme)
    sk, _ = ser.secret_key_load(_blob(f"{scheme}_sk.bin"), ctx)
    ct, _ = ser.ciphertext_load(_blob(f"{scheme}_ct.bin"), ctx)
    dec = Decryptor(ctx, sk).decrypt(ct)
    assert dec.to_string() == MANIFEST[key]


@pytest.mark.parametrize("scheme,key", [("bfv", "bfv_pt_hex"), ("bgv", "bgv_pt_hex")])
def test_reference_seeded_ciphertext_decrypts(scheme, key):
    ctx = _context(scheme)
    sk, _ = ser.secret_key_load(_blob(f"{scheme}_sk.bin"), ctx)
    raw = _blob(f"{scheme}_ct_seeded.bin")
    # seeded blob is roughly half the full size
    assert len(raw) < 0.7 * len(_blob(f"{scheme}_ct.bin"))
    ct, _ = ser.ciphertext_load(raw, ctx)
    dec = Decryptor(ctx, sk).decrypt(ct)
    assert dec.to_string() == MANIFEST[key]


def test_reference_homomorphic_result_decrypts():
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk.bin"), ctx)
    ct, _ = ser.ciphertext_load(_blob("bfv_ct_prod.bin"), ctx)
    dec = Decryptor(ctx, sk).decrypt(ct)
    assert dec.to_string() == MANIFEST["bfv_prod_hex"]


def test_reference_plaintext_loads():
    raw = _blob("bfv_pt.bin")
    pt, consumed = ser.plaintext_load(raw, _context("bfv"))
    assert consumed == len(raw)
    assert pt.to_string() == MANIFEST["bfv_pt_hex"]
    assert ser.plaintext_save(pt, ser.COMPR_NONE) == raw


# ---------------------------------------------------------------------------
# Reference keys work in our evaluator (full and seeded)
# ---------------------------------------------------------------------------

def test_reference_relin_keys_work():
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk.bin"), ctx)
    rlk, _ = ser.kswitch_keys_load(_blob("bfv_rlk.bin"), ctx, RelinKeys)
    ct, _ = ser.ciphertext_load(_blob("bfv_ct.bin"), ctx)
    ev = Evaluator(ctx)
    prod = ev.multiply(ct, ct)
    prod = ev.relinearize(prod, rlk)
    prod = ev.add(prod, ct)
    dec = Decryptor(ctx, sk).decrypt(prod)
    assert dec.to_string() == MANIFEST["bfv_prod_hex"]


def test_reference_seeded_relin_keys_work():
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk.bin"), ctx)
    full = _blob("bfv_rlk.bin")
    raw = _blob("bfv_rlk_seeded.bin")
    assert len(raw) < 0.7 * len(full)
    rlk, _ = ser.kswitch_keys_load(raw, ctx, RelinKeys)
    ct, _ = ser.ciphertext_load(_blob("bfv_ct.bin"), ctx)
    ev = Evaluator(ctx)
    prod = ev.relinearize(ev.multiply(ct, ct), rlk)
    prod = ev.add(prod, ct)
    dec = Decryptor(ctx, sk).decrypt(prod)
    assert dec.to_string() == MANIFEST["bfv_prod_hex"]


def test_reference_galois_keys_work():
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk.bin"), ctx)
    glk, _ = ser.kswitch_keys_load(_blob("bfv_glk.bin"), ctx, GaloisKeys)
    enc = BatchEncoder(ctx)
    n = enc.slots
    vals = np.arange(n, dtype=np.uint64) % 17
    pt = enc.encode(vals)
    encryptor = Encryptor(ctx, secret_key=sk)
    ct = encryptor.encrypt_symmetric(pt)
    ev = Evaluator(ctx)
    rot = ev.rotate_rows(ct, 1, glk)
    out = enc.decode(Decryptor(ctx, sk).decrypt(rot))
    half = n // 2
    expect = np.concatenate([np.roll(vals[:half], -1), np.roll(vals[half:], -1)])
    assert np.array_equal(out, expect)


def test_fixed_seed_relin_keys_byte_identical():
    """Full-depth PRNG parity: every per-limb encrypt-zero stream, the
    secret-key power, and the KSwitchKeys container format all match
    (keygenerator.cpp:327-360 + kswitchkeys save)."""
    ctx = _context("bfv")
    kg = KeyGenerator(ctx)
    rlk = kg.create_relin_keys()
    assert ser.kswitch_keys_save(rlk, ctx, ser.COMPR_NONE) == _blob("bfv_rlk.bin")


def test_fixed_seed_galois_keys_byte_identical():
    ctx = _context("bfv")
    kg = KeyGenerator(ctx)
    glk = kg.create_galois_keys_from_steps([1, -1])
    assert ser.kswitch_keys_save(glk, ctx, ser.COMPR_NONE) == _blob("bfv_glk.bin")


# ---------------------------------------------------------------------------
# Compressed reference streams (zlib/zstd) — serialization.h:23, ztools.cpp
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["zlib", "zstd"])
def test_reference_compressed_ciphertext_loads(mode):
    if mode == "zstd" and not ser._HAS_ZSTD:
        pytest.skip("zstandard not available")
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk.bin"), ctx)
    raw = _blob(f"bfv_ct_{mode}.bin")
    assert len(raw) < len(_blob("bfv_ct.bin"))  # actually compressed
    ct, consumed = ser.ciphertext_load(raw, ctx)
    assert consumed == len(raw)
    dec = Decryptor(ctx, sk).decrypt(ct)
    assert dec.to_string() == MANIFEST["bfv_pt_hex"]
    # and the decompressed payload is the same ciphertext: byte-identical
    # re-save under compr none vs the reference's uncompressed blob
    assert ser.ciphertext_save(ct, ser.COMPR_NONE) == _blob("bfv_ct.bin")


def test_reference_compressed_secret_key_loads():
    ctx = _context("bfv")
    sk, _ = ser.secret_key_load(_blob("bfv_sk_zstd.bin"), ctx)
    assert ser.secret_key_save(sk, ser.COMPR_NONE) == _blob("bfv_sk.bin")


# ---------------------------------------------------------------------------
# Production-shaped parameter point: BFV N=4096, default 128-bit chain
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ctx4096():
    parms, _ = ser.params_load(_blob("bfv4096_parms.bin"))
    parms.set_random_generator(
        UniformRandomGeneratorFactory(PRNGType.BLAKE2XB, default_seed=FIXED_SEED)
    )
    return SealContext(parms, expand_mod_chain=True, sec_level=SecurityLevel.TC128)


def test_4096_params_byte_identical(ctx4096):
    raw = _blob("bfv4096_parms.bin")
    assert ser.params_save(ctx4096.key_context_data().parms, ser.COMPR_NONE) == raw


def test_4096_fixed_seed_keys_byte_identical(ctx4096):
    kg = KeyGenerator(ctx4096)
    assert ser.secret_key_save(kg.secret_key, ser.COMPR_NONE) == _blob("bfv4096_sk.bin")
    pk = kg.create_public_key()
    assert ser.public_key_save(pk, ser.COMPR_NONE) == _blob("bfv4096_pk.bin")
    glk = kg.create_galois_keys_from_steps([1])
    assert ser.kswitch_keys_save(glk, ctx4096, ser.COMPR_NONE) == _blob("bfv4096_glk.bin")


def test_4096_reference_ciphertext_rotates_and_decrypts(ctx4096):
    sk, _ = ser.secret_key_load(_blob("bfv4096_sk.bin"), ctx4096)
    glk, _ = ser.kswitch_keys_load(_blob("bfv4096_glk.bin"), ctx4096, GaloisKeys)
    ct, _ = ser.ciphertext_load(_blob("bfv4096_ct.bin"), ctx4096)
    # compressed variants decode to the identical ciphertext
    ct_z, _ = ser.ciphertext_load(_blob("bfv4096_ct_zlib.bin"), ctx4096)
    assert ser.ciphertext_save(ct_z, ser.COMPR_NONE) == ser.ciphertext_save(ct, ser.COMPR_NONE)
    ev = Evaluator(ctx4096)
    rot = ev.rotate_rows(ct, 1, glk)
    dec = Decryptor(ctx4096, sk)
    out = BatchEncoder(ctx4096).decode(dec.decrypt(rot))
    for i, v in MANIFEST["bfv4096_rot_slots"].items():
        assert out[i] == v


# ---------------------------------------------------------------------------
# CKKS
# ---------------------------------------------------------------------------

def test_reference_ckks_plaintext_decodes():
    ctx = _context("ckks")
    pt, _ = ser.plaintext_load(_blob("ckks_pt.bin"), ctx)
    vals = CKKSEncoder(ctx).decode(pt)
    for i, v in MANIFEST["ckks_vals"].items():
        assert abs(vals[i].real - v) < 1e-4
        assert abs(vals[i].imag) < 1e-4


def test_reference_ckks_ciphertext_decrypts():
    ctx = _context("ckks")
    sk, _ = ser.secret_key_load(_blob("ckks_sk.bin"), ctx)
    ct, _ = ser.ciphertext_load(_blob("ckks_ct.bin"), ctx)
    pt = Decryptor(ctx, sk).decrypt(ct)
    vals = CKKSEncoder(ctx).decode(pt)
    for i, v in MANIFEST["ckks_vals"].items():
        assert abs(vals[i].real - v) < 1e-3


# ---------------------------------------------------------------------------
# Reverse direction: our blobs load in the reference binary (when built)
# ---------------------------------------------------------------------------

VERIFY_BIN = "/tmp/wire_compat/verify_blobs"
LIBSEAL = "/tmp/seal-build/lib/libseal-4.4.a"


def _ensure_verify_bin() -> bool:
    """Build the reference-side verifier if a libseal build is present.

    The library build itself (~10 min) is out of scope for a test run, but
    the final link (~5 s) is not — so the reverse-direction check runs
    whenever the environment has the reference built (CI does, via
    tools/wire_compat/build.sh step), instead of being permanently skipped.
    """
    if os.path.exists(VERIFY_BIN):
        return True
    if not os.path.exists(LIBSEAL):
        return False
    script = os.path.join(os.path.dirname(__file__), "..", "tools", "wire_compat", "build.sh")
    try:
        subprocess.run(["bash", script], capture_output=True, timeout=300, check=True)
    except (subprocess.SubprocessError, OSError):
        return False
    return os.path.exists(VERIFY_BIN)


@pytest.mark.skipif(not _ensure_verify_bin(), reason="reference build not present (libseal missing)")
def test_our_blobs_load_in_reference(tmp_path):
    ctx = _context("bfv")
    keygen = KeyGenerator(ctx)
    sk = keygen.secret_key
    pt = Plaintext.from_hex("7x^4 + 3x^2 + 2x^1 + 9")
    encryptor = Encryptor(ctx, secret_key=sk)
    ct = encryptor.encrypt_symmetric(pt)

    (tmp_path / "bfv_parms.bin").write_bytes(
        ser.params_save(ctx.key_context_data().parms, ser.COMPR_NONE))
    (tmp_path / "bfv_sk.bin").write_bytes(ser.secret_key_save(sk, ser.COMPR_NONE))
    (tmp_path / "bfv_ct.bin").write_bytes(ser.ciphertext_save(ct, ser.COMPR_NONE))

    out = subprocess.run([VERIFY_BIN, str(tmp_path)], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "bfv_hex 7x^4 + 3x^2 + 2x^1 + 9" in out.stdout


@pytest.mark.skipif(not _ensure_verify_bin(), reason="reference build not present (libseal missing)")
@pytest.mark.parametrize("mode", ["zlib", "zstd"])
def test_our_compressed_blobs_load_in_reference(tmp_path, mode):
    """Reverse direction for COMPRESSED streams: the reference's inflate
    path (ztools.cpp:101-300) accepts our zlib/zstd output."""
    if mode == "zstd" and not ser._HAS_ZSTD:
        pytest.skip("zstandard not available")
    compr = ser.COMPR_ZLIB if mode == "zlib" else ser.COMPR_ZSTD
    ctx = _context("bfv")
    keygen = KeyGenerator(ctx)
    sk = keygen.secret_key
    pt = Plaintext.from_hex("5x^3 + 1x^2 + 8")
    encryptor = Encryptor(ctx, secret_key=sk)
    ct = encryptor.encrypt_symmetric(pt)

    (tmp_path / "bfv_parms.bin").write_bytes(
        ser.params_save(ctx.key_context_data().parms, ser.COMPR_NONE))
    (tmp_path / "bfv_sk.bin").write_bytes(ser.secret_key_save(sk, compr))
    (tmp_path / "bfv_ct.bin").write_bytes(ser.ciphertext_save(ct, compr))

    out = subprocess.run([VERIFY_BIN, str(tmp_path)], capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "bfv_hex 5x^3 + 1x^2 + 8" in out.stdout
