"""Exhaustive Galois-automorphism battery: apply_galois over EVERY valid odd
Galois element at small N, asserted bit-exactly against an independent
plaintext automorphism model m(x) -> m(x^g) over Z_t[x]/(x^N+1), plus
composition/inverse algebra, rotation-consistency, and the CKKS
conjugate/rotate equivalences.

Mirrors the reference's GaloisTool + Evaluator Galois tests
(native/tests/seal/util/galois.cpp, native/tests/seal/evaluator.cpp
rotate/apply_galois sections) with model-recomputed expectations instead of
copied fixtures, at a depth (all 2N/2 elements, both coeff- and NTT-domain
key-switch paths) the per-op batteries do not reach."""

import numpy as np
import pytest

from seal_tpu.ckks_encoder import CKKSEncoder
from seal_tpu.context import SealContext
from seal_tpu.data import Plaintext
from seal_tpu.decryptor import Decryptor
from seal_tpu.encoders import BatchEncoder
from seal_tpu.encryptor import Encryptor
from seal_tpu.evaluator import Evaluator
from seal_tpu.keygen import KeyGenerator
from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
from seal_tpu.params import EncryptionParameters, SchemeType


# ---------------------------------------------------------------------------
# independent plaintext model of the automorphism x -> x^g
# ---------------------------------------------------------------------------

def p_galois(a, g, t):
    """Apply m(x) -> m(x^g) in Z_t[x]/(x^N + 1) by exact index folding."""
    n = len(a)
    out = np.zeros(n, dtype=object)
    for i in range(n):
        idx = (i * g) % (2 * n)
        if idx < n:
            out[idx] = (out[idx] + int(a[i])) % t
        else:
            out[idx - n] = (out[idx - n] - int(a[i])) % t
    return out % t


def _mk_int_env(scheme, n=16, t_bits=17):
    parms = EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(n, t_bits))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    return {
        "n": n,
        "t": parms.plain_modulus.value,
        "ctx": ctx,
        "kg": kg,
        "enc": Encryptor(ctx, secret_key=kg.secret_key),
        "dec": Decryptor(ctx, kg.secret_key),
        "ev": Evaluator(ctx),
    }


def _pt(coeffs, t):
    return Plaintext.from_coeffs(
        np.asarray([int(c) % int(t) for c in coeffs], dtype=np.uint64)
    )


def _coeffs(pt, n):
    out = np.zeros(n, dtype=object)
    c = np.asarray(pt.coeff_data, dtype=np.uint64)
    out[: len(c)] = c.astype(object)
    return out


@pytest.fixture(scope="module", params=[SchemeType.BFV, SchemeType.BGV],
                ids=["bfv", "bgv"])
def ienv(request):
    return _mk_int_env(request.param)


def test_apply_galois_every_element_exact(ienv):
    """All N odd elements g in [1, 2N): ciphertext automorphism must equal the
    plaintext model bit-exactly (coeff-domain path for BFV, NTT-domain
    permutation path for BGV — both key-switch flavors covered)."""
    n, t = ienv["n"], ienv["t"]
    elts = list(range(1, 2 * n, 2))
    gk = ienv["kg"].create_galois_keys(elts)
    rng = np.random.default_rng(7)
    a = rng.integers(0, t, n).astype(object)
    ct = ienv["enc"].encrypt_symmetric(_pt(a, t))
    for g in elts:
        out = ienv["ev"].apply_galois(ct, g, gk)
        got = _coeffs(ienv["dec"].decrypt(out), n)
        want = p_galois(a, g, t)
        assert np.array_equal(got, want), f"elt {g} mismatch"


def test_apply_galois_composition(ienv):
    """apply(g2, apply(g1, ct)) == apply(g1*g2 mod 2N, ct) exactly."""
    n, t = ienv["n"], ienv["t"]
    g1, g2 = 3, 2 * n - 1
    g12 = (g1 * g2) % (2 * n)
    gk = ienv["kg"].create_galois_keys([g1, g2, g12])
    rng = np.random.default_rng(11)
    a = rng.integers(0, t, n).astype(object)
    ct = ienv["enc"].encrypt_symmetric(_pt(a, t))
    two_step = ienv["ev"].apply_galois(ienv["ev"].apply_galois(ct, g1, gk), g2, gk)
    one_step = ienv["ev"].apply_galois(ct, g12, gk)
    d2 = _coeffs(ienv["dec"].decrypt(two_step), n)
    d1 = _coeffs(ienv["dec"].decrypt(one_step), n)
    assert np.array_equal(d1, d2)
    assert np.array_equal(d1, p_galois(a, g12, t))


def test_apply_galois_inverse_roundtrip(ienv):
    """g * g^-1 = 1 mod 2N: applying both recovers the original plaintext."""
    n, t = ienv["n"], ienv["t"]
    g = 3
    ginv = pow(g, -1, 2 * n)
    gk = ienv["kg"].create_galois_keys([g, ginv])
    rng = np.random.default_rng(13)
    a = rng.integers(0, t, n).astype(object)
    ct = ienv["enc"].encrypt_symmetric(_pt(a, t))
    back = ienv["ev"].apply_galois(ienv["ev"].apply_galois(ct, g, gk), ginv, gk)
    assert np.array_equal(_coeffs(ienv["dec"].decrypt(back), n), a)


def test_galois_keys_from_steps_match_elements(ienv):
    """create_galois_keys_from_steps stores keys under the exact element the
    rotation path looks up (get_elt_from_step parity, galoistool.cpp)."""
    ctx = ienv["ctx"]
    gt = ctx.key_context_data().galois_tool
    steps = [1, -1, 2, ienv["n"] // 4 - 1]
    gk = ienv["kg"].create_galois_keys_from_steps(steps)
    for s in steps:
        elt = gt.get_elt_from_step(s)
        assert gk.has_key(elt)


def test_rotate_rows_model(ienv):
    """rotate_rows against an explicit slot-matrix model at several steps."""
    n, t = ienv["n"], ienv["t"]
    be = BatchEncoder(ienv["ctx"])
    row = n // 2
    rng = np.random.default_rng(17)
    mat = rng.integers(0, t, n).astype(np.uint64)
    ct = ienv["enc"].encrypt_symmetric(be.encode(mat))
    gk = ienv["kg"].create_galois_keys_from_steps([1, -1, 3, row // 2])
    for s in [1, -1, 3, row // 2]:
        out = ienv["ev"].rotate_rows(ct, s, gk)
        got = np.asarray(be.decode(ienv["dec"].decrypt(out)), dtype=np.uint64)
        want = np.concatenate([np.roll(mat[:row], -s), np.roll(mat[row:], -s)])
        assert np.array_equal(got, want), f"step {s}"


def test_rotate_columns_involution(ienv):
    """rotate_columns swaps the two slot rows; applying twice is identity."""
    n, t = ienv["n"], ienv["t"]
    be = BatchEncoder(ienv["ctx"])
    row = n // 2
    rng = np.random.default_rng(19)
    mat = rng.integers(0, t, n).astype(np.uint64)
    ct = ienv["enc"].encrypt_symmetric(be.encode(mat))
    gk = ienv["kg"].create_galois_keys([2 * n - 1])
    once = ienv["ev"].rotate_columns(ct, gk)
    got = np.asarray(be.decode(ienv["dec"].decrypt(once)), dtype=np.uint64)
    assert np.array_equal(got, np.concatenate([mat[row:], mat[:row]]))
    twice = ienv["ev"].rotate_columns(once, gk)
    got2 = np.asarray(be.decode(ienv["dec"].decrypt(twice)), dtype=np.uint64)
    assert np.array_equal(got2, mat)


def test_rotate_composition_covers_all_offsets(ienv):
    """Composing step-1 rotations k times equals a single step-k rotation for
    every k in the row (reference NAF-rotation consistency)."""
    n, t = ienv["n"], ienv["t"]
    be = BatchEncoder(ienv["ctx"])
    row = n // 2
    rng = np.random.default_rng(23)
    mat = rng.integers(0, t, n).astype(np.uint64)
    gk = ienv["kg"].create_galois_keys_from_steps(list(range(1, row)) + [-1])
    ct = ienv["enc"].encrypt_symmetric(be.encode(mat))
    acc = ct
    for k in range(1, row):
        acc = ienv["ev"].rotate_rows(acc, 1, gk)
        direct = ienv["ev"].rotate_rows(ct, k, gk)
        da = np.asarray(be.decode(ienv["dec"].decrypt(acc)), dtype=np.uint64)
        dd = np.asarray(be.decode(ienv["dec"].decrypt(direct)), dtype=np.uint64)
        assert np.array_equal(da, dd), f"k={k}"


def test_apply_galois_preserves_scale_and_level(ienv):
    """Automorphism must not change level, scale, or correction factor."""
    n, t = ienv["n"], ienv["t"]
    rng = np.random.default_rng(29)
    a = rng.integers(0, t, n).astype(object)
    ct = ienv["enc"].encrypt_symmetric(_pt(a, t))
    gk = ienv["kg"].create_galois_keys([3])
    out = ienv["ev"].apply_galois(ct, 3, gk)
    assert out.parms_id == ct.parms_id
    assert out.scale == ct.scale
    assert out.correction_factor == ct.correction_factor
    assert out.is_ntt_form == ct.is_ntt_form


def test_apply_galois_after_mod_switch(ienv):
    """Galois keys live at the key level; apply_galois must still work (and be
    exact) on a ciphertext switched below the first level."""
    # rebuild with a 3-limb chain so there is a level to drop to
    parms = EncryptionParameters(ienv["ctx"].first_context_data().parms.scheme)
    parms.set_poly_modulus_degree(16)
    parms.set_coeff_modulus(CoeffModulus.create(16, [40, 40, 40]))
    parms.set_plain_modulus(PlainModulus.batching(16, 17))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    enc = Encryptor(ctx, secret_key=kg.secret_key)
    dec = Decryptor(ctx, kg.secret_key)
    ev = Evaluator(ctx)
    t = parms.plain_modulus.value
    rng = np.random.default_rng(31)
    a = rng.integers(0, t, 16).astype(object)
    gk = kg.create_galois_keys([3])
    ct = ev.mod_switch_to_next(enc.encrypt_symmetric(_pt(a, t)))
    out = ev.apply_galois(ct, 3, gk)
    assert np.array_equal(_coeffs(dec.decrypt(out), 16), p_galois(a, 3, t))


# ---------------------------------------------------------------------------
# CKKS equivalences
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckks():
    n = 64
    parms = EncryptionParameters(SchemeType.CKKS)
    parms.set_poly_modulus_degree(n)
    parms.set_coeff_modulus(CoeffModulus.create(n, [50, 40, 50]))
    ctx = SealContext(parms, True, SecurityLevel.NONE)
    kg = KeyGenerator(ctx)
    return {
        "n": n,
        "scale": 2.0**40,
        "ctx": ctx,
        "kg": kg,
        "enc": Encryptor(ctx, secret_key=kg.secret_key),
        "dec": Decryptor(ctx, kg.secret_key),
        "ev": Evaluator(ctx),
        "encoder": CKKSEncoder(ctx),
    }


def test_ckks_conjugate_is_galois_2n_minus_1(ckks):
    """complex_conjugate == apply_galois(2N-1) == elementwise conj of slots."""
    n = ckks["n"]
    slots = n // 2
    rng = np.random.default_rng(37)
    vals = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
    ct = ckks["enc"].encrypt_symmetric(ckks["encoder"].encode(vals, ckks["scale"]))
    gk = ckks["kg"].create_galois_keys([2 * n - 1])
    via_conj = ckks["ev"].complex_conjugate(ct, gk)
    via_galois = ckks["ev"].apply_galois(ct, 2 * n - 1, gk)
    d1 = np.asarray(ckks["encoder"].decode(ckks["dec"].decrypt(via_conj)))
    d2 = np.asarray(ckks["encoder"].decode(ckks["dec"].decrypt(via_galois)))
    assert np.allclose(d1, d2, atol=1e-6)
    assert np.allclose(d1, np.conj(vals), atol=1e-5)


def test_ckks_rotate_vector_matches_galois_element(ckks):
    """rotate_vector(k) must equal apply_galois(get_elt_from_step(k))."""
    n = ckks["n"]
    slots = n // 2
    gt = ckks["ctx"].key_context_data().galois_tool
    rng = np.random.default_rng(41)
    vals = rng.uniform(-1, 1, slots) + 1j * rng.uniform(-1, 1, slots)
    ct = ckks["enc"].encrypt_symmetric(ckks["encoder"].encode(vals, ckks["scale"]))
    for k in [1, -1, 5, slots // 2]:
        elt = gt.get_elt_from_step(k)
        gk = ckks["kg"].create_galois_keys([elt])
        via_rot = ckks["ev"].rotate_vector(ct, k, gk)
        via_gal = ckks["ev"].apply_galois(ct, elt, gk)
        d1 = np.asarray(ckks["encoder"].decode(ckks["dec"].decrypt(via_rot)))
        d2 = np.asarray(ckks["encoder"].decode(ckks["dec"].decrypt(via_gal)))
        assert np.allclose(d1, d2, atol=1e-6)
        assert np.allclose(d1, np.roll(vals, -k), atol=1e-5), f"step {k}"


def test_ckks_rotation_survives_rescale(ckks):
    """Rotate after multiply+rescale (keys above ct level), exact slots."""
    n = ckks["n"]
    slots = n // 2
    rng = np.random.default_rng(43)
    vals = rng.uniform(-1, 1, slots)
    enc = ckks["encoder"]
    ct = ckks["enc"].encrypt_symmetric(enc.encode(vals, ckks["scale"]))
    rk = ckks["kg"].create_relin_keys()
    gk = ckks["kg"].create_galois_keys_from_steps([2])
    prod = ckks["ev"].rescale_to_next(
        ckks["ev"].relinearize(ckks["ev"].multiply(ct, ct), rk)
    )
    rot = ckks["ev"].rotate_vector(prod, 2, gk)
    got = np.real(np.asarray(enc.decode(ckks["dec"].decrypt(rot))))
    assert np.allclose(got, np.roll(vals * vals, -2), atol=1e-4)


def test_galois_ntt_mxu_structure_and_equivalence():
    """The MXU permutation formulation (row-take + one-hot int8
    contraction, ops/poly.py:apply_galois_ntt_mxu) is bit-identical to the
    gather for every generator power and the conjugation element."""
    import jax.numpy as jnp

    from seal_tpu.ops import poly as P
    from seal_tpu.ops import u64 as U

    rng = np.random.default_rng(11)
    for n in (256, 4096):
        elts = [P.get_elt_from_step(s, n) for s in (1, 2, 5, -1)] + [2 * n - 1]
        for elt in elts:
            tab = P.make_galois_table_ntt(n, elt)
            st = P.galois_ntt_structure(tab)
            assert st is not None, (n, elt)
            x = rng.integers(0, 1 << 61, (2, 3, n), dtype=np.uint64)
            xd = U.from_np_u64(x)
            want = U.to_np_u64(P.apply_galois_ntt(xd, jnp.asarray(tab)))
            got = U.to_np_u64(
                P.apply_galois_ntt_mxu(xd, jnp.asarray(st[0]), jnp.asarray(st[1]))
            )
            np.testing.assert_array_equal(got, want, err_msg=f"n={n} elt={elt}")
