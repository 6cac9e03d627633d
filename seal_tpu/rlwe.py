"""RLWE encryptions of zero (the core of keygen/encrypt).

Counterpart of ``util/rlwe.cpp:190-407``.  Sampling happens host-side
(numpy over the deterministic PRNG byte stream, same draw order as the
reference); ring arithmetic happens on device via the NTT/poly kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .context import ContextData, SealContext
from .data import Ciphertext, PublicKey, SecretKey
from .params import ParmsId, SchemeType
from .ops import ntt as NTT
from .ops import u64 as U
from .random import UniformRandomGeneratorFactory, UniformRandomGeneratorInfo
from .random.prng import PRNG_SEED_BYTE_COUNT
from .random.sampler import (
    sample_poly_cbd,
    sample_poly_normal,
    sample_poly_ternary,
    sample_poly_uniform,
)


def _noise_sampler_for(parms):
    """Per-parameter noise sampler (EncryptionParameters.set_noise_sampler)."""
    return sample_poly_normal if parms.noise_sampler == "gaussian" else sample_poly_cbd


def _stack(polys) -> U.U64:
    los, his = zip(*polys)
    return jnp.stack(los), jnp.stack(his)


def _jit(context, key, builder):
    cache = context._jit_cache
    fn = cache.get(key)
    if fn is None:
        import jax

        fn = jax.jit(builder)
        cache[key] = fn
    return fn


def encrypt_zero_symmetric(
    secret_key: SecretKey,
    context: SealContext,
    parms_id: ParmsId,
    is_ntt_form: bool,
    save_seed: bool = False,
    bootstrap_prng=None,
) -> Ciphertext:
    """(c0, c1) = ([-(as+e)]_q, a), NTT-form optional; cf. rlwe.cpp:277-407.

    When ``save_seed``, c1 is regenerable from a public seed recorded in
    ``seed_info`` (the wire-compatible 2x compression path).
    """
    cd = context.get_context_data(parms_id)
    parms = cd.parms
    moduli = cd.coeff_modulus_values
    n = parms.poly_modulus_degree
    t = cd.limb_tables()
    scheme = parms.scheme

    if bootstrap_prng is None:
        bootstrap_prng = parms.random_generator.create()

    dev = _encrypt_zero_symmetric_device(
        secret_key, context, parms_id, is_ntt_form, save_seed, bootstrap_prng
    )
    if dev is not None:
        return dev

    # Public seed for c1; expanded by a fresh default-type PRNG.
    import struct

    seed_bytes = bootstrap_prng.generate(PRNG_SEED_BYTE_COUNT)
    public_seed = tuple(struct.unpack("<8Q", seed_bytes))
    ciphertext_prng = UniformRandomGeneratorFactory.default_factory().create(public_seed)

    c1_np = sample_poly_uniform(ciphertext_prng, n, moduli)
    noise_np = _noise_sampler_for(parms)(bootstrap_prng, n, moduli)
    k = len(moduli)

    def body(c1_in, noise, sk_full):
        c1 = c1_in
        if not is_ntt_form and save_seed:
            # sampled value is the non-NTT form; transform for computing c0
            c1 = NTT.ntt_forward(c1, t)
        # sk is stored NTT-form at key level; restrict to this level's limbs
        sk = (sk_full[0][:k], sk_full[1][:k])
        c0 = U.mul_mod(sk, c1, t.q, t.ratio_lo, t.ratio_hi)
        e = noise
        if is_ntt_form:
            e = NTT.ntt_forward(e, t)
        else:
            c0 = NTT.ntt_inverse(c0, t)
        if scheme == SchemeType.BGV:
            # noise = t_plain * e
            from .ops.rns import _cshoup

            tv = parms.plain_modulus.value
            op, qt = _cshoup([tv % q for q in moduli], moduli)
            e = U.mul_mod_shoup(e, op, qt, t.q)
        c0 = U.add_mod(e, c0, t.q)
        c0 = U.neg_mod(c0, t.q)
        c1_out = c1_in
        if not is_ntt_form:
            # Non-NTT storage: the sampled polynomial IS the coefficient form
            # (what the saved seed regenerates).
            c1_out = c1_in if save_seed else NTT.ntt_inverse(c1, t)
        elif not save_seed:
            c1_out = c1
        else:
            c1_out = c1  # NTT form sampled directly
        return jnp.stack([c0[0], c1_out[0]]), jnp.stack([c0[1], c1_out[1]])

    fn = _jit(context, ("enc_zero_sym", parms_id, is_ntt_form, save_seed), body)
    data = fn(U.from_np_u64(c1_np), U.from_np_u64(noise_np), secret_key.data)
    ct = Ciphertext(
        data=data,
        parms_id=parms_id,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
    )
    if save_seed:
        ct.seed_info = ciphertext_prng.info()
    return ct


def _encrypt_zero_symmetric_device(
    secret_key: SecretKey,
    context: SealContext,
    parms_id: ParmsId,
    is_ntt_form: bool,
    save_seed: bool,
    bootstrap_prng,
) -> Optional[Ciphertext]:
    """Device-sampled encrypt-zero (ops/blake2_dev.py): the blake2xb
    expansion, uniform rejection sampling and CBD noise all run on device;
    only the 64-byte bootstrap seed travels.  Byte-identical to the host
    path; returns None when unavailable (non-blake2xb PRNG, non-CBD noise,
    disabled, or rejection-tail overflow).
    """
    import os

    from .random.prng import Blake2xbPRNG
    from .random.sampler import sample_poly_cbd

    if os.environ.get("SEAL_TPU_DEVICE_SAMPLING", "1") in ("", "0"):
        return None
    if not isinstance(bootstrap_prng, Blake2xbPRNG):
        return None

    from .ops import blake2_dev as B
    from .ops.rns import _cshoup

    cd = context.get_context_data(parms_id)
    parms = cd.parms
    if parms.noise_sampler != "cbd":
        return None
    moduli = cd.coeff_modulus_values
    n = parms.poly_modulus_degree
    t = cd.limb_tables()
    scheme = parms.scheme
    pos = bootstrap_prng._pos  # resume mid-stream exactly
    nwords = (pos + 64 + 6 * n + 7) // 8

    def body(seed_words, sk_full):
        boot = B.expand_stream_words(seed_words, nwords)
        boot_bytes = B.words_to_bytes(boot)
        pub_bytes = boot_bytes[:, pos : pos + 64]
        # pack the 64 seed bytes back into 8 u64 words
        pb = pub_bytes.reshape(1, 8, 8)
        w_lo = sum(pb[:, :, i] << (8 * i) for i in range(4))
        w_hi = sum(pb[:, :, i + 4] << (8 * i) for i in range(4))
        pub_seed = (w_lo, w_hi)
        noise = B.cbd_noise_from_words(boot, n, skip_bytes=pos + 64)[0]  # (n,)
        c1s, ovf = B.uniform_from_seed_words(pub_seed, n, tuple(moduli))
        c1 = (c1s[0][0], c1s[1][0])  # (k, n)
        k = len(moduli)
        sk = (sk_full[0][:k], sk_full[1][:k])
        c1_ntt = c1 if is_ntt_form or not save_seed else NTT.ntt_forward(c1, t)
        # when not ntt_form and not save_seed the sampled value IS the NTT
        # form (uniform is domain-invariant); see the host path
        c0 = U.mul_mod(sk, c1_ntt, t.q, t.ratio_lo, t.ratio_hi)
        e = NTT.ntt_forward(B.lift_signed(noise, moduli), t) if is_ntt_form \
            else B.lift_signed(noise, moduli)
        if not is_ntt_form:
            c0 = NTT.ntt_inverse(c0, t)
        if scheme == SchemeType.BGV:
            tv = parms.plain_modulus.value
            op, qt = _cshoup([tv % q for q in moduli], moduli)
            e = U.mul_mod_shoup(e, op, qt, t.q)
        c0 = U.neg_mod(U.add_mod(e, c0, t.q), t.q)
        if is_ntt_form or save_seed:
            c1_out = c1
        else:
            c1_out = NTT.ntt_inverse(c1_ntt, t)
        data = (jnp.stack([c0[0], c1_out[0]]), jnp.stack([c0[1], c1_out[1]]))
        return data, pub_seed, ovf

    fn = _jit(
        context,
        ("enc_zero_sym_dev", parms_id, is_ntt_form, save_seed, pos),
        body,
    )
    seed_words = U.from_np_u64(np.array([bootstrap_prng.seed], dtype=np.uint64))
    data, pub_seed, ovf = fn(seed_words, secret_key.data)
    if bool(np.any(np.asarray(ovf))):
        return None
    # advance the bootstrap stream as if the bytes were drawn host-side
    bootstrap_prng._pos = pos + 64 + 6 * n
    ct = Ciphertext(
        data=data,
        parms_id=parms_id,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
    )
    if save_seed:
        pub_np = U.to_np_u64(pub_seed)[0]
        from .random import UniformRandomGeneratorInfo
        from .random.prng import PRNGType

        ct.seed_info = UniformRandomGeneratorInfo(
            PRNGType.BLAKE2XB, tuple(int(w) for w in pub_np)
        )
    return ct


def encrypt_zero_asymmetric(
    public_key: PublicKey,
    context: SealContext,
    parms_id: ParmsId,
    is_ntt_form: bool,
) -> Ciphertext:
    """c_j = pk_j * u + e_j (BGV: + t*e_j); cf. rlwe.cpp:190-275."""
    cd = context.get_context_data(parms_id)
    parms = cd.parms
    moduli = cd.coeff_modulus_values
    n = parms.poly_modulus_degree
    t = cd.limb_tables()
    scheme = parms.scheme
    size = public_key.data.size
    k = len(moduli)

    prng = parms.random_generator.create()

    u_np = sample_poly_ternary(prng, n, moduli)
    sampler = _noise_sampler_for(parms)
    noise_np = np.stack([sampler(prng, n, moduli) for _ in range(size)])

    def body(u_in, noises, pk_data):
        u = NTT.ntt_forward(u_in, t)
        polys = []
        for j in range(size):
            pk_j = (pk_data[0][j][:k], pk_data[1][j][:k])
            c_j = U.mul_mod(u, pk_j, t.q, t.ratio_lo, t.ratio_hi)
            if not is_ntt_form:
                c_j = NTT.ntt_inverse(c_j, t)
            polys.append(c_j)
        for j in range(size):
            e = (noises[0][j], noises[1][j])
            if scheme == SchemeType.BGV:
                if is_ntt_form:
                    e = NTT.ntt_forward(e, t, lazy=True)
                from .ops.rns import _cshoup

                tv = parms.plain_modulus.value
                op, qt = _cshoup([tv % q for q in moduli], moduli)
                e = U.mul_mod_shoup(e, op, qt, t.q)
            else:
                if is_ntt_form:
                    e = NTT.ntt_forward(e, t)
            polys[j] = U.add_mod(e, polys[j], t.q)
        return _stack(polys)

    fn = _jit(context, ("enc_zero_asym", parms_id, is_ntt_form, size), body)
    data = fn(U.from_np_u64(u_np), U.from_np_u64(noise_np), public_key.data.data)
    return Ciphertext(
        data=data,
        parms_id=parms_id,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
    )
