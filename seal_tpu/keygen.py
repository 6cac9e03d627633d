"""Key generation: secret/public keys, relinearization and Galois keys.

Counterpart of ``keygenerator.{h,cpp}``.  Key-switching keys follow the
reference construction (``keygenerator.cpp:327-360``): for decomposition
limb i, an NTT-form encryption of zero at the key level with
``(q_last mod q_i) * target[i]`` added into c0's i-th limb — stacked here
over the decomposition axis for the TPU key-switch contraction.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .context import SealContext, jit_cached
from .data import GaloisKeys, KSwitchKeys, PublicKey, RelinKeys, SecretKey
from .ops import ntt as NTT
from .ops import poly as P
from .ops import u64 as U
from .params import SchemeType
from .random.sampler import sample_poly_ternary
from .rlwe import encrypt_zero_symmetric


class KeyGenerator:
    def __init__(self, context: SealContext, secret_key: Optional[SecretKey] = None):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        self.context = context
        cd = context.key_context_data()
        if secret_key is not None:
            self._secret_key = secret_key
            self._sk_array = [secret_key.data]  # powers of s (NTT form)
        else:
            parms = cd.parms
            moduli = cd.coeff_modulus_values
            sk_np = sample_poly_ternary(parms.random_generator.create(), parms.poly_modulus_degree, moduli)
            fwd = jit_cached(context, ("keygen_sk_ntt", cd.parms_id),
                             lambda d: NTT.ntt_forward(d, cd.limb_tables()))
            sk_ntt = fwd(U.from_np_u64(sk_np))
            self._secret_key = SecretKey(sk_ntt, cd.parms_id)
            self._sk_array = [sk_ntt]

    @property
    def secret_key(self) -> SecretKey:
        return self._secret_key

    def _secret_key_power(self, power: int) -> U.U64:
        """s^power in NTT form at the key level (lazily extended cache;
        cf. compute_secret_key_array, keygenerator.cpp:237-325)."""
        cd = self.context.key_context_data()
        mul = jit_cached(
            self.context, ("sk_power_mul", cd.parms_id),
            lambda a, b: U.mul_mod(a, b, cd.limb_tables().q, cd.limb_tables().ratio_lo, cd.limb_tables().ratio_hi),
        )
        while len(self._sk_array) < power:
            self._sk_array.append(mul(self._sk_array[-1], self._sk_array[0]))
        return self._sk_array[power - 1]

    def create_public_key(self, save_seed: bool = False) -> PublicKey:
        cd = self.context.key_context_data()
        ct = encrypt_zero_symmetric(self._secret_key, self.context, cd.parms_id, True, save_seed)
        pk = PublicKey(ct)
        return pk

    # -- key switching keys ------------------------------------------------
    def _generate_one_kswitch_key(self, target: U.U64, save_seed: bool = False) -> dict:
        """Encryptions of target*q_last per decomposition limb, stacked.

        Default path: all D encrypt-zeros in ONE device dispatch with the
        blake2xb expansion and samplers running on device
        (ops/blake2_dev.py) — only the D 64-byte bootstrap seeds leave the
        host.  Byte-identical to the sequential host path (the reference's
        D ``encrypt_zero_symmetric`` calls, keygenerator.cpp:327-360).
        """
        import os as _os

        from .random.prng import PRNGType

        key_cd = self.context.key_context_data()
        factory = key_cd.parms.random_generator
        if (
            factory.prng_type == PRNGType.BLAKE2XB
            and key_cd.parms.noise_sampler == "cbd"
            and _os.environ.get("SEAL_TPU_DEVICE_SAMPLING", "1") not in ("", "0")
        ):
            out = self._generate_one_kswitch_key_device(target, save_seed)
            if out is not None:
                return out
        return self._generate_one_kswitch_key_host(target, save_seed)

    def _generate_one_kswitch_key_device(self, target: U.U64, save_seed: bool = False):
        """Batched device path; returns None when the (astronomically rare)
        rejection-tail overflow demands the host fallback."""
        if not self.context.using_keyswitching:
            raise ValueError("keyswitching is not supported by the context")
        from .ops import blake2_dev as B
        from .ops.rns import _c, _cshoup
        from .random import UniformRandomGeneratorInfo
        from .random.prng import PRNGType

        context = self.context
        key_cd = context.key_context_data()
        parms = key_cd.parms
        key_moduli = key_cd.coeff_modulus_values
        q_last = key_moduli[-1]
        D = len(context.first_context_data().parms.coeff_modulus)
        n = parms.poly_modulus_degree
        k_key = len(key_moduli)
        scheme = parms.scheme
        factory = parms.random_generator

        # One fresh bootstrap PRNG per key, as the reference's per-call
        # parms.random_generator()->create() (rlwe.cpp:224); only their
        # seeds travel to the device.
        boot_seeds = np.array(
            [factory.create().seed for _ in range(D)], dtype=np.uint64
        )
        tbl = key_cd.limb_tables()
        noise_words = (64 + 6 * n + 7) // 8

        def body(seed_words, tgt, sk):
            boot = B.expand_stream_words(seed_words, noise_words)
            pub_seed = (boot[0][:, :8], boot[1][:, :8])  # first 64 bytes
            noise = B.cbd_noise_from_words(boot, n, skip_bytes=64)  # (D, n)
            c1, ovf = B.uniform_from_seed_words(pub_seed, n, tuple(key_moduli))
            e = NTT.ntt_forward(B.lift_signed(noise, key_moduli), tbl)
            c0 = U.mul_mod(sk, c1, tbl.q, tbl.ratio_lo, tbl.ratio_hi)
            if scheme == SchemeType.BGV:
                tv = parms.plain_modulus.value
                op, qt = _cshoup([tv % q for q in key_moduli], key_moduli)
                e = U.mul_mod_shoup(e, op, qt, tbl.q)
            c0 = U.neg_mod(U.add_mod(e, c0, tbl.q), tbl.q)
            # add (q_last mod q_i) * target into c0's decomposition limb i
            op, qt = _cshoup([q_last % qi for qi in key_moduli], key_moduli)
            add_term = U.mul_mod_shoup(tgt, op, qt, _c(key_moduli))
            summed = U.add_mod(
                c0, (add_term[0][None], add_term[1][None]),
                (tbl.q_lo[None], tbl.q_hi[None]),
            )
            eye = jnp.asarray(np.eye(D, k_key, dtype=bool))[:, :, None]
            c0 = U.select64(eye, summed, c0)
            return c0, c1, pub_seed, ovf

        fn = jit_cached(context, ("ksk_device", key_cd.parms_id, D, scheme), body)
        c0, c1, pub_seed, ovf = fn(
            U.from_np_u64(boot_seeds), target, self._secret_key.data
        )
        if bool(np.any(np.asarray(ovf))):
            return None
        seeds = None
        if save_seed:
            pub_np = U.to_np_u64(pub_seed)
            seeds = [
                UniformRandomGeneratorInfo(
                    PRNGType.BLAKE2XB, tuple(int(w) for w in pub_np[i])
                )
                for i in range(D)
            ]
        return {"c0": c0, "c1": c1, "seeds": seeds}

    def _generate_one_kswitch_key_host(self, target: U.U64, save_seed: bool = False) -> dict:
        if not self.context.using_keyswitching:
            raise ValueError("keyswitching is not supported by the context")
        key_cd = self.context.key_context_data()
        key_moduli = key_cd.coeff_modulus_values
        q_last = key_moduli[-1]
        decomp_count = len(self.context.first_context_data().parms.coeff_modulus)
        t = key_cd.limb_tables()

        cts = []
        seeds = []
        for i in range(decomp_count):
            ct = encrypt_zero_symmetric(self._secret_key, self.context, key_cd.parms_id, True, save_seed)
            cts.append(ct.data)            # (lo, hi) of shape (2, k_key, n)
            seeds.append(ct.seed_info)

        def assemble(datas, tgt):
            """Stack D encrypt-zeros and add (q_last mod q_i)*target into
            c0's limb i, all inside ONE traced computation — eager slicing/
            stacking per limb costs ~40 ms/op on remote-plugin backends."""
            from .ops.rns import _c, _cshoup

            c0_stack = (jnp.stack([d[0][0] for d in datas]),
                        jnp.stack([d[1][0] for d in datas]))
            c1_stack = (jnp.stack([d[0][1] for d in datas]),
                        jnp.stack([d[1][1] for d in datas]))
            k_key = len(key_moduli)
            op, qt = _cshoup([q_last % qi for qi in key_moduli], key_moduli)
            q = _c(key_moduli)
            add_term = U.mul_mod_shoup(tgt, op, qt, q)          # (k_key, n)
            summed = U.add_mod(c0_stack, (add_term[0][None], add_term[1][None]), (q[0][None], q[1][None]))
            eye = jnp.asarray(np.eye(decomp_count, k_key, dtype=bool))[:, :, None]
            return U.select64(eye, summed, c0_stack), c1_stack

        fn = jit_cached(self.context, ("ksk_assemble", key_cd.parms_id, decomp_count), assemble)
        c0_stack, c1_stack = fn(tuple(cts), target)
        return {
            "c0": c0_stack,
            "c1": c1_stack,
            "seeds": seeds if save_seed else None,
        }

    def create_relin_keys(self, count: int = 1, save_seed: bool = False) -> RelinKeys:
        """Keys for s^2 .. s^{count+1} (cf. create_relin_keys_internal)."""
        if self.context.key_context_data().parms.scheme == SchemeType.NONE:
            raise ValueError("invalid scheme")
        if not (1 <= count <= 14):  # CIPHERTEXT_SIZE_MAX - 2
            raise ValueError("invalid count")
        keys = RelinKeys()
        keys.keys = [None] * count
        for power in range(2, count + 2):
            target = self._secret_key_power(power)
            keys.keys[RelinKeys.get_index(power)] = self._generate_one_kswitch_key(target, save_seed)
        keys.parms_id = self.context.key_parms_id
        return keys

    def create_galois_keys(self, galois_elts: Optional[Sequence[int]] = None, save_seed: bool = False) -> GaloisKeys:
        cd = self.context.key_context_data()
        galois_tool = cd.galois_tool
        n = cd.parms.poly_modulus_degree
        if galois_elts is None:
            galois_elts = galois_tool.get_elts_all()
        keys = GaloisKeys()
        # slot count n, not 2n: index = (elt-1)/2 with odd elt < 2n never
        # exceeds n-1, and the reference sizes the outer vector to N
        # (keygenerator.cpp generate_galois_keys) — wire format depends on it
        keys.keys = [None] * n
        sk = self._secret_key.data
        for elt in galois_elts:
            if not (elt & 1) or elt >= 2 * n:
                raise ValueError("Galois element is not valid")
            index = GaloisKeys.get_index(elt)
            if keys.keys[index] is not None:
                continue
            table = jnp.asarray(galois_tool.ntt_table(elt))
            gal = jit_cached(self.context, ("sk_galois", cd.parms_id),
                             lambda s, tab: P.apply_galois_ntt(s, tab))
            rotated_sk = gal(sk, table)
            keys.keys[index] = self._generate_one_kswitch_key(rotated_sk, save_seed)
        keys.parms_id = self.context.key_parms_id
        return keys

    def create_galois_keys_from_steps(self, steps: Sequence[int], save_seed: bool = False) -> GaloisKeys:
        cd = self.context.key_context_data()
        return self.create_galois_keys(cd.galois_tool.get_elts_from_steps(steps), save_seed)
