"""Encryptor: public/secret-key encryption for BFV/CKKS/BGV.

Counterpart of ``encryptor.{h,cpp}``.  BFV adds round(Delta*m) into c0 via
the scaling variant (``scalingvariant.cpp:69-161``); CKKS adds the NTT-form
plaintext; BGV lifts the plaintext mod q (fast plain lift or RNS decompose),
NTT-transforms it, and adds (``encryptor.cpp:176-312``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .context import ContextData, SealContext
from .data import Ciphertext, Plaintext, PublicKey, SecretKey
from .params import ParmsId, SchemeType
from .ops import ntt as NTT
from .ops import u64 as U
from .rlwe import encrypt_zero_asymmetric, encrypt_zero_symmetric


def _scaling_variant_fix(plain: Plaintext, cd: ContextData) -> np.ndarray:
    """Per-coefficient fix = floor(((q mod t)*m + (t+1)/2) / t) (host exact)."""
    t = cd.parms.plain_modulus.value
    q_mod_t = cd.coeff_modulus_mod_plain_modulus
    thr = cd.plain_upper_half_threshold
    m = plain.coeff_data
    return np.array([(int(mi) * q_mod_t + thr) // t for mi in m], dtype=np.uint64)


def multiply_add_plain_with_scaling_variant(plain: Plaintext, cd: ContextData, c0: U.U64, negate: bool = False) -> U.U64:
    """c0 +/- (Delta*m + fix), only over the first plain_coeff_count coeffs."""
    from .context import jit_cached

    n = cd.parms.poly_modulus_degree
    m_np = np.zeros(n, dtype=np.uint64)
    count = len(plain.coeff_data)
    m_np[:count] = plain.coeff_data
    fix_np = np.zeros(n, dtype=np.uint64)
    fix_np[:count] = _scaling_variant_fix(plain, cd)

    def body(c0_in, m, fix):
        from .ops.rns import _cshoup

        qv = cd.coeff_modulus_values
        t = cd.limb_tables()
        delta_op, delta_qt = _cshoup(cd.coeff_div_plain_modulus, qv)
        scaled = U.mul_mod_shoup(m, delta_op, delta_qt, t.q)  # (k, n)
        fix_red = U.barrett_reduce_64(fix, t.q, t.ratio_hi)
        term = U.add_mod(scaled, fix_red, t.q)
        return U.sub_mod(c0_in, term, t.q) if negate else U.add_mod(c0_in, term, t.q)

    fn = jit_cached(cd, ("scaling_variant", cd.parms_id, negate), body)
    return fn(c0, U.from_np_u64(m_np[None, :]), U.from_np_u64(fix_np[None, :]))


def bgv_lift_plain(plain: Plaintext, cd: ContextData) -> U.U64:
    """Lift mod-t plaintext into RNS mod q and NTT-transform (BGV encrypt
    and the plain-operand paths of multiply_plain / transform_to_ntt)."""
    from .context import jit_cached

    n = cd.parms.poly_modulus_degree
    qv = cd.coeff_modulus_values
    thr = cd.plain_upper_half_threshold
    m = np.zeros(n, dtype=np.uint64)
    m[: len(plain.coeff_data)] = plain.coeff_data
    k = len(qv)
    out = np.zeros((k, n), dtype=np.uint64)
    if cd.qualifiers.using_fast_plain_lift:
        # vectorized: coeff >= (t+1)/2 lifts by q_i - t per limb
        big = m >= np.uint64(thr)
        for i, (q, inc) in enumerate(zip(qv, cd.plain_upper_half_increment)):
            out[i] = np.where(big, m + np.uint64(inc), m)
    else:
        total_inc = cd.total_coeff_modulus - cd.parms.plain_modulus.value
        lifted = [int(v) + total_inc if int(v) >= thr else int(v) for v in m]
        out = cd.base_q.decompose_array(np.array(lifted, dtype=object))
    fwd = jit_cached(cd, ("plain_lift_ntt", cd.parms_id),
                     lambda d: NTT.ntt_forward(d, cd.limb_tables()))
    return fwd(U.from_np_u64(out))


class Encryptor:
    def __init__(
        self,
        context: SealContext,
        public_key: Optional[PublicKey] = None,
        secret_key: Optional[SecretKey] = None,
    ):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        self.context = context
        self._public_key = public_key
        self._secret_key = secret_key
        if public_key is None and secret_key is None:
            raise ValueError("at least one of public/secret key must be given")

    def set_public_key(self, pk: PublicKey):
        self._public_key = pk

    def set_secret_key(self, sk: SecretKey):
        self._secret_key = sk

    # -- zero encryptions --------------------------------------------------
    def encrypt_zero(self, parms_id: Optional[ParmsId] = None) -> Ciphertext:
        return self._encrypt_zero_internal(parms_id, is_asymmetric=True, save_seed=False)

    def encrypt_zero_symmetric(self, parms_id: Optional[ParmsId] = None, save_seed: bool = False) -> Ciphertext:
        return self._encrypt_zero_internal(parms_id, is_asymmetric=False, save_seed=save_seed)

    def _encrypt_zero_internal(self, parms_id, is_asymmetric, save_seed) -> Ciphertext:
        if parms_id is None:
            parms_id = self.context.first_parms_id
        scheme = self.context.key_context_data().parms.scheme
        is_ntt_form = scheme in (SchemeType.CKKS, SchemeType.BGV)
        if is_asymmetric:
            if self._public_key is None:
                raise ValueError("public key is not set")
            cd = self.context.get_context_data(parms_id)
            first_cd = self.context.first_context_data()
            if cd.chain_index < first_cd.chain_index:
                # Requested level below first level: encrypt at first level
                # and mod-switch down (cf. encryptor.cpp encrypt_zero_internal).
                ct = self._encrypt_zero_internal(self.context.first_parms_id, True, save_seed)
                from .evaluator import Evaluator

                ev = Evaluator(self.context)
                while ct.parms_id != parms_id:
                    ct = ev.mod_switch_to_next(ct)
                return ct
            return encrypt_zero_asymmetric(self._public_key, self.context, parms_id, is_ntt_form)
        else:
            if self._secret_key is None:
                raise ValueError("secret key is not set")
            return encrypt_zero_symmetric(self._secret_key, self.context, parms_id, is_ntt_form, save_seed)

    # -- plaintext encryptions --------------------------------------------
    def encrypt(self, plain: Plaintext) -> Ciphertext:
        return self._encrypt_internal(plain, is_asymmetric=True, save_seed=False)

    def encrypt_symmetric(self, plain: Plaintext, save_seed: bool = False) -> Ciphertext:
        return self._encrypt_internal(plain, is_asymmetric=False, save_seed=save_seed)

    def _encrypt_internal(self, plain: Plaintext, is_asymmetric: bool, save_seed: bool) -> Ciphertext:
        from .context import jit_cached

        scheme = self.context.key_context_data().parms.scheme
        if scheme == SchemeType.BFV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            ct = self._encrypt_zero_internal(self.context.first_parms_id, is_asymmetric, save_seed)
            cd = self.context.first_context_data()
            c0 = multiply_add_plain_with_scaling_variant(plain, cd, ct.poly(0), negate=False)
            ct.data = self._set_c0(cd, ct.data, c0)
            return ct
        elif scheme == SchemeType.CKKS:
            if not plain.is_ntt_form:
                raise ValueError("plain must be in NTT form")
            cd = self.context.get_context_data(plain.parms_id)
            if cd is None:
                raise ValueError("plain is not valid for encryption parameters")
            ct = self._encrypt_zero_internal(plain.parms_id, is_asymmetric, save_seed)
            fn = jit_cached(
                cd, ("encrypt_add_plain", cd.parms_id),
                lambda d, p: self._set_c0(cd, d, U.add_mod((d[0][0], d[1][0]), p, cd.limb_tables().q)),
            )
            ct.data = fn(ct.data, plain.rns_data)
            ct.scale = plain.scale
            return ct
        elif scheme == SchemeType.BGV:
            if plain.is_ntt_form:
                raise ValueError("plain cannot be in NTT form")
            ct = self._encrypt_zero_internal(self.context.first_parms_id, is_asymmetric, save_seed)
            cd = self.context.first_context_data()
            lifted = bgv_lift_plain(plain, cd)
            fn = jit_cached(
                cd, ("encrypt_add_plain", cd.parms_id),
                lambda d, p: self._set_c0(cd, d, U.add_mod((d[0][0], d[1][0]), p, cd.limb_tables().q)),
            )
            ct.data = fn(ct.data, lifted)
            return ct
        raise ValueError("unsupported scheme")

    @staticmethod
    def _set_c0(cd, data, c0):
        return (data[0].at[0].set(c0[0]), data[1].at[0].set(c0[1]))
