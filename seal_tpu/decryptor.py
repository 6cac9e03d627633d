"""Decryptor: c(s) dot product + per-scheme decoding tail.

Counterpart of ``decryptor.{h,cpp}``: NTT-domain dot product with cached
secret-key powers (``decryptor.cpp:320-407``), then BFV's {t,gamma}
scale-and-round, CKKS's direct NTT plaintext, or BGV's exact mod-t
conversion with correction-factor division.  Includes
``invariant_noise_budget`` (``decryptor.cpp:409-486``).
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import numth
from .context import SealContext
from .data import Ciphertext, Plaintext, SecretKey
from .params import PARMS_ID_ZERO, SchemeType
from .ops import ntt as NTT
from .ops import rns as R
from .ops import u64 as U


class Decryptor:
    def __init__(self, context: SealContext, secret_key: SecretKey):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        if secret_key.parms_id != context.key_parms_id:
            raise ValueError("secret key is not valid for encryption parameters")
        self.context = context
        self._sk_array: List[U.U64] = [secret_key.data]  # powers of s, NTT, key level

    def _tail_jit(self, key, builder):
        import jax

        cache = self.context._jit_cache
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(builder)
            cache[key] = fn
        return fn

    def _secret_key_power(self, power: int) -> U.U64:
        cd = self.context.key_context_data()
        mul = self._tail_jit(
            ("sk_power_mul", cd.parms_id),
            lambda a, b: U.mul_mod(a, b, cd.limb_tables().q, cd.limb_tables().ratio_lo, cd.limb_tables().ratio_hi),
        )
        while len(self._sk_array) < power:
            self._sk_array.append(mul(self._sk_array[-1], self._sk_array[0]))
        return self._sk_array[power - 1]

    def _sk_stack(self, size: int):
        import jax.numpy as jnp

        self._secret_key_power(size - 1)
        return (
            jnp.stack([p[0] for p in self._sk_array[: size - 1]]),
            jnp.stack([p[1] for p in self._sk_array[: size - 1]]),
        )

    def _dot_body(self, cd, size: int, is_ntt: bool, k: int):
        """(data, sk_stack) -> c0 + c1*s + ... in the ciphertext's domain —
        the traced core shared by single and batched decryption."""

        def body(data, sks):
            t = cd.limb_tables()
            acc = None
            for j in range(1, size):
                cj = (data[0][j], data[1][j])
                if not is_ntt:
                    cj = NTT.ntt_forward(cj, t, lazy=True)
                sk_j = (sks[0][j - 1][:k], sks[1][j - 1][:k])
                prod = U.mul_mod(cj, sk_j, t.q, t.ratio_lo, t.ratio_hi)
                acc = prod if acc is None else U.add_mod(acc, prod, t.q)
            if not is_ntt:
                acc = NTT.ntt_inverse(acc, t)
            return U.add_mod(acc, (data[0][0], data[1][0]), t.q)

        return body

    def _dot_product_ct_sk(self, ct: Ciphertext) -> U.U64:
        """c0 + c1*s + ... in the ciphertext's (NTT or coeff) domain."""
        import jax

        cd = self.context.get_context_data(ct.parms_id)
        size = ct.size
        sk_stack = self._sk_stack(size)
        cache = self.context._jit_cache
        key = ("dot_ct_sk", ct.parms_id, size, ct.is_ntt_form)
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(self._dot_body(cd, size, ct.is_ntt_form, ct.coeff_modulus_size))
            cache[key] = fn
        return fn(ct.data, sk_stack)

    def decrypt(self, ct: Ciphertext) -> Plaintext:
        if ct.size < 2:
            raise ValueError("encrypted is empty")
        scheme = self.context.first_context_data().parms.scheme
        if scheme == SchemeType.BFV:
            return self._bfv_decrypt(ct)
        if scheme == SchemeType.CKKS:
            return self._ckks_decrypt(ct)
        if scheme == SchemeType.BGV:
            return self._bgv_decrypt(ct)
        raise ValueError("unsupported scheme")

    def _bfv_decrypt(self, ct: Ciphertext) -> Plaintext:
        if ct.is_ntt_form:
            raise ValueError("encrypted cannot be in NTT form")
        cd = self.context.get_context_data(ct.parms_id)
        phase = self._dot_product_ct_sk(ct)
        tail = self._tail_jit(
            ("bfv_dec_tail", ct.parms_id), lambda p: R.decrypt_scale_and_round(p, cd.rns_tool)
        )
        out = tail(phase)
        coeffs = U.to_np_u64(out)[0]
        sig = np.nonzero(coeffs)[0]
        count = int(sig[-1]) + 1 if len(sig) else 1
        return Plaintext.from_coeffs(coeffs[:count])

    def _ckks_decrypt(self, ct: Ciphertext) -> Plaintext:
        if not ct.is_ntt_form:
            raise ValueError("encrypted must be in NTT form")
        phase = self._dot_product_ct_sk(ct)
        p = Plaintext()
        p.parms_id = ct.parms_id
        p.scale = ct.scale
        p.rns_data = phase
        return p

    def _bgv_decrypt(self, ct: Ciphertext) -> Plaintext:
        if not ct.is_ntt_form:
            raise ValueError("encrypted must be in NTT form")
        cd = self.context.get_context_data(ct.parms_id)
        phase = self._dot_product_ct_sk(ct)
        tail = self._tail_jit(
            ("bgv_dec_tail", ct.parms_id),
            lambda p: R.decrypt_modt(NTT.ntt_inverse(p, cd.limb_tables()), cd.rns_tool),
        )
        out = tail(phase)
        coeffs = U.to_np_u64(out)[0]
        tv = cd.parms.plain_modulus.value
        if ct.correction_factor != 1:
            # t < 2^60, so multiply in Python-object space only when the
            # product could overflow u64; batching-sized t stays vectorized.
            fix = numth.invert_mod(ct.correction_factor, tv)
            if tv.bit_length() + fix.bit_length() <= 64:
                coeffs = coeffs * np.uint64(fix) % np.uint64(tv)
            else:
                coeffs = np.array([int(c) * fix % tv for c in coeffs], dtype=np.uint64)
        sig = np.nonzero(coeffs)[0]
        count = int(sig[-1]) + 1 if len(sig) else 1
        return Plaintext.from_coeffs(coeffs[:count])

    def decrypt_batch(self, batch) -> List[Plaintext]:
        """Batched decrypt over a ``CiphertextBatch`` (parallel.batch): ONE
        vmapped dispatch for the dot product + scheme tail, ONE device fetch
        for the whole batch.  Results are identical to mapping ``decrypt``
        over ``batch[i]`` (tests/test_batch_surface.py)."""
        import jax

        if batch.size < 2:
            raise ValueError("encrypted is empty")
        scheme = self.context.first_context_data().parms.scheme
        cd = self.context.get_context_data(batch.parms_id)
        k = len(cd.parms.coeff_modulus)
        size = batch.size
        is_ntt = batch.is_ntt_form
        if scheme == SchemeType.BFV and is_ntt:
            raise ValueError("encrypted cannot be in NTT form")
        if scheme in (SchemeType.CKKS, SchemeType.BGV) and not is_ntt:
            raise ValueError("encrypted must be in NTT form")

        dot = self._dot_body(cd, size, is_ntt, k)
        if scheme == SchemeType.BFV:
            tail = lambda p: R.decrypt_scale_and_round(p, cd.rns_tool)
        elif scheme == SchemeType.BGV:
            tail = lambda p: R.decrypt_modt(NTT.ntt_inverse(p, cd.limb_tables()), cd.rns_tool)
        else:
            tail = lambda p: p

        cache = self.context._jit_cache
        key = ("dec_batch", batch.parms_id, size, is_ntt, scheme)
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(
                lambda d, sks: jax.vmap(lambda x: tail(dot(x, sks)))(d)
            )
            cache[key] = fn
        out = fn(batch.data, self._sk_stack(size))

        if scheme == SchemeType.CKKS:
            plains = []
            for i in range(batch.batch_size):
                p = Plaintext()
                p.parms_id = batch.parms_id
                p.scale = batch.scale
                p.rns_data = (out[0][i], out[1][i])
                plains.append(p)
            return plains

        coeffs_all = U.to_np_u64(out)[:, 0, :]  # (B, n)
        tv = cd.parms.plain_modulus.value
        plains = []
        for i in range(batch.batch_size):
            coeffs = coeffs_all[i]
            if scheme == SchemeType.BGV and batch.correction_factor != 1:
                fix = numth.invert_mod(batch.correction_factor, tv)
                if tv.bit_length() + fix.bit_length() <= 64:
                    coeffs = coeffs * np.uint64(fix) % np.uint64(tv)
                else:
                    coeffs = np.array([int(c) * fix % tv for c in coeffs], dtype=np.uint64)
            sig = np.nonzero(coeffs)[0]
            count = int(sig[-1]) + 1 if len(sig) else 1
            plains.append(Plaintext.from_coeffs(coeffs[:count]))
        return plains

    def invariant_noise_budget(self, ct: Ciphertext) -> int:
        """Remaining noise budget in bits (BFV/BGV; decryptor.cpp:409-486)."""
        scheme = self.context.key_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if scheme == SchemeType.BFV and ct.is_ntt_form:
            raise ValueError("BFV encrypted cannot be in NTT form")
        if scheme == SchemeType.BGV and not ct.is_ntt_form:
            raise ValueError("BGV encrypted must be in NTT form")
        cd = self.context.get_context_data(ct.parms_id)
        t = cd.limb_tables()
        noise = self._dot_product_ct_sk(ct)
        if scheme == SchemeType.BGV:
            noise = NTT.ntt_inverse(noise, t)
        if scheme == SchemeType.BFV:
            from .ops.rns import _cshoup

            qv = cd.coeff_modulus_values
            tv = cd.parms.plain_modulus.value
            op, qt = _cshoup([tv % q for q in qv], qv)
            noise = U.mul_mod_shoup(noise, op, qt, t.q)
        # CRT-compose and take centered infinity norm (host, exact)
        residues = U.to_np_u64(noise)
        q_total = cd.total_coeff_modulus
        values = cd.base_q.compose_array(residues)
        half = q_total >> 1
        norm = 0
        for v in values:
            a = q_total - v if v > half else v
            if a > norm:
                norm = a
        diff = cd.total_coeff_modulus_bit_count - norm.bit_length() - 1
        return max(0, diff)
