"""Batched (vmapped) evaluator over ciphertext arrays with mesh sharding.

Ciphertext-batch data parallelism (SURVEY.md §2.12): a ``CiphertextBatch``
holds (B, size, k, n) u64 arrays with shared metadata; ops vmap the
evaluator's jitted bodies over the leading axis and run sharded over the
mesh's batch/limb axes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..context import SealContext
from ..data import Ciphertext, GaloisKeys, Plaintext, RelinKeys
from ..evaluator import (
    Evaluator,
    _balance_correction_factors,
    _is_scale_within_bounds,
    _stack_polys,
    are_same_scale,
)
from ..ops import ntt as NTT
from ..ops import poly as P_ops
from ..ops import rns as R
from ..params import ParmsId, SchemeType
from .mesh import HEMesh, shard_batch, shard_kswitch_key


@dataclass
class CiphertextBatch:
    """B ciphertexts with identical metadata, stacked on a leading axis."""

    data: tuple  # u64 pair of shape (B, size, k, n)
    parms_id: ParmsId
    is_ntt_form: bool
    scale: float = 1.0
    correction_factor: int = 1

    @property
    def batch_size(self) -> int:
        return int(self.data[0].shape[0])

    @property
    def size(self) -> int:
        return int(self.data[0].shape[1])

    @staticmethod
    def from_ciphertexts(cts: Sequence[Ciphertext]) -> "CiphertextBatch":
        c0 = cts[0]
        for c in cts[1:]:
            if c.parms_id != c0.parms_id or c.is_ntt_form != c0.is_ntt_form or c.size != c0.size:
                raise ValueError("all ciphertexts in a batch must share metadata")
        lo = jnp.stack([c.data[0] for c in cts])
        hi = jnp.stack([c.data[1] for c in cts])
        return CiphertextBatch((lo, hi), c0.parms_id, c0.is_ntt_form, c0.scale, c0.correction_factor)

    def __getitem__(self, i: int) -> Ciphertext:
        return Ciphertext(
            data=(self.data[0][i], self.data[1][i]),
            parms_id=self.parms_id,
            is_ntt_form=self.is_ntt_form,
            scale=self.scale,
            correction_factor=self.correction_factor,
        )


class BatchEvaluator:
    """Vmapped evaluator ops over ciphertext batches, mesh-shardable."""

    def __init__(self, context: SealContext, hem: Optional[HEMesh] = None):
        self.context = context
        self.ev = Evaluator(context)
        self.hem = hem

    def _jit(self, key, builder):
        cache = self.context._jit_cache
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(builder)
            cache[key] = fn
        return fn

    def shard(self, batch: CiphertextBatch) -> CiphertextBatch:
        if self.hem is None:
            return batch
        return CiphertextBatch(
            shard_batch(self.hem, batch.data),
            batch.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
        )

    def _check_key(self, keys) -> None:
        """Key validity rails mirroring Evaluator._switch_key / relinearize
        (evaluator.cpp:2572-2611): key level, keyswitching support, and the
        decomposition-limb count a truncated unsafe-loaded key might violate
        (jitted gathers clamp OOB indices, so this must be caught host-side)."""
        if keys.parms_id != self.context.key_parms_id:
            raise ValueError("keys are not valid for encryption parameters")
        if not self.context.using_keyswitching:
            raise ValueError("keyswitching is not supported by the context")

    @staticmethod
    def _check_key_limbs(key: dict, cd) -> None:
        D = len(cd.parms.coeff_modulus)
        if key is None or key["c0"][0].shape[0] < D:
            raise ValueError("key-switching keys are invalid for encryption parameters")

    def multiply(self, b1: CiphertextBatch, b2: CiphertextBatch) -> CiphertextBatch:
        if b1.parms_id != b2.parms_id:
            raise ValueError("parameter mismatch")
        cd = self.context.get_context_data(b1.parms_id)
        scheme = cd.parms.scheme
        if scheme == SchemeType.BFV:
            return self._bfv_multiply(b1, b2)
        size1, size2 = b1.size, b2.size

        def single(d1, d2):
            t = cd.limb_tables()
            polys1 = [(d1[0][j], d1[1][j]) for j in range(size1)]
            polys2 = [(d2[0][j], d2[1][j]) for j in range(size2)]
            return _stack_polys(self.ev._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi))

        fn = self._jit(
            ("batch_mul", b1.parms_id, size1, size2),
            lambda d1, d2: jax.vmap(single)(d1, d2),
        )
        out_scale = b1.scale
        cf = b1.correction_factor
        if scheme == SchemeType.CKKS:
            out_scale = b1.scale * b2.scale
            if not _is_scale_within_bounds(out_scale, cd):
                raise ValueError("scale out of bounds")
        elif scheme == SchemeType.BGV:
            cf = b1.correction_factor * b2.correction_factor % cd.parms.plain_modulus.value
        return CiphertextBatch(fn(b1.data, b2.data), b1.parms_id, b1.is_ntt_form, out_scale, cf)

    def _bfv_multiply(self, b1: CiphertextBatch, b2: CiphertextBatch) -> CiphertextBatch:
        """Batched BEHZ multiply: each stage of the evaluator's staged
        pipeline (extend / convolve / floor+SK) vmapped over the batch axis,
        same dispatch boundaries (fusing the stages mis-schedules in XLA)."""
        if b1.is_ntt_form or b2.is_ntt_form:
            raise ValueError("BFV operands cannot be in NTT form")
        cd = self.context.get_context_data(b1.parms_id)
        tool = cd.rns_tool
        pid = b1.parms_id
        size1, size2 = b1.size, b2.size

        ntt_q = self._jit(
            ("batchb_ntt_q", pid),
            lambda d: jax.vmap(lambda x: NTT.ntt_forward(x, cd.limb_tables(), lazy=True))(d),
        )
        ext_bsk = self._jit(
            ("batchb_ext", pid),
            lambda d: jax.vmap(lambda x: R.sm_mrq(R.fastbconv_m_tilde(x, tool), tool))(d),
        )
        ntt_bsk = self._jit(
            ("batchb_ntt_bsk", pid),
            lambda d: jax.vmap(lambda x: NTT.ntt_forward(x, cd.bsk_limb_tables(), lazy=True))(d),
        )

        def conv_builder(base):
            t = cd.limb_tables() if base == "q" else cd.bsk_limb_tables()

            def conv(d1, d2):
                polys1 = [(d1[0][j], d1[1][j]) for j in range(size1)]
                polys2 = [(d2[0][j], d2[1][j]) for j in range(size2)]
                return _stack_polys(self.ev._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi))

            return lambda d1, d2: jax.vmap(conv)(d1, d2)

        conv_q = self._jit(("batchb_conv_q", pid, size1, size2), conv_builder("q"))
        conv_b = self._jit(("batchb_conv_b", pid, size1, size2), conv_builder("b"))

        def intt_scale_builder(base):
            # x t folded into the iNTT 1/n constants (see Evaluator._bfv_multiply)
            t = cd.tscaled_limb_tables("q" if base == "q" else "bsk")

            def f(d):
                return NTT.ntt_inverse(d, t)

            return lambda d: jax.vmap(f)(d)

        intt_q = self._jit(("batchb_intt_q", pid), intt_scale_builder("q"))
        intt_b = self._jit(("batchb_intt_b", pid), intt_scale_builder("b"))
        tail = self._jit(
            ("batchb_tail", pid),
            lambda d: jax.vmap(lambda x: R.fastbconv_sk(R.fast_floor(x, tool), tool))(d),
        )

        e1_q, e1_b = ntt_q(b1.data), ntt_bsk(ext_bsk(b1.data))
        e2_q, e2_b = ntt_q(b2.data), ntt_bsk(ext_bsk(b2.data))
        dq = intt_q(conv_q(e1_q, e2_q))
        db = intt_b(conv_b(e1_b, e2_b))
        joined = (
            jnp.concatenate([dq[0], db[0]], axis=2),
            jnp.concatenate([dq[1], db[1]], axis=2),
        )
        return CiphertextBatch(
            tail(joined), b1.parms_id, False, b1.scale, b1.correction_factor
        )

    def relinearize(self, batch: CiphertextBatch, relin_keys: RelinKeys) -> CiphertextBatch:
        cd = self.context.get_context_data(batch.parms_id)
        self._check_key(relin_keys)
        size = batch.size
        if size != 3:
            raise ValueError("batched relinearize currently supports size-3 inputs")
        key = relin_keys.key(2)
        self._check_key_limbs(key, cd)
        if self.hem is not None:
            key = shard_kswitch_key(self.hem, key)

        def single(d, kc0, kc1):
            trimmed = (d[0][:2], d[1][:2])
            target = (d[0][2], d[1][2])
            return self.ev._switch_key_body(cd, 2, trimmed, target, kc0, kc1)

        fn = self._jit(
            ("batch_relin", batch.parms_id, size),
            lambda d, kc0, kc1: jax.vmap(single, in_axes=(0, None, None))(d, kc0, kc1),
        )
        return CiphertextBatch(
            fn(batch.data, key["c0"], key["c1"]),
            batch.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
        )

    def rescale_to_next(self, batch: CiphertextBatch) -> CiphertextBatch:
        cd = self.context.get_context_data(batch.parms_id)
        next_cd = cd.next_context_data
        if next_cd is None:
            raise ValueError("end of modulus switching chain reached")
        size = batch.size

        def single(d):
            tool = cd.rns_tool
            tables = cd.limb_tables()
            return _stack_polys(
                [R.divide_and_round_q_last_ntt((d[0][j], d[1][j]), tool, tables) for j in range(size)]
            )

        fn = self._jit(("batch_rescale", batch.parms_id, size), lambda d: jax.vmap(single)(d))
        return CiphertextBatch(
            fn(batch.data), next_cd.parms_id, batch.is_ntt_form,
            batch.scale / cd.coeff_modulus_values[-1], batch.correction_factor,
        )

    def add(self, b1: CiphertextBatch, b2: CiphertextBatch) -> CiphertextBatch:
        return self._add_sub(b1, b2, True)

    def sub(self, b1: CiphertextBatch, b2: CiphertextBatch) -> CiphertextBatch:
        return self._add_sub(b1, b2, False)

    def _add_sub(self, b1: CiphertextBatch, b2: CiphertextBatch, is_add: bool) -> CiphertextBatch:
        if b1.parms_id != b2.parms_id:
            raise ValueError("parameter mismatch")
        if b1.is_ntt_form != b2.is_ntt_form:
            raise ValueError("NTT form mismatch")
        if not are_same_scale(b1.scale, b2.scale):
            raise ValueError("scale mismatch")
        cd = self.context.get_context_data(b1.parms_id)
        from ..ops import u64 as U
        from ..ops.rns import _cshoup

        # BGV correction-factor balancing, as in Evaluator._add_sub
        # (evaluator.cpp:56-118,197-216): scale each operand by e_i before
        # the coefficient-wise combine so both carry the same factor f.
        f = b1.correction_factor
        balance = (
            cd.parms.scheme == SchemeType.BGV
            and b1.correction_factor != b2.correction_factor
        )
        if balance:
            f, e1, e2 = _balance_correction_factors(
                b1.correction_factor, b2.correction_factor, cd.parms.plain_modulus.value
            )
        else:
            e1 = e2 = 1

        def single(d1, d2):
            t = cd.limb_tables()
            q = (t.q_lo[None], t.q_hi[None])
            dd1, dd2 = d1, d2
            if balance:
                qv = cd.coeff_modulus_values
                op1 = _cshoup([e1 % qq for qq in qv], qv)
                op2 = _cshoup([e2 % qq for qq in qv], qv)
                dd1 = U.mul_mod_shoup(d1, op1[0], op1[1], q)
                dd2 = U.mul_mod_shoup(d2, op2[0], op2[1], q)
            n1, n2 = dd1[0].shape[0], dd2[0].shape[0]
            if n1 < n2:
                pad = n2 - n1
                dd1 = (jnp.pad(dd1[0], ((0, pad), (0, 0), (0, 0))), jnp.pad(dd1[1], ((0, pad), (0, 0), (0, 0))))
            elif n2 < n1:
                pad = n1 - n2
                dd2 = (jnp.pad(dd2[0], ((0, pad), (0, 0), (0, 0))), jnp.pad(dd2[1], ((0, pad), (0, 0), (0, 0))))
            return U.add_mod(dd1, dd2, q) if is_add else U.sub_mod(dd1, dd2, q)

        fn = self._jit(
            ("batch_add_sub", b1.parms_id, b1.size, b2.size, is_add, e1, e2),
            lambda d1, d2: jax.vmap(single)(d1, d2),
        )
        return CiphertextBatch(fn(b1.data, b2.data), b1.parms_id, b1.is_ntt_form, b1.scale, f)

    def negate(self, batch: CiphertextBatch) -> CiphertextBatch:
        cd = self.context.get_context_data(batch.parms_id)

        def single(d):
            from ..ops import u64 as U

            t = cd.limb_tables()
            return U.neg_mod(d, (t.q_lo[None], t.q_hi[None]))

        fn = self._jit(("batch_negate", batch.parms_id, batch.size), lambda d: jax.vmap(single)(d))
        return CiphertextBatch(fn(batch.data), batch.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor)

    def square(self, batch: CiphertextBatch) -> CiphertextBatch:
        return self.multiply(batch, batch)

    def mod_switch_to_next(self, batch: CiphertextBatch) -> CiphertextBatch:
        """Scale variant for BFV/BGV, drop variant for CKKS (evaluator
        mod_switch_to_next semantics), vmapped over the batch axis."""
        cd = self.context.get_context_data(batch.parms_id)
        next_cd = cd.next_context_data
        if next_cd is None:
            raise ValueError("end of modulus switching chain reached")
        scheme = cd.parms.scheme
        size = batch.size
        if scheme == SchemeType.CKKS:
            # drop variant: scale must still fit the destination level
            # (mod_switch_drop_to_next, evaluator.cpp:1307)
            if not _is_scale_within_bounds(batch.scale, next_cd):
                raise ValueError("scale out of bounds")
            k_next = len(next_cd.parms.coeff_modulus)
            return CiphertextBatch(
                (batch.data[0][:, :, :k_next, :], batch.data[1][:, :, :k_next, :]),
                next_cd.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
            )
        # scale variant form rails (mod_switch_scale_to_next, evaluator.cpp:1211-1218)
        if scheme == SchemeType.BFV and batch.is_ntt_form:
            raise ValueError("BFV encrypted cannot be in NTT form")
        if scheme == SchemeType.BGV and not batch.is_ntt_form:
            raise ValueError("BGV encrypted must be in NTT form")

        def single(d):
            tool = cd.rns_tool
            tables = cd.limb_tables()
            if scheme == SchemeType.BFV:
                op = lambda p: R.divide_and_round_q_last(p, tool)
            else:
                op = lambda p: R.mod_t_and_divide_q_last_ntt(p, tool, tables)
            return _stack_polys([op((d[0][j], d[1][j])) for j in range(size)])

        fn = self._jit(("batch_modswitch", batch.parms_id, size), lambda d: jax.vmap(single)(d))
        cf = batch.correction_factor
        if scheme == SchemeType.BGV:
            cf = cf * cd.rns_tool.inv_q_last_mod_t % cd.parms.plain_modulus.value
        return CiphertextBatch(
            fn(batch.data), next_cd.parms_id, batch.is_ntt_form, batch.scale, cf
        )

    # -- rotations ---------------------------------------------------------
    def apply_galois(self, batch: CiphertextBatch, galois_elt: int, galois_keys: GaloisKeys) -> CiphertextBatch:
        """Galois permutation + key switch, vmapped; the key tensors are
        broadcast (replicated or limb-sharded via the mesh)."""
        cd = self.context.get_context_data(batch.parms_id)
        if batch.size != 2:
            raise ValueError("batched apply_galois requires size-2 ciphertexts")
        if not galois_keys.has_key(galois_elt):
            raise ValueError("Galois key not present")
        self._check_key(galois_keys)
        tool = cd.galois_tool
        key = galois_keys.key(galois_elt)
        self._check_key_limbs(key, cd)
        if self.hem is not None:
            key = shard_kswitch_key(self.hem, key)

        if not batch.is_ntt_form:
            src, neg = tool.coeff_table(galois_elt)
            perm_args = (jnp.asarray(src), jnp.asarray(neg))

            def single(d, s, ng, kc0, kc1):
                t = cd.limb_tables()
                c0 = P_ops.apply_galois_coeff((d[0][0], d[1][0]), s, ng, t.q)
                c1 = P_ops.apply_galois_coeff((d[0][1], d[1][1]), s, ng, t.q)
                zeros = (jnp.zeros_like(c1[0]), jnp.zeros_like(c1[1]))
                return self.ev._switch_key_body(cd, 2, _stack_polys([c0, zeros]), c1, kc0, kc1)

            fn = self._jit(
                ("batch_galois_coeff", batch.parms_id),
                lambda d, s, ng, kc0, kc1: jax.vmap(single, in_axes=(0, None, None, None, None))(d, s, ng, kc0, kc1),
            )
        else:
            perm_args = (jnp.asarray(tool.ntt_table(galois_elt)),)

            def single(d, tab, kc0, kc1):
                c0 = P_ops.apply_galois_ntt((d[0][0], d[1][0]), tab)
                c1 = P_ops.apply_galois_ntt((d[0][1], d[1][1]), tab)
                zeros = (jnp.zeros_like(c1[0]), jnp.zeros_like(c1[1]))
                return self.ev._switch_key_body(cd, 2, _stack_polys([c0, zeros]), c1, kc0, kc1)

            fn = self._jit(
                ("batch_galois_ntt", batch.parms_id),
                lambda d, tab, kc0, kc1: jax.vmap(single, in_axes=(0, None, None, None))(d, tab, kc0, kc1),
            )
        return CiphertextBatch(
            fn(batch.data, *perm_args, key["c0"], key["c1"]),
            batch.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
        )

    def _rotate_internal(self, batch: CiphertextBatch, steps: int, galois_keys: GaloisKeys) -> CiphertextBatch:
        cd = self.context.get_context_data(batch.parms_id)
        if steps == 0:
            return batch
        from .. import numth

        elt = cd.galois_tool.get_elt_from_step(steps)
        if galois_keys.has_key(elt):
            return self.apply_galois(batch, elt, galois_keys)
        naf_steps = numth.naf(steps)
        if len(naf_steps) == 1:
            raise ValueError("Galois key not present")
        out = batch
        for s in naf_steps:
            out = self._rotate_internal(out, s, galois_keys)
        return out

    def rotate_rows(self, batch: CiphertextBatch, steps: int, galois_keys: GaloisKeys) -> CiphertextBatch:
        if self.context.first_context_data().parms.scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        return self._rotate_internal(batch, steps, galois_keys)

    def rotate_columns(self, batch: CiphertextBatch, galois_keys: GaloisKeys) -> CiphertextBatch:
        if self.context.first_context_data().parms.scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        cd = self.context.get_context_data(batch.parms_id)
        return self.apply_galois(batch, 2 * cd.parms.poly_modulus_degree - 1, galois_keys)

    def rotate_vector(self, batch: CiphertextBatch, steps: int, galois_keys: GaloisKeys) -> CiphertextBatch:
        if self.context.first_context_data().parms.scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        return self._rotate_internal(batch, steps, galois_keys)

    def multiply_plain(self, batch: CiphertextBatch, plain: Plaintext) -> CiphertextBatch:
        """Full multiply_plain dispatch over the batch, mirroring
        Evaluator.multiply_plain (evaluator.cpp:1975-2194): dyadic NTT fast
        path, coefficient-domain path (incl. monomial fast path), and the
        two mixed-form transform branches."""
        if batch.is_ntt_form and plain.is_ntt_form:
            return self._multiply_plain_ntt(batch, plain)
        if not batch.is_ntt_form and not plain.is_ntt_form:
            return self._multiply_plain_normal(batch, plain)
        if batch.is_ntt_form:
            # NTT ciphertext x coeff plain: lift the plain once for the batch
            return self._multiply_plain_ntt(
                batch, self.ev.transform_plain_to_ntt(plain, batch.parms_id)
            )
        # coeff ciphertext x NTT plain (evaluator.cpp:2006-2010)
        return self.transform_from_ntt(
            self._multiply_plain_ntt(self.transform_to_ntt(batch), plain)
        )

    def _multiply_plain_ntt(self, batch: CiphertextBatch, plain: Plaintext) -> CiphertextBatch:
        if batch.parms_id != plain.parms_id:
            raise ValueError("parameter mismatch")
        cd = self.context.get_context_data(batch.parms_id)

        def single(d, p_lo, p_hi):
            from ..ops import u64 as U

            t = cd.limb_tables()
            pr = (p_lo[None], p_hi[None])
            return U.mul_mod(d, pr, (t.q_lo[None], t.q_hi[None]),
                             (t.ratio_lo_lo[None], t.ratio_lo_hi[None]),
                             (t.ratio_hi_lo[None], t.ratio_hi_hi[None]))

        fn = self._jit(
            ("batch_mul_plain", batch.parms_id, batch.size),
            lambda d, pl, ph: jax.vmap(single, in_axes=(0, None, None))(d, pl, ph),
        )
        out_scale = batch.scale * plain.scale
        if cd.parms.scheme == SchemeType.CKKS and not _is_scale_within_bounds(out_scale, cd):
            raise ValueError("scale out of bounds")
        return CiphertextBatch(
            fn(batch.data, plain.rns_data[0], plain.rns_data[1]),
            batch.parms_id, batch.is_ntt_form, out_scale, batch.correction_factor,
        )

    def _multiply_plain_normal(self, batch: CiphertextBatch, plain: Plaintext) -> CiphertextBatch:
        """Coefficient-domain multiply_plain over the batch
        (multiply_plain_normal, evaluator.cpp:2021-2155): the plaintext
        lift/monomial precompute happens ONCE host-side for the whole batch;
        only the per-ciphertext kernels are vmapped."""
        from ..encryptor import bgv_lift_plain
        from ..ops import u64 as U

        cd = self.context.get_context_data(batch.parms_id)
        thr = cd.plain_upper_half_threshold
        sig = plain.significant_coeff_count()
        nonzero = int(np.count_nonzero(plain.coeff_data))

        if nonzero == 1:
            # Monomial fast path (evaluator.cpp:2048-2096; same documented
            # timing dependence on the plaintext structure as the reference).
            exp = sig - 1
            coeff = int(plain.coeff_data[exp])
            qv = cd.coeff_modulus_values
            if coeff >= thr:
                if not cd.qualifiers.using_fast_plain_lift:
                    lifted_c = coeff + (cd.total_coeff_modulus - cd.parms.plain_modulus.value)
                    mono = [lifted_c % q for q in qv]
                else:
                    mono = [(coeff + inc) % q for q, inc in zip(qv, cd.plain_upper_half_increment)]
            else:
                mono = [coeff % q for q in qv]

            def mono_single(d, mono_lo, mono_hi):
                tt = cd.limb_tables()
                scaled = U.mul_mod(
                    d, (mono_lo[None], mono_hi[None]), (tt.q_lo[None], tt.q_hi[None]),
                    (tt.ratio_lo_lo[None], tt.ratio_lo_hi[None]),
                    (tt.ratio_hi_lo[None], tt.ratio_hi_hi[None]),
                )
                return P_ops.negacyclic_shift(scaled, exp, (tt.q_lo[None], tt.q_hi[None]))

            fn = self._jit(
                ("batch_mul_plain_mono", batch.parms_id, batch.size, exp),
                lambda d, ml, mh: jax.vmap(mono_single, in_axes=(0, None, None))(d, ml, mh),
            )
            from ..ops.rns import _c

            mono_c = _c(mono)  # (k, 1) constant pair, as Evaluator does
            out_data = fn(batch.data, mono_c[0], mono_c[1])
        else:
            lifted = bgv_lift_plain(plain, cd)  # (k, n) NTT form, shared

            def gen_single(d, p):
                tt = cd.limb_tables()
                polys = []
                for j in range(d[0].shape[0]):
                    pj = NTT.ntt_forward((d[0][j], d[1][j]), tt, lazy=True)
                    pj = U.mul_mod(pj, p, tt.q, tt.ratio_lo, tt.ratio_hi)
                    polys.append(NTT.ntt_inverse(pj, tt))
                return _stack_polys(polys)

            fn = self._jit(
                ("batch_mul_plain_normal", batch.parms_id, batch.size),
                lambda d, p: jax.vmap(gen_single, in_axes=(0, None))(d, p),
            )
            out_data = fn(batch.data, lifted)
        out_scale = batch.scale * plain.scale
        if not _is_scale_within_bounds(out_scale, cd):
            raise ValueError("scale out of bounds")
        return CiphertextBatch(
            out_data, batch.parms_id, batch.is_ntt_form, out_scale, batch.correction_factor
        )

    # -- plaintext add/sub -------------------------------------------------
    def add_plain(self, batch: CiphertextBatch, plain: Plaintext) -> CiphertextBatch:
        return self._add_sub_plain(batch, plain, True)

    def sub_plain(self, batch: CiphertextBatch, plain: Plaintext) -> CiphertextBatch:
        return self._add_sub_plain(batch, plain, False)

    def _add_sub_plain(self, batch: CiphertextBatch, plain: Plaintext, is_add: bool) -> CiphertextBatch:
        """Batched add_plain/sub_plain (evaluator.cpp:1759-1974): the
        plaintext-derived (k, n) term — Delta*m + fix for BFV, the NTT form
        for CKKS, the correction-scaled lift for BGV — is computed once and
        vmapped into every c0."""
        from ..encryptor import bgv_lift_plain, multiply_add_plain_with_scaling_variant
        from ..ops import u64 as U

        cd = self.context.get_context_data(batch.parms_id)
        scheme = cd.parms.scheme
        k = len(cd.parms.coeff_modulus)
        n = cd.parms.poly_modulus_degree

        if scheme == SchemeType.BFV:
            if batch.is_ntt_form or plain.is_ntt_form:
                raise ValueError("BFV operands cannot be in NTT form")
            zeros = U.from_np_u64(np.zeros((k, n), dtype=np.uint64))
            term = multiply_add_plain_with_scaling_variant(plain, cd, zeros)
        elif scheme == SchemeType.CKKS:
            if not batch.is_ntt_form or not plain.is_ntt_form:
                raise ValueError("CKKS operands must be in NTT form")
            if batch.parms_id != plain.parms_id:
                raise ValueError("encrypted and plain parameter mismatch")
            if not are_same_scale(batch.scale, plain.scale):
                raise ValueError("scale mismatch")
            term = plain.rns_data
        elif scheme == SchemeType.BGV:
            if not batch.is_ntt_form:
                raise ValueError("BGV encrypted must be in NTT form")
            if plain.is_ntt_form:
                raise ValueError("BGV plain cannot be in NTT form")
            tv = cd.parms.plain_modulus.value
            scaled = plain.copy()
            scaled.coeff_data = np.array(
                [int(c) * batch.correction_factor % tv for c in plain.coeff_data],
                dtype=np.uint64,
            )
            term = bgv_lift_plain(scaled, cd)
        else:
            raise ValueError("unsupported scheme")

        def single(d, t0, t1):
            t = cd.limb_tables()
            op = U.add_mod if is_add else U.sub_mod
            c0 = op((d[0][0], d[1][0]), (t0, t1), t.q)
            return (d[0].at[0].set(c0[0]), d[1].at[0].set(c0[1]))

        fn = self._jit(
            ("batch_add_sub_plain", batch.parms_id, batch.size, is_add),
            lambda d, t0, t1: jax.vmap(single, in_axes=(0, None, None))(d, t0, t1),
        )
        return CiphertextBatch(
            fn(batch.data, term[0], term[1]),
            batch.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
        )

    # -- NTT transforms ----------------------------------------------------
    def transform_to_ntt(self, batch: CiphertextBatch) -> CiphertextBatch:
        if batch.is_ntt_form:
            raise ValueError("encrypted is already in NTT form")
        cd = self.context.get_context_data(batch.parms_id)
        fn = self._jit(
            ("batch_to_ntt", batch.parms_id, batch.size),
            lambda d: jax.vmap(lambda x: NTT.ntt_forward(x, cd.limb_tables()))(d),
        )
        return CiphertextBatch(
            fn(batch.data), batch.parms_id, True, batch.scale, batch.correction_factor
        )

    def transform_from_ntt(self, batch: CiphertextBatch) -> CiphertextBatch:
        if not batch.is_ntt_form:
            raise ValueError("encrypted is not in NTT form")
        cd = self.context.get_context_data(batch.parms_id)
        fn = self._jit(
            ("batch_from_ntt", batch.parms_id, batch.size),
            lambda d: jax.vmap(lambda x: NTT.ntt_inverse(x, cd.limb_tables()))(d),
        )
        return CiphertextBatch(
            fn(batch.data), batch.parms_id, False, batch.scale, batch.correction_factor
        )

    # -- level management --------------------------------------------------
    def mod_reduce_to_next(self, batch: CiphertextBatch) -> CiphertextBatch:
        """Drop-variant modulus reduction for any scheme
        (mod_reduce_to_next, evaluator.cpp:1597-1648): pure limb truncation."""
        cd = self.context.get_context_data(batch.parms_id)
        next_cd = cd.next_context_data
        if next_cd is None:
            raise ValueError("end of modulus switching chain reached")
        if cd.parms.scheme == SchemeType.CKKS and not _is_scale_within_bounds(batch.scale, next_cd):
            raise ValueError("scale out of bounds")
        k_next = len(next_cd.parms.coeff_modulus)
        return CiphertextBatch(
            (batch.data[0][:, :, :k_next, :], batch.data[1][:, :, :k_next, :]),
            next_cd.parms_id, batch.is_ntt_form, batch.scale, batch.correction_factor,
        )

    def multiply_many(self, batches: Sequence[CiphertextBatch], relin_keys: RelinKeys) -> CiphertextBatch:
        """Binary-tree product over batches (BFV/BGV only;
        evaluator.cpp:1649-1724), relinearizing after each level."""
        if not batches:
            raise ValueError("encrypteds cannot be empty")
        scheme = self.context.first_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if len(batches) == 1:
            return batches[0]
        queue = list(batches)
        while len(queue) > 1:
            nxt = []
            for i in range(0, len(queue) - 1, 2):
                nxt.append(self.relinearize(self.multiply(queue[i], queue[i + 1]), relin_keys))
            if len(queue) % 2:
                nxt.append(queue[-1])
            queue = nxt
        return queue[0]
