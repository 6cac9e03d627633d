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
from ..data import Ciphertext, RelinKeys
from ..evaluator import Evaluator, _stack_polys
from ..ops import rns as R
from ..params import ParmsId, SchemeType
from .mesh import HEMesh, shard_batch


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

    def multiply(self, b1: CiphertextBatch, b2: CiphertextBatch) -> CiphertextBatch:
        if b1.parms_id != b2.parms_id:
            raise ValueError("parameter mismatch")
        cd = self.context.get_context_data(b1.parms_id)
        scheme = cd.parms.scheme
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
        elif scheme == SchemeType.BGV:
            cf = b1.correction_factor * b2.correction_factor % cd.parms.plain_modulus.value
        return CiphertextBatch(fn(b1.data, b2.data), b1.parms_id, b1.is_ntt_form, out_scale, cf)

    def relinearize(self, batch: CiphertextBatch, relin_keys: RelinKeys) -> CiphertextBatch:
        cd = self.context.get_context_data(batch.parms_id)
        size = batch.size
        if size != 3:
            raise ValueError("batched relinearize currently supports size-3 inputs")
        key = relin_keys.key(2)

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
        cd = self.context.get_context_data(b1.parms_id)

        def single(d1, d2):
            from ..ops import u64 as U

            t = cd.limb_tables()
            return U.add_mod(d1, d2, (t.q_lo[None], t.q_hi[None]))

        fn = self._jit(("batch_add", b1.parms_id, b1.size), lambda d1, d2: jax.vmap(single)(d1, d2))
        return CiphertextBatch(fn(b1.data, b2.data), b1.parms_id, b1.is_ntt_form, b1.scale, b1.correction_factor)
