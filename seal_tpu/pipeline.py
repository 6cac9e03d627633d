"""Flagship jittable pipelines used by benchmarks and the multi-chip entry.

The "flagship model" is the north-star workload (BASELINE.md): CKKS
ciphertext x ciphertext multiply -> relinearize -> rescale, expressed as one
pure traced function over raw ciphertext arrays, batchable with vmap and
shardable over a device mesh (batch + RNS-limb axes).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .context import SealContext
from .evaluator import Evaluator, _stack_polys
from .ops import ntt as NTT
from .ops import rns as R
from .ops import u64 as U


def build_ckks_mult_relin_rescale(context: SealContext):
    """Returns a pure fn(d1, d2, kc0, kc1) -> rescaled product data.

    d1, d2: u64 pairs (2, k, n) — NTT-form size-2 ciphertexts at the first
    level.  kc0/kc1: stacked relinearization key components (D, k_key, n).
    """
    ev = Evaluator(context)
    cd = context.first_context_data()

    def fn(d1, d2, kc0, kc1):
        t = cd.limb_tables()
        polys1 = [(d1[0][j], d1[1][j]) for j in range(2)]
        polys2 = [(d2[0][j], d2[1][j]) for j in range(2)]
        prod = ev._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi)
        data3 = _stack_polys(prod)
        trimmed = (data3[0][:2], data3[1][:2])
        target = (data3[0][2], data3[1][2])
        data2 = ev._switch_key_body(cd, 2, trimmed, target, kc0, kc1)
        tool = cd.rns_tool
        out = _stack_polys(
            [R.divide_and_round_q_last_ntt((data2[0][j], data2[1][j]), tool, t) for j in range(2)]
        )
        return out

    return fn


def build_bfv_mult_relin(context: SealContext):
    """Pure fn(d1, d2, kc0, kc1) for BFV: BEHZ multiply then relinearize."""
    ev = Evaluator(context)
    cd = context.first_context_data()

    def fn(d1, d2, kc0, kc1):
        mul = ev._jit  # noqa: F841  (we inline the bodies instead)
        # reuse the BEHZ body through a temporary Ciphertext-shaped closure
        from .data import Ciphertext

        c1 = Ciphertext(data=d1, parms_id=cd.parms_id, is_ntt_form=False)
        c2 = Ciphertext(data=d2, parms_id=cd.parms_id, is_ntt_form=False)
        # direct body call (not the jitted wrapper) so everything traces here
        out3 = ev._bfv_multiply(c1, c2)
        trimmed = (out3.data[0][:2], out3.data[1][:2])
        target = (out3.data[0][2], out3.data[1][2])
        return ev._switch_key_body(cd, 2, trimmed, target, kc0, kc1)

    return fn
