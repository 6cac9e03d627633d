"""Evaluator: the full homomorphic op surface.

Counterpart of ``evaluator.{h,cpp}`` (op list at evaluator.h:97-1326).  All
ring arithmetic runs on device through the u64-lane kernels; metadata
(levels, scales, BGV correction factors) is tracked host-side.  Ciphertexts
are immutable here — every op returns a new Ciphertext (functional style fits
jit; the reference's ``_inplace`` variants map to rebinding).

Key TPU formulations:
  * BFV multiply: BEHZ 8-step pipeline (evaluator.cpp:395-567) over stacked
    (size, k, n) tensors, both bases transformed with one batched NTT each.
  * switch_key: the decomposition loop (evaluator.cpp:2561-2867) becomes a
    single batched NTT over a (D, R, n) tensor (D decomp limbs x R output
    limbs) followed by a u128-accumulated contraction over D — the
    limb-sharded matmul-like kernel called out in SURVEY.md §3.4.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import debug, numth
from .context import ContextData, SealContext
from .data import Ciphertext, GaloisKeys, KSwitchKeys, Plaintext, RelinKeys
from .modulus import CIPHERTEXT_SIZE_MAX
from .params import PARMS_ID_ZERO, ParmsId, SchemeType
from .ops import ntt as NTT
from .ops import poly as P
from .ops import rns as R
from .ops import u64 as U
from .ops.rns import _c, _cshoup, _ratio, slice_limbs, take_limbs

THROW_ON_TRANSPARENT = True


def _poly(ct_data: U.U64, j: int) -> U.U64:
    return ct_data[0][j], ct_data[1][j]


def _stack_polys(polys: Sequence[U.U64]) -> U.U64:
    return jnp.stack([p[0] for p in polys]), jnp.stack([p[1] for p in polys])


def _balance_correction_factors(factor1: int, factor2: int, t: int):
    """BGV correction-factor balancing via extended Euclid minimizing the
    lifted |e1| + |e2| (evaluator.cpp:56-118).  Returns (f, e1, e2)."""
    half_t = t // 2

    def sum_abs(x, y):
        xb = x - t if x > half_t else x
        yb = y - t if y > half_t else y
        return abs(xb) + abs(yb)

    ratio = numth.invert_mod(factor1, t) * factor2 % t
    e1, e2 = ratio, 1
    best = sum_abs(e1, e2)

    prev_a, a = t, ratio
    prev_b, b = 0, 1
    while a != 0:
        q = prev_a // a
        prev_a, a = a, prev_a - q * a
        prev_b, b = b, prev_b - q * b
        a_mod = a % t
        b_mod = b % t
        if a_mod != 0 and numth.gcd(a_mod, t) == 1:
            new_sum = sum_abs(a_mod, b_mod)
            if new_sum < best:
                best = new_sum
                e1, e2 = a_mod, b_mod
    return e1 * factor1 % t, e1, e2


import os as _os

_STAGE_BARRIERS = _os.environ.get("SEAL_TPU_STAGE_BARRIERS", "auto")


def _stage_barrier(x):
    """Keep stage boundaries when a staged pipeline is inlined into one jit.

    The BEHZ multiply and the key-switch are deliberately staged into
    separate dispatches (XLA mis-schedules the fully fused einsum-NTT
    graph).  But when an op is traced inside a larger jit (a fused deep
    circuit, vmap, or the chained benchmark harness), the cached stage jits
    inline into one graph and the pathology returns.
    ``lax.optimization_barrier`` at the stage seams restores the schedule
    without forcing dispatch boundaries.

    Default is ``auto``: barriers are DROPPED where the transforms lower
    to opaque Pallas kernels (TPU at n >= the pallas threshold) — the
    kernels are scheduling barriers themselves, and the explicit barrier
    costs ~5-8% there (measured: BFV BEHZ 484 -> 462 us at n=8192).  The
    einsum four-step path keeps them.  SEAL_TPU_STAGE_BARRIERS=1/0
    forces globally.

    Applied only to tracers: on concrete arrays (the normal eager staged
    path) it would cost a full dispatch on remote backends for nothing.
    """
    if _STAGE_BARRIERS in ("", "0"):
        return x
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    if not (leaves and isinstance(leaves[0], jax.core.Tracer)):
        return x
    if _STAGE_BARRIERS == "auto":
        from .ops.ntt import _AUTO_PALLAS_MIN_N, _effective_platform

        n = leaves[0].shape[-1] if leaves[0].ndim else 0
        if _effective_platform() == "tpu" and n >= _AUTO_PALLAS_MIN_N.get():
            return x
    return jax.lax.optimization_barrier(x)


_DBL_EPSILON = 2.220446049250313e-16  # std::numeric_limits<double>::epsilon()


def are_same_scale(scale1: float, scale2: float) -> bool:
    """Reference semantics (``util::are_close``, common.h:574-578 via
    ``are_same_scale``, evaluator.cpp:23-27): machine-epsilon-relative
    closeness, NOT a loose rtol — a silently accumulated 1e-13 scale drift
    must fail here exactly as it throws in SEAL."""
    scale_factor = max(abs(scale1), abs(scale2), 1.0)
    return abs(scale1 - scale2) < _DBL_EPSILON * scale_factor


def _is_scale_within_bounds(scale: float, cd: ContextData) -> bool:
    """Mirrors the reference's is_scale_within_bounds (evaluator.cpp:29-48):
    scale must be a positive *normal* double below the modulus bit bound."""
    import math
    import sys

    scheme = cd.parms.scheme
    scale_bit_count_bound = -1
    if scheme == SchemeType.BFV or scheme == SchemeType.BGV:
        scale_bit_count_bound = cd.parms.plain_modulus.bit_count
    elif scheme == SchemeType.CKKS:
        scale_bit_count_bound = cd.total_coeff_modulus_bit_count
    # !isnormal(scale): zero, subnormal, inf and nan all fail
    if scale <= 0 or not math.isfinite(scale) or scale < sys.float_info.min:
        return False
    return not (math.floor(math.log2(scale)) >= scale_bit_count_bound)


class Evaluator:
    def __init__(self, context: SealContext, throw_on_transparent: bool = True, mesh=None):
        """``throw_on_transparent`` mirrors the reference's
        SEAL_THROW_ON_TRANSPARENT_CIPHERTEXT build option (default ON).  On
        TPU the check forces a device sync per op, so latency-critical
        pipelines may disable it.

        ``mesh`` (an ``HEMesh``) makes the evaluator mesh-aware: key tensors
        and ciphertexts placed with :meth:`shard_keys` / :meth:`shard` carry
        NamedShardings over the mesh's limb axis, and the same jitted op
        bodies then execute sharded (GSPMD inserts the base-conversion /
        key-switch collectives of SURVEY.md §2.12).  No mesh = single-chip,
        identical numerics.
        """
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        self.context = context
        self.throw_on_transparent = throw_on_transparent
        self.hem = mesh

    # ------------------------------------------------------------------
    # mesh placement (multi-chip story; no-ops without a mesh)
    # ------------------------------------------------------------------
    def shard(self, ct: Ciphertext) -> Ciphertext:
        """Place a ciphertext's RNS limbs over the mesh's limb axis."""
        if self.hem is None:
            return ct
        import jax
        from jax.sharding import NamedSharding

        sh = NamedSharding(self.hem.mesh, self.hem.ct_spec())
        out = ct.copy()
        out.data = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), ct.data)
        return out

    def shard_keys(self, keys: KSwitchKeys) -> KSwitchKeys:
        """Place key-switch key tensors (decomposition axis) over the mesh's
        limb axis, once, ahead of the op stream."""
        if self.hem is None:
            return keys
        from .parallel.mesh import shard_kswitch_key

        out = type(keys)()
        out.parms_id = keys.parms_id
        out.keys = [
            None if entry is None else shard_kswitch_key(self.hem, entry)
            for entry in keys.keys
        ]
        return out

    def _jit(self, key, builder):
        """Cache jit-compiled op bodies per (op, level, shape) key.

        The builder closes over context constants (tables become jit
        constants); tracing happens once per key, so steady-state op
        execution is allocation- and retrace-free — the TPU analog of the
        reference's preallocated-pool fast path (SURVEY.md §2.8).
        """
        cache = self.context._jit_cache
        fn = cache.get(key)
        if fn is None:
            import jax

            fn = jax.jit(builder)
            cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    # validation helpers
    # ------------------------------------------------------------------
    def _cd(self, ct: Ciphertext) -> ContextData:
        cd = self.context.get_context_data(ct.parms_id)
        if cd is None:
            raise ValueError("ciphertext is not valid for encryption parameters")
        if ct.seed_info is not None:
            # Serialization-only representation: c1 is a seed, not data
            # (is_buffer_valid rejection of seeded objects, ciphertext.h:711-725)
            raise ValueError("ciphertext is not valid for encryption parameters (contains a seed)")
        if ct.size < 2:
            raise ValueError("ciphertext is empty or invalid")
        return cd

    def _check_transparent(self, ct: Ciphertext):
        if THROW_ON_TRANSPARENT and self.throw_on_transparent and ct.is_transparent():
            raise ValueError("result ciphertext is transparent")

    @staticmethod
    def _check_same(ct1: Ciphertext, ct2: Ciphertext):
        if ct1.parms_id != ct2.parms_id:
            raise ValueError("encrypted1 and encrypted2 parameter mismatch")
        if ct1.is_ntt_form != ct2.is_ntt_form:
            raise ValueError("NTT form mismatch")
        if not are_same_scale(ct1.scale, ct2.scale):
            raise ValueError("scale mismatch")

    # ------------------------------------------------------------------
    # negate / add / sub
    # ------------------------------------------------------------------
    def negate(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        fn = self._jit(
            ("negate", ct.parms_id, ct.size),
            lambda d: U.neg_mod(d, (cd.limb_tables().q_lo[None], cd.limb_tables().q_hi[None])),
        )
        out = ct.copy()
        out.data = fn(ct.data)
        self._check_transparent(out)
        return out

    def _add_sub(self, ct1: Ciphertext, ct2: Ciphertext, is_add: bool) -> Ciphertext:
        self._check_same(ct1, ct2)
        cd = self._cd(ct1)
        t = cd.limb_tables()
        q = (t.q_lo[None], t.q_hi[None])

        f = 1
        balance = (
            cd.parms.scheme == SchemeType.BGV and ct1.correction_factor != ct2.correction_factor
        )
        if balance:
            f, e1, e2 = _balance_correction_factors(
                ct1.correction_factor, ct2.correction_factor, cd.parms.plain_modulus.value
            )
        else:
            f = ct1.correction_factor
            e1 = e2 = 1

        def body(d1, d2):
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
            ("add_sub", ct1.parms_id, ct1.size, ct2.size, is_add, e1 if balance else 1, e2 if balance else 1),
            body,
        )
        out = ct1.copy()
        out.data = fn(ct1.data, ct2.data)
        out.correction_factor = f
        self._check_transparent(out)
        return out

    def add(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        return self._add_sub(ct1, ct2, True)

    def sub(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        return self._add_sub(ct1, ct2, False)

    def add_many(self, cts: Sequence[Ciphertext]) -> Ciphertext:
        if not cts:
            raise ValueError("encrypteds cannot be empty")
        acc = cts[0]
        for ct in cts[1:]:
            acc = self.add(acc, ct)
        return acc

    # ------------------------------------------------------------------
    # multiply / square
    # ------------------------------------------------------------------
    def multiply(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        if ct1.parms_id != ct2.parms_id:
            raise ValueError("encrypted1 and encrypted2 parameter mismatch")
        square = ct1 is ct2
        scheme = self.context.first_context_data().parms.scheme
        if scheme == SchemeType.BFV:
            out = self._bfv_multiply(ct1, ct2, square)
        elif scheme == SchemeType.CKKS:
            out = self._ckks_multiply(ct1, ct2, square)
        elif scheme == SchemeType.BGV:
            out = self._bgv_multiply(ct1, ct2, square)
        else:
            raise ValueError("unsupported scheme")
        self._check_transparent(out)
        return out

    def square(self, ct: Ciphertext) -> Ciphertext:
        """Dedicated square: skips duplicate cross products (cf. the
        reference's bfv_square / dyadic square fast paths)."""
        return self.multiply(ct, ct)

    def _convolve(self, polys1, polys2, q, rlo, rhi, square: bool = False) -> List[U.U64]:
        """Dyadic convolution out[i] = sum_{j+k=i} p1[j] * p2[k].

        With ``square`` (polys1 is polys2), symmetric cross terms are computed
        once and doubled.
        """
        s1, s2 = len(polys1), len(polys2)
        dest = []
        for i in range(s1 + s2 - 1):
            acc = None
            lo_j = max(0, i - s2 + 1)
            hi_j = min(i, s1 - 1)
            for j in range(lo_j, hi_j + 1):
                k = i - j
                if square and j > k:
                    continue  # folded into the doubled j < k term
                prod = U.mul_mod(polys1[j], polys2[k], q, rlo, rhi)
                if square and j < k:
                    prod = U.add_mod(prod, prod, q)
                acc = prod if acc is None else U.add_mod(acc, prod, q)
            dest.append(acc)
        return dest

    def _bfv_multiply(self, ct1: Ciphertext, ct2: Ciphertext, square: bool = False) -> Ciphertext:
        """BEHZ RNS multiplication (evaluator.cpp:395-567).

        Staged into several jitted kernels rather than one monolithic graph:
        XLA mis-schedules the base-conversion contraction fused together with
        the NTT stage chain (observed: the composed graph runs far slower
        than the sum of its stages), so stage boundaries are real dispatch
        boundaries; ``_stage_barrier`` preserves them when inlined.
        """
        if ct1.is_ntt_form or ct2.is_ntt_form:
            raise ValueError("encrypted1 or encrypted2 cannot be in NTT form")
        cd = self._cd(ct1)
        size1, size2 = ct1.size, ct2.size
        tool = cd.rns_tool
        pid = ct1.parms_id

        # Stage kernels (each jit-cached per level; poly-shaped (size,k,n))
        ntt_q = self._jit(
            ("behz_ntt_q", pid), lambda d: NTT.ntt_forward(d, cd.limb_tables(), lazy=True)
        )
        ext_bsk = self._jit(
            ("behz_ext", pid), lambda d: R.sm_mrq(R.fastbconv_m_tilde(d, tool), tool)
        )
        ntt_bsk = self._jit(
            ("behz_ntt_bsk", pid), lambda d: NTT.ntt_forward(d, cd.bsk_limb_tables(), lazy=True)
        )

        def conv_builder(base):
            t = cd.limb_tables() if base == "q" else cd.bsk_limb_tables()

            def conv(d1s, d2s):
                polys1 = [(d1s[0][j], d1s[1][j]) for j in range(size1)]
                polys2 = polys1 if square else [(d2s[0][j], d2s[1][j]) for j in range(size2)]
                return _stack_polys(self._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi, square))

            return conv

        conv_q = self._jit(("behz_conv_q", pid, size1, size2, square), conv_builder("q"))
        conv_b = self._jit(("behz_conv_b", pid, size1, size2, square), conv_builder("b"))

        def intt_scale_builder(base):
            # x t is folded into the iNTT's fused 1/n constants — the
            # explicit Shoup-multiply pass of evaluator.cpp:549 is free here
            t = cd.tscaled_limb_tables(base)

            def f(d):
                return NTT.ntt_inverse(d, t)

            return f

        intt_q = self._jit(("behz_intt_q", pid), intt_scale_builder("q"))
        intt_b = self._jit(("behz_intt_b", pid), intt_scale_builder("b"))
        floor_fn = self._jit(("behz_floor", pid), lambda d: R.fast_floor(d, tool))
        sk_fn = self._jit(("behz_sk", pid), lambda d: R.fastbconv_sk(d, tool))

        # Steps (1)-(3): extend both inputs.  _stage_barrier keeps these
        # seams when the whole multiply is inlined into an enclosing jit.
        # BEHZ-composed graphs profit from the fused Pallas NTT already at
        # n=8192 (725 -> 634 us measured), unlike the CKKS pipeline where
        # the einsum four-step wins at that size — opt in locally.
        b = _stage_barrier
        with NTT.auto_pallas_min_n(8192):
            e1_q = b(ntt_q(ct1.data))
            e1_b = b(ntt_bsk(b(ext_bsk(ct1.data))))
            if square:
                e2_q, e2_b = e1_q, e1_b
            else:
                e2_q = b(ntt_q(ct2.data))
                e2_b = b(ntt_bsk(b(ext_bsk(ct2.data))))

            # Step (4): dyadic convolutions
            dest_q = b(conv_q(e1_q, e2_q))
            dest_b = b(conv_b(e1_b, e2_b))

            # Steps (5)-(8), vectorized over output polys
            dq = b(intt_q(dest_q))
            db = b(intt_b(dest_b))
            joined = (
                jnp.concatenate([dq[0], db[0]], axis=1),
                jnp.concatenate([dq[1], db[1]], axis=1),
            )
            out_data = sk_fn(b(floor_fn(joined)))
        out = ct1.copy()
        out.data = out_data
        return out

    def _ntt_convolve_jit(self, cd, ct1: Ciphertext, ct2: Ciphertext, square: bool = False) -> U.U64:
        size1, size2 = ct1.size, ct2.size

        def body(d1, d2):
            t = cd.limb_tables()
            polys1 = [(d1[0][j], d1[1][j]) for j in range(size1)]
            polys2 = polys1 if square else [(d2[0][j], d2[1][j]) for j in range(size2)]
            return _stack_polys(self._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi, square))

        fn = self._jit(("ntt_conv", ct1.parms_id, size1, size2, square), body)
        return fn(ct1.data, ct2.data)

    def _ckks_multiply(self, ct1: Ciphertext, ct2: Ciphertext, square: bool = False) -> Ciphertext:
        if not (ct1.is_ntt_form and ct2.is_ntt_form):
            raise ValueError("encrypted1 and encrypted2 must be in NTT form")
        cd = self._cd(ct1)
        out = ct1.copy()
        out.data = self._ntt_convolve_jit(cd, ct1, ct2, square)
        out.scale = ct1.scale * ct2.scale
        if not _is_scale_within_bounds(out.scale, cd):
            raise ValueError("scale out of bounds")
        return out

    def _bgv_multiply(self, ct1: Ciphertext, ct2: Ciphertext, square: bool = False) -> Ciphertext:
        if not (ct1.is_ntt_form and ct2.is_ntt_form):
            raise ValueError("encrypted1 and encrypted2 must be in NTT form")
        cd = self._cd(ct1)
        out = ct1.copy()
        out.data = self._ntt_convolve_jit(cd, ct1, ct2, square)
        out.correction_factor = (
            ct1.correction_factor * ct2.correction_factor % cd.parms.plain_modulus.value
        )
        return out

    def multiply_many(self, cts: Sequence[Ciphertext], relin_keys: RelinKeys) -> Ciphertext:
        """Binary-tree product (BFV/BGV only; evaluator.cpp:1649-1724)."""
        if not cts:
            raise ValueError("encrypteds cannot be empty")
        scheme = self.context.first_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        if len(cts) == 1:
            return cts[0]
        queue = list(cts)
        while len(queue) > 1:
            nxt = []
            for i in range(0, len(queue) - 1, 2):
                prod = self.relinearize(self.multiply(queue[i], queue[i + 1]), relin_keys)
                nxt.append(prod)
            if len(queue) % 2:
                nxt.append(queue[-1])
            queue = nxt
        return queue[0]

    def exponentiate(self, ct: Ciphertext, exponent: int, relin_keys: RelinKeys) -> Ciphertext:
        if exponent == 0:
            raise ValueError("exponent cannot be 0")
        return self.multiply_many([ct] * exponent, relin_keys)

    # ------------------------------------------------------------------
    # key switching core (evaluator.cpp:2561-2867)
    # ------------------------------------------------------------------
    def _switch_key(self, ct: Ciphertext, target: U.U64, key: dict) -> Ciphertext:
        """Returns ct with (result_c0, result_c1) added into polys 0 and 1.

        ``target`` is one RNS polynomial (D, n) in the ciphertext's domain.
        """
        cd = self._cd(ct)
        scheme = cd.parms.scheme
        # scheme/NTT-form consistency (switch_key_inplace, evaluator.cpp:2600-2611)
        if scheme == SchemeType.BFV and ct.is_ntt_form:
            raise ValueError("BFV encrypted cannot be in NTT form")
        if scheme in (SchemeType.CKKS, SchemeType.BGV) and not ct.is_ntt_form:
            raise ValueError(f"{scheme.name} encrypted must be in NTT form")
        if not self.context.using_keyswitching:
            raise ValueError("keyswitching is not supported by the context")
        # A truncated unsafe-loaded key blob may carry fewer decomposition
        # limbs than the level needs (RelinearizeShortKeyVector); more is fine
        # (RelinearizeLowerLevel keeps the >= contract).
        D = len(cd.parms.coeff_modulus)
        if key is None or key["c0"][0].shape[0] < D:
            raise ValueError("key-switching keys are invalid for encryption parameters")
        fn = self._jit(
            ("switch_key", ct.parms_id, ct.size, cd.parms.scheme),
            lambda data, tgt, kc0, kc1: self._switch_key_body(cd, ct.size, data, tgt, kc0, kc1),
        )
        out = ct.copy()
        out.data = fn(ct.data, target, key["c0"], key["c1"])
        return out

    def _switch_key_body(self, cd: ContextData, ct_size: int, ct_data, target: U.U64, key_c0, key_c1):
        scheme = cd.parms.scheme
        key_cd = self.context.key_context_data()
        key_moduli = key_cd.coeff_modulus_values
        key_tables = key_cd.limb_tables()
        D = len(cd.parms.coeff_modulus)          # decomp modulus size
        k_key = len(key_moduli)
        sel_idx = list(range(D)) + [k_key - 1]   # output limb -> key modulus
        Rn = D + 1
        sel_tables = take_limbs(key_tables, sel_idx)
        sel_q = sel_tables.q
        sel_rlo, sel_rhi = sel_tables.ratio_lo, sel_tables.ratio_hi

        t_current = cd.limb_tables()
        if scheme in (SchemeType.CKKS, SchemeType.BGV):
            t_target = NTT.ntt_inverse(target, t_current)
        else:
            t_target = target

        qv = np.array(cd.coeff_modulus_values, dtype=object)
        sel_vals = [key_moduli[i] for i in sel_idx]
        need_reduce = np.array(
            [[qj > qi for qi in sel_vals] for qj in cd.coeff_modulus_values]
        )

        # Select key columns: (D, k_key, n) -> (D, Rn, n)
        def sel(keyc):
            lo, hi = keyc
            return (
                jnp.concatenate([lo[:, :D, :], lo[:, k_key - 1 :, :]], axis=1),
                jnp.concatenate([hi[:, :D, :], hi[:, k_key - 1 :, :]], axis=1),
            )

        kc0, kc1 = sel(key_c0), sel(key_c1)
        # Stack both key components: (2, D, Rn, n).  One contraction and one
        # batched tail NTT cover both output polynomials — double the MXU
        # batch per dispatch vs doing c0 and c1 sequentially.
        kc = (jnp.stack([kc0[0], kc1[0]]), jnp.stack([kc0[1], kc1[1]]))

        n = cd.parms.poly_modulus_degree
        from .ops.pallas_switch_key import fits_fused

        if NTT._dispatch_mxu(sel_tables, n) == "pallas" and fits_fused(
            NTT._mxu_tables_for(sel_tables)
        ):
            # Fused decompose+NTT+contract kernel with the reference's
            # i == j diagonal fast path (ops/pallas_switch_key.py).
            from .ops.pallas_switch_key import switch_key_contract

            t_ntt_form = target if scheme in (SchemeType.CKKS, SchemeType.BGV) else None
            prod = _stage_barrier(switch_key_contract(
                t_target, t_ntt_form, kc, NTT._mxu_tables_for(sel_tables),
                need_reduce))
        else:
            # Build (D, Rn, n): t_target[J] reduced mod each output modulus.
            tt = (t_target[0][:, None, :], t_target[1][:, None, :])
            reduced = U.barrett_reduce_64(tt, sel_q, sel_rhi)
            t_op = U.select64(jnp.asarray(need_reduce[:, :, None]), reduced, tt)
            # Batched NTT: leading axis D, limb axis Rn
            t_op = _stage_barrier(NTT.ntt_forward(t_op, sel_tables, lazy=True))  # (D, Rn, n) < 4q

            # Contraction over D with 128-bit accumulation.  For 60-bit user
            # moduli, D*4q*q < 2^128 holds up to D=64 (defines.h:66 rationale);
            # reduce every 64 summands as a guard.
            def contract(t_op, keyc):
                n = t_op[0].shape[-1]
                if debug.enabled():
                    # u128 accumulator margin (defines.h:66 rationale): 64 lazy
                    # summands of (4q)*(q) must stay below 2^128 for the largest
                    # modulus in play, or the in-loop Barrett guard is too late.
                    max_q = max(sel_vals)
                    assert min(64, D) * (4 * max_q) * max_q < (1 << 128), (
                        "switch_key accumulator would overflow u128; "
                        f"D={D} max_q bits={max_q.bit_length()}"
                    )
                    debug.check_below(
                        t_op, U.add64((sel_tables.two_q_lo, sel_tables.two_q_hi),
                                      (sel_tables.two_q_lo, sel_tables.two_q_hi)),
                        "switch_key t_op < 4q before 128-bit accumulation",
                    )
                acc = U.zero128((2, Rn, n))
                for j in range(D):
                    x = (t_op[0][j], t_op[1][j])          # (Rn, n)
                    y = (keyc[0][:, j], keyc[1][:, j])    # (2, Rn, n)
                    acc = U.add128(acc, U.mul64_wide(x, y))
                    if (j + 1) % 64 == 0 and j + 1 < D:
                        red = U.barrett_reduce_128(acc, sel_q, sel_rlo, sel_rhi)
                        acc = (red[0], red[1], jnp.zeros_like(red[0]), jnp.zeros_like(red[0]))
                return U.barrett_reduce_128(acc, sel_q, sel_rlo, sel_rhi)

            prod = _stage_barrier(contract(t_op, kc))  # (2, Rn, n) NTT form mod sel moduli

        # Switch the special prime away and add into ct (per component).
        qk = key_moduli[-1]
        last_tab = slice_limbs(key_tables, k_key - 1, k_key)
        dec_tab = slice_limbs(key_tables, 0, D)  # decomp moduli are key moduli[0:D]
        out_polys = [(ct_data[0][j], ct_data[1][j]) for j in range(ct_size)]

        t_last = (prod[0][:, D:], prod[1][:, D:])  # (2, 1, n) NTT mod qk
        rest = (prod[0][:, :D], prod[1][:, :D])    # (2, D, n) NTT mod q_i

        if scheme == SchemeType.BGV:
            tv = cd.parms.plain_modulus.value
            qk_inv_qp = key_cd.rns_tool.inv_q_last_mod_t
            t_last_c = NTT.ntt_inverse(t_last, last_tab)
            t_c = U.const_u64(tv, (1, 1))
            t_rhi = _ratio([tv])[1]
            kk = U.barrett_reduce_64(t_last_c, t_c, t_rhi)
            kk = U.neg_mod(kk, t_c)
            if qk_inv_qp != 1:
                op, qt = _cshoup([qk_inv_qp], [tv])
                kk = U.mul_mod_shoup(kk, op, qt, t_c)
            dq = _c(cd.coeff_modulus_values)
            drlo, drhi = _ratio(cd.coeff_modulus_values)
            delta = U.barrett_reduce_64(kk, dq, drhi)
            qk_op, qk_qt = _cshoup([qk % qi for qi in cd.coeff_modulus_values], cd.coeff_modulus_values)
            delta = U.mul_mod_shoup(delta, qk_op, qk_qt, dq)
            c_mod_qi = U.barrett_reduce_64(t_last_c, dq, drhi)
            delta = U.add_mod(delta, c_mod_qi, dq)
            delta = NTT.ntt_forward(delta, dec_tab)
            new = U.sub_mod(rest, delta, dq)
            ms_op, ms_qt = _cshoup(key_cd.rns_tool.inv_q_last_mod_q[:D], cd.coeff_modulus_values)
            new = U.mul_mod_shoup(new, ms_op, ms_qt, dq)
        else:
            # BFV / CKKS branch (evaluator.cpp:2806-2865)
            t_last_c = NTT.ntt_inverse(t_last, last_tab, lazy=True)  # < 2qk
            qk_half = qk >> 1
            qk_c = U.const_u64(qk, (1, 1))
            qk_rhi = _ratio([qk])[1]
            t_last_c = U.barrett_reduce_64(U.add64(t_last_c, U.const_u64(qk_half)), qk_c, qk_rhi)

            dq = _c(cd.coeff_modulus_values)
            drlo, drhi = _ratio(cd.coeff_modulus_values)
            red = U.barrett_reduce_64(t_last_c, dq, drhi)
            mask = jnp.asarray(
                np.array([qk > qi for qi in cd.coeff_modulus_values]).reshape(-1, 1)
            )
            t_ntt = U.select64(mask, red, t_last_c)
            fix = _c([qi - (qk_half % qi) for qi in cd.coeff_modulus_values])
            t_ntt = U.add64(t_ntt, fix)  # < 2q_i

            if scheme == SchemeType.CKKS:
                t_ntt = NTT.ntt_forward(t_ntt, dec_tab, lazy=True)  # < 4q_i
                qi_lazy = _c([qi << 2 for qi in cd.coeff_modulus_values])
                comp_poly = rest
            elif scheme == SchemeType.BFV:
                comp_poly = NTT.ntt_inverse(rest, dec_tab, lazy=True)  # < 2q_i
                qi_lazy = _c([qi << 1 for qi in cd.coeff_modulus_values])

            combined = U.sub64(U.add64(comp_poly, qi_lazy), t_ntt)
            ms_op, ms_qt = _cshoup(key_cd.rns_tool.inv_q_last_mod_q[:D], cd.coeff_modulus_values)
            new = U.mul_mod_shoup(combined, ms_op, ms_qt, dq)

        for comp in (0, 1):
            out_polys[comp] = U.add_mod(
                (new[0][comp], new[1][comp]), out_polys[comp], dq
            )

        return _stack_polys(out_polys)

    # ------------------------------------------------------------------
    # relinearize
    # ------------------------------------------------------------------
    def relinearize(self, ct: Ciphertext, relin_keys: RelinKeys, destination_size: int = 2) -> Ciphertext:
        if relin_keys.parms_id != self.context.key_parms_id:
            raise ValueError("relin_keys is not valid for encryption parameters")
        if not (2 <= destination_size <= ct.size):
            raise ValueError("destination_size must be in [2, encrypted.size()]")
        if destination_size == ct.size:
            return ct
        relins_needed = ct.size - destination_size
        out = ct
        for i in range(relins_needed):
            target = out.poly(out.size - 1)
            # key for secret power = index of the removed polynomial
            if not relin_keys.has_key(out.size - 1):
                raise ValueError("relin_keys is missing required key")
            key = relin_keys.key(out.size - 1)
            trimmed = out.copy()
            trimmed.data = (out.data[0][: out.size - 1], out.data[1][: out.size - 1])
            out = self._switch_key(trimmed, target, key)
        self._check_transparent(out)
        return out

    # ------------------------------------------------------------------
    # modulus switching / rescaling
    # ------------------------------------------------------------------
    def _mod_switch_scale_to_next(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        scheme = cd.parms.scheme
        if scheme == SchemeType.BFV and ct.is_ntt_form:
            raise ValueError("BFV encrypted cannot be in NTT form")
        if scheme in (SchemeType.CKKS, SchemeType.BGV) and not ct.is_ntt_form:
            raise ValueError(f"{scheme.name} encrypted must be in NTT form")
        next_cd = cd.next_context_data
        if next_cd is None:
            raise ValueError("end of modulus switching chain reached")
        if scheme == SchemeType.CKKS:
            # both the current and the destination scale must stay normal and
            # in bounds (evaluator.cpp:1232-1238)
            if not _is_scale_within_bounds(ct.scale, cd) or not _is_scale_within_bounds(
                ct.scale / cd.coeff_modulus_values[-1], next_cd
            ):
                raise ValueError("scale out of bounds")
        def body(data):
            tool = cd.rns_tool
            tables = cd.limb_tables()
            if scheme == SchemeType.BFV:
                op = lambda p: R.divide_and_round_q_last(p, tool)
            elif scheme == SchemeType.CKKS:
                op = lambda p: R.divide_and_round_q_last_ntt(p, tool, tables)
            else:
                op = lambda p: R.mod_t_and_divide_q_last_ntt(p, tool, tables)
            return _stack_polys([op((data[0][j], data[1][j])) for j in range(data[0].shape[0])])

        fn = self._jit(("mod_switch_scale", ct.parms_id, ct.size), body)
        out = Ciphertext(
            data=fn(ct.data),
            parms_id=next_cd.parms_id,
            is_ntt_form=ct.is_ntt_form,
            scale=ct.scale,
            correction_factor=ct.correction_factor,
        )
        if scheme == SchemeType.CKKS:
            out.scale = ct.scale / cd.coeff_modulus_values[-1]
        if scheme == SchemeType.BGV:
            out.correction_factor = (
                ct.correction_factor * cd.rns_tool.inv_q_last_mod_t % cd.parms.plain_modulus.value
            )
        return out

    def _mod_switch_drop_to_next(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        next_cd = cd.next_context_data
        if next_cd is None:
            raise ValueError("end of modulus switching chain reached")
        if cd.parms.scheme == SchemeType.CKKS and not _is_scale_within_bounds(ct.scale, next_cd):
            raise ValueError("scale out of bounds")
        k_next = len(next_cd.parms.coeff_modulus)
        out = ct.copy()
        out.data = (ct.data[0][:, :k_next, :], ct.data[1][:, :k_next, :])
        out.parms_id = next_cd.parms_id
        return out

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        cd = self._cd(ct)
        scheme = self.context.first_context_data().parms.scheme
        if scheme == SchemeType.CKKS:
            out = self._mod_switch_drop_to_next(ct)
        else:
            out = self._mod_switch_scale_to_next(ct)
        self._check_transparent(out)
        return out

    def mod_switch_to(self, ct: Ciphertext, parms_id: ParmsId) -> Ciphertext:
        cd = self._cd(ct)
        target = self.context.get_context_data(parms_id)
        if target is None:
            raise ValueError("parms_id is not valid")
        if cd.chain_index < target.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        out = ct
        while out.parms_id != parms_id:
            out = self.mod_switch_to_next(out)
        return out

    def mod_switch_plain_to(self, plain: Plaintext, parms_id: ParmsId) -> Plaintext:
        """NTT-form plaintext: drop limbs only (evaluator.cpp plain overload)."""
        if not plain.is_ntt_form:
            raise ValueError("plain is not in NTT form")
        cd = self.context.get_context_data(plain.parms_id)
        target = self.context.get_context_data(parms_id)
        if cd is None or target is None:
            raise ValueError("parms_id is not valid")
        if cd.chain_index < target.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        k_next = len(target.parms.coeff_modulus)
        out = plain.copy()
        out.rns_data = (plain.rns_data[0][:k_next], plain.rns_data[1][:k_next])
        out.parms_id = parms_id
        return out

    def rescale_to_next(self, ct: Ciphertext) -> Ciphertext:
        scheme = self.context.first_context_data().parms.scheme
        if scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        out = self._mod_switch_scale_to_next(ct)
        self._check_transparent(out)
        return out

    def rescale_to(self, ct: Ciphertext, parms_id: ParmsId) -> Ciphertext:
        target = self.context.get_context_data(parms_id)
        cd = self._cd(ct)
        if target is None or cd.chain_index < target.chain_index:
            raise ValueError("cannot switch to higher level modulus")
        out = ct
        while out.parms_id != parms_id:
            out = self.rescale_to_next(out)
        return out

    def mod_reduce_to_next(self, ct: Ciphertext) -> Ciphertext:
        out = self._mod_switch_drop_to_next(ct)
        self._check_transparent(out)
        return out

    def mod_reduce_to(self, ct: Ciphertext, parms_id: ParmsId) -> Ciphertext:
        out = ct
        while out.parms_id != parms_id:
            out = self.mod_reduce_to_next(out)
        return out

    # ------------------------------------------------------------------
    # plaintext ops
    # ------------------------------------------------------------------
    def add_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._add_sub_plain(ct, plain, True)

    def sub_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        return self._add_sub_plain(ct, plain, False)

    def _add_sub_plain(self, ct: Ciphertext, plain: Plaintext, is_add: bool) -> Ciphertext:
        from .encryptor import bgv_lift_plain, multiply_add_plain_with_scaling_variant

        cd = self._cd(ct)
        scheme = cd.parms.scheme
        out = ct.copy()

        def set_c0_op(d, p):
            t = cd.limb_tables()
            op = U.add_mod if is_add else U.sub_mod
            c0 = op((d[0][0], d[1][0]), p, t.q)
            return (d[0].at[0].set(c0[0]), d[1].at[0].set(c0[1]))

        if scheme == SchemeType.BFV:
            if ct.is_ntt_form or plain.is_ntt_form:
                raise ValueError("BFV operands cannot be in NTT form")
            c0 = multiply_add_plain_with_scaling_variant(plain, cd, ct.poly(0), negate=not is_add)
            out.data = (ct.data[0].at[0].set(c0[0]), ct.data[1].at[0].set(c0[1]))
        elif scheme == SchemeType.CKKS:
            if not ct.is_ntt_form or not plain.is_ntt_form:
                raise ValueError("CKKS operands must be in NTT form")
            if ct.parms_id != plain.parms_id:
                raise ValueError("encrypted and plain parameter mismatch")
            if not are_same_scale(ct.scale, plain.scale):
                raise ValueError("scale mismatch")
            fn = self._jit(("add_sub_plain", ct.parms_id, ct.size, is_add), set_c0_op)
            out.data = fn(ct.data, plain.rns_data)
        elif scheme == SchemeType.BGV:
            if not ct.is_ntt_form:
                raise ValueError("BGV encrypted must be in NTT form")
            if plain.is_ntt_form:
                raise ValueError("BGV plain cannot be in NTT form")
            tv = cd.parms.plain_modulus.value
            scaled = plain.copy()
            scaled.coeff_data = np.array(
                [int(c) * ct.correction_factor % tv for c in plain.coeff_data], dtype=np.uint64
            )
            lifted = bgv_lift_plain(scaled, cd)
            fn = self._jit(("add_sub_plain", ct.parms_id, ct.size, is_add), set_c0_op)
            out.data = fn(ct.data, lifted)
        else:
            raise ValueError("unsupported scheme")
        self._check_transparent(out)
        return out

    def multiply_plain(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        cd = self._cd(ct)
        if ct.is_ntt_form and plain.is_ntt_form:
            out = self._multiply_plain_ntt(ct, plain)
        elif not ct.is_ntt_form and not plain.is_ntt_form:
            out = self._multiply_plain_normal(ct, plain)
        elif ct.is_ntt_form:
            # NTT ciphertext x coeff plain: lift the plain (the reference's
            # BGV-era branch, evaluator.cpp multiply_plain)
            out = self._multiply_plain_ntt(ct, self.transform_plain_to_ntt(plain, ct.parms_id))
        else:
            # coeff ciphertext x NTT plain: transform the ciphertext, multiply
            # in NTT domain, transform back (evaluator.cpp:2006-2010)
            out = self.transform_from_ntt(self._multiply_plain_ntt(self.transform_to_ntt(ct), plain))
        self._check_transparent(out)
        return out

    def _multiply_plain_ntt(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        if ct.parms_id != plain.parms_id:
            raise ValueError("encrypted and plain parameter mismatch")
        cd = self._cd(ct)

        def body(d, p_lo, p_hi):
            t = cd.limb_tables()
            pr = (p_lo[None], p_hi[None])  # (1, k, n)
            return U.mul_mod(d, pr, (t.q_lo[None], t.q_hi[None]),
                             (t.ratio_lo_lo[None], t.ratio_lo_hi[None]),
                             (t.ratio_hi_lo[None], t.ratio_hi_hi[None]))

        fn = self._jit(("mul_plain_ntt", ct.parms_id, ct.size), body)
        out = ct.copy()
        out.data = fn(ct.data, plain.rns_data[0], plain.rns_data[1])
        scale = ct.scale * plain.scale
        if not _is_scale_within_bounds(scale, cd):
            raise ValueError("scale out of bounds")
        out.scale = scale
        return out

    def _multiply_plain_normal(self, ct: Ciphertext, plain: Plaintext) -> Ciphertext:
        from .encryptor import bgv_lift_plain

        cd = self._cd(ct)
        t = cd.limb_tables()
        n = cd.parms.poly_modulus_degree
        thr = cd.plain_upper_half_threshold

        sig = plain.significant_coeff_count()
        nonzero = int(np.count_nonzero(plain.coeff_data))
        out = ct.copy()
        if nonzero == 1:
            # Monomial fast path (evaluator.cpp:2048-2096).  Timing leak on
            # the plaintext structure exists in the reference too
            # (documented there at :2044-2047).
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

            def mono_body(d, mono_lo, mono_hi):
                tt = cd.limb_tables()
                scaled = U.mul_mod(
                    d, (mono_lo[None], mono_hi[None]), (tt.q_lo[None], tt.q_hi[None]),
                    (tt.ratio_lo_lo[None], tt.ratio_lo_hi[None]), (tt.ratio_hi_lo[None], tt.ratio_hi_hi[None]),
                )
                return P.negacyclic_shift(scaled, exp, (tt.q_lo[None], tt.q_hi[None]))

            fn = self._jit(("mul_plain_mono", ct.parms_id, ct.size, exp), mono_body)
            mono_c = _c(mono)
            out.data = fn(ct.data, mono_c[0], mono_c[1])
        else:
            lifted = bgv_lift_plain(plain, cd)  # (k, n) NTT form of lifted plain

            def gen_body(d, p):
                tt = cd.limb_tables()
                polys = []
                for j in range(d[0].shape[0]):
                    pj = NTT.ntt_forward((d[0][j], d[1][j]), tt, lazy=True)
                    pj = U.mul_mod(pj, p, tt.q, tt.ratio_lo, tt.ratio_hi)
                    polys.append(NTT.ntt_inverse(pj, tt))
                return _stack_polys(polys)

            fn = self._jit(("mul_plain_normal", ct.parms_id, ct.size), gen_body)
            out.data = fn(ct.data, lifted)
        scale = ct.scale * plain.scale
        if not _is_scale_within_bounds(scale, cd):
            raise ValueError("scale out of bounds")
        out.scale = scale
        return out

    # ------------------------------------------------------------------
    # NTT transforms
    # ------------------------------------------------------------------
    def transform_plain_to_ntt(self, plain: Plaintext, parms_id: ParmsId) -> Plaintext:
        """Lift mod-t plaintext to RNS mod q and NTT (evaluator.cpp:2196+)."""
        from .encryptor import bgv_lift_plain

        if plain.is_ntt_form:
            raise ValueError("plain is already in NTT form")
        cd = self.context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid")
        out = plain.copy()
        out.rns_data = bgv_lift_plain(plain, cd)
        out.parms_id = parms_id
        out.coeff_data = np.zeros(0, dtype=np.uint64)
        return out

    def transform_to_ntt(self, ct: Ciphertext) -> Ciphertext:
        if ct.is_ntt_form:
            raise ValueError("encrypted is already in NTT form")
        cd = self._cd(ct)
        fn = self._jit(
            ("to_ntt", ct.parms_id, ct.size), lambda d: NTT.ntt_forward(d, cd.limb_tables())
        )
        out = ct.copy()
        out.data = fn(ct.data)
        out.is_ntt_form = True
        return out

    def transform_from_ntt(self, ct: Ciphertext) -> Ciphertext:
        if not ct.is_ntt_form:
            raise ValueError("encrypted is not in NTT form")
        cd = self._cd(ct)
        fn = self._jit(
            ("from_ntt", ct.parms_id, ct.size), lambda d: NTT.ntt_inverse(d, cd.limb_tables())
        )
        out = ct.copy()
        out.data = fn(ct.data)
        out.is_ntt_form = False
        return out

    # ------------------------------------------------------------------
    # Galois / rotations (evaluator.cpp:2384-2559)
    # ------------------------------------------------------------------
    def apply_galois(self, ct: Ciphertext, galois_elt: int, galois_keys: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        if galois_keys.parms_id != self.context.key_parms_id:
            raise ValueError("galois_keys is not valid for encryption parameters")
        n = cd.parms.poly_modulus_degree
        scheme = cd.parms.scheme
        # scheme/NTT-form consistency: reject without touching the operand
        # (ApplyGaloisRejectsWrongNttFormWithoutMutating)
        if scheme == SchemeType.BFV and ct.is_ntt_form:
            raise ValueError("BFV encrypted cannot be in NTT form")
        if scheme in (SchemeType.CKKS, SchemeType.BGV) and not ct.is_ntt_form:
            raise ValueError(f"{scheme.name} encrypted must be in NTT form")
        if not (galois_elt & 1) or galois_elt >= 2 * n:
            raise ValueError("Galois element is not valid")
        if ct.size > 2:
            raise ValueError("encrypted size must be 2")
        if not galois_keys.has_key(galois_elt):
            raise ValueError("Galois key not present")
        tool = cd.galois_tool

        # Permutation + key switch fused into ONE compiled dispatch (the
        # permutation tables are traced args, so a single executable serves
        # every Galois element at this level).
        key = galois_keys.key(galois_elt)
        if key is None or key["c0"][0].shape[0] < len(cd.parms.coeff_modulus):
            raise ValueError("key-switching keys are invalid for encryption parameters")
        if not ct.is_ntt_form:
            src, neg = tool.coeff_table(galois_elt)
            perm_args = (jnp.asarray(src), jnp.asarray(neg))

            def body(d, s, ng, kc0, kc1):
                t = cd.limb_tables()
                c0 = P.apply_galois_coeff((d[0][0], d[1][0]), s, ng, t.q)
                c1 = P.apply_galois_coeff((d[0][1], d[1][1]), s, ng, t.q)
                zeros = (jnp.zeros_like(c1[0]), jnp.zeros_like(c1[1]))
                return self._switch_key_body(
                    cd, 2, _stack_polys([c0, zeros]), c1, kc0, kc1
                )

            fn = self._jit(("galois_coeff_ks", ct.parms_id), body)
        else:
            structured = (
                tool.ntt_table_structured(galois_elt)
                if NTT._effective_platform() == "tpu"
                else None
            )
            if structured is not None:
                # MXU permutation (row-take + one-hot int8 contraction):
                # XLA's lane gather runs ~10x below HBM SoL on TPU
                row_map, col_oh = structured
                # both pieces enter as traced args: ONE compilation covers
                # every Galois element at this level
                perm_args = (jnp.asarray(row_map), jnp.asarray(col_oh))

                def body(d, rm, oh, kc0, kc1):
                    c0 = P.apply_galois_ntt_mxu((d[0][0], d[1][0]), rm, oh)
                    c1 = P.apply_galois_ntt_mxu((d[0][1], d[1][1]), rm, oh)
                    zeros = (jnp.zeros_like(c1[0]), jnp.zeros_like(c1[1]))
                    return self._switch_key_body(
                        cd, 2, _stack_polys([c0, zeros]), c1, kc0, kc1
                    )

                fn = self._jit(("galois_ntt_ks_mxu", ct.parms_id), body)
            else:
                perm_args = (jnp.asarray(tool.ntt_table(galois_elt)),)

                def body(d, tab, kc0, kc1):
                    c0 = P.apply_galois_ntt((d[0][0], d[1][0]), tab)
                    c1 = P.apply_galois_ntt((d[0][1], d[1][1]), tab)
                    zeros = (jnp.zeros_like(c1[0]), jnp.zeros_like(c1[1]))
                    return self._switch_key_body(
                        cd, 2, _stack_polys([c0, zeros]), c1, kc0, kc1
                    )

                fn = self._jit(("galois_ntt_ks", ct.parms_id), body)

        out = ct.copy()
        out.data = fn(ct.data, *perm_args, key["c0"], key["c1"])
        self._check_transparent(out)
        return out

    def _rotate_internal(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        cd = self._cd(ct)
        if not cd.qualifiers.using_batching:
            raise ValueError("encryption parameters do not support batching")
        if steps == 0:
            return ct
        tool = cd.galois_tool
        n = cd.parms.poly_modulus_degree
        elt = tool.get_elt_from_step(steps)
        if galois_keys.has_key(elt):
            return self.apply_galois(ct, elt, galois_keys)
        # NAF decomposition fallback (evaluator.cpp:2538-2557)
        naf_steps = numth.naf(steps)
        if len(naf_steps) == 1:
            raise ValueError("Galois key not present")
        out = ct
        for s in naf_steps:
            out = self._rotate_internal(out, s, galois_keys)
        return out

    def rotate_rows(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        scheme = self.context.first_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        return self._rotate_internal(ct, steps, galois_keys)

    def rotate_columns(self, ct: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        scheme = self.context.first_context_data().parms.scheme
        if scheme not in (SchemeType.BFV, SchemeType.BGV):
            raise ValueError("unsupported scheme")
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        return self.apply_galois(ct, 2 * n - 1, galois_keys)

    def rotate_vector(self, ct: Ciphertext, steps: int, galois_keys: GaloisKeys) -> Ciphertext:
        scheme = self.context.first_context_data().parms.scheme
        if scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        return self._rotate_internal(ct, steps, galois_keys)

    def complex_conjugate(self, ct: Ciphertext, galois_keys: GaloisKeys) -> Ciphertext:
        scheme = self.context.first_context_data().parms.scheme
        if scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        cd = self._cd(ct)
        n = cd.parms.poly_modulus_degree
        return self.apply_galois(ct, 2 * n - 1, galois_keys)
