"""CKKSEncoder: canonical-embedding encode/decode for approximate arithmetic.

Counterpart of ``ckks.{h,cpp}``: N/2 complex slots via the g=3 orbit index
map; encode runs an inverse complex FFT (same butterfly recursion as the
NTT, complex roots, 1/n and scale fused), rounds each real coefficient to an
exact integer, reduces into every RNS limb, and NTT-transforms on device.
Decode is the reverse: iNTT, CRT-compose, centered lift scaled by 1/scale
with per-64-bit-word double accumulation (ckks.h:683-787), forward FFT.

The FFT stages are vectorized numpy complex128 on host — bit-identical
structure to the reference's DWTHandler recursion; double rounding behavior
matches (round half away from zero).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Union

import numpy as np

from . import numth
from .context import SealContext
from .data import Plaintext
from .params import PARMS_ID_ZERO, ParmsId, SchemeType
from .ops import ntt as NTT
from .ops import u64 as U


class CKKSEncoder:
    def __init__(self, context: SealContext):
        if not context.parameters_set:
            raise ValueError("encryption parameters are not set correctly")
        cd = context.first_context_data()
        if cd.parms.scheme != SchemeType.CKKS:
            raise ValueError("unsupported scheme")
        self.context = context
        n = cd.parms.poly_modulus_degree
        self.n = n
        self.slots = n >> 1
        #: reference-parity alias (CKKSEncoder::slot_count, ckks.h)
        self.slot_count = self.slots
        logn = n.bit_length() - 1
        self.logn = logn
        m = n << 1

        # index map (ckks.cpp:33-50)
        index_map = np.zeros(n, dtype=np.int64)
        pos = 1
        for i in range(self.slots):
            index1 = (pos - 1) >> 1
            index2 = (m - pos - 1) >> 1
            index_map[i] = numth.reverse_bits(index1, logn)
            index_map[self.slots | i] = numth.reverse_bits(index2, logn)
            pos = (pos * 3) & (m - 1)
        self.index_map = index_map

        # complex root tables in the same bit-reversed / scrambled layouts as
        # the NTT twiddles (ckks.cpp:52-66)
        def root(k):
            return complex(math.cos(2 * math.pi * k / m), math.sin(2 * math.pi * k / m))

        self.root_powers = np.zeros(n, dtype=np.complex128)
        self.inv_root_powers = np.zeros(n, dtype=np.complex128)
        for i in range(1, n):
            self.root_powers[i] = root(numth.reverse_bits(i, logn))
            self.inv_root_powers[i] = root(numth.reverse_bits(i - 1, logn) + 1).conjugate()

        # device slot-FFT stage tables (double-float), built lazily
        self._inv_stage_roots = None
        self._fwd_stage_roots = None

    def _device_fft_enabled(self) -> bool:
        import os

        return os.environ.get("SEAL_TPU_DEVICE_FFT", "1") not in ("", "0")

    def _inv_stages(self):
        if self._inv_stage_roots is None:
            from .ops import slot_fft as SF

            self._inv_stage_roots = SF.inv_fft_stage_roots(self.inv_root_powers, self.n)
        return self._inv_stage_roots

    def _fwd_stages(self):
        if self._fwd_stage_roots is None:
            from .ops import slot_fft as SF

            self._fwd_stage_roots = SF.fwd_fft_stage_roots(self.root_powers, self.n)
        return self._fwd_stage_roots

    # -- FFT butterflies (complex analog of dwthandler.h) ------------------
    def _fft_from_rev(self, values: np.ndarray, fix: float) -> np.ndarray:
        """Inverse FFT: bit-reversed input -> normal order, scaled by fix."""
        n = self.n
        a = values.copy()
        offset = 1
        gap = 1
        m = n >> 1
        while m > 1:
            v = a.reshape(m, 2, gap)
            r = self.inv_root_powers[offset : offset + m].reshape(m, 1)
            x0 = v[:, 0, :] + v[:, 1, :]
            x1 = (v[:, 0, :] - v[:, 1, :]) * r
            a = np.stack([x0, x1], axis=1).reshape(n)
            offset += m
            gap <<= 1
            m >>= 1
        # final stage with scalar fused
        r = self.inv_root_powers[offset] * fix
        v = a.reshape(1, 2, gap)
        x0 = (v[:, 0, :] + v[:, 1, :]) * fix
        x1 = (v[:, 0, :] - v[:, 1, :]) * r
        return np.stack([x0, x1], axis=1).reshape(n)

    def _fft_to_rev(self, values: np.ndarray) -> np.ndarray:
        """Forward FFT: normal order -> bit-reversed."""
        n = self.n
        a = values.copy()
        m = 1
        gap = n >> 1
        while m < n:
            v = a.reshape(m, 2, gap)
            r = self.root_powers[m : 2 * m].reshape(m, 1)
            u = v[:, 0, :]
            w = v[:, 1, :] * r
            a = np.stack([u + w, u - w], axis=1).reshape(n)
            m <<= 1
            gap >>= 1
        return a

    # -- encode ------------------------------------------------------------
    def encode(self, values: Union[Sequence[complex], Sequence[float], complex, float, int], parms_id_or_scale=None, scale: float = None, parms_id: ParmsId = None) -> Plaintext:
        """Encode a vector of complex/real values (or a scalar broadcast).

        Accepts encode(values, scale) or encode(values, parms_id, scale).
        """
        if scale is None and isinstance(parms_id_or_scale, (int, float)) and parms_id is None:
            scale = float(parms_id_or_scale)
            parms_id = self.context.first_parms_id
        else:
            if parms_id_or_scale is not None and not isinstance(parms_id_or_scale, (int, float)):
                parms_id = tuple(parms_id_or_scale)
            if parms_id is None:
                parms_id = self.context.first_parms_id
            if scale is None:
                raise ValueError("scale must be given")

        if np.isscalar(values) or isinstance(values, (complex, float, int)):
            return self._encode_scalar(complex(values), parms_id, scale)
        return self._encode_vector(np.asarray(values, dtype=np.complex128), parms_id, scale)

    def _encode_vector(self, values: np.ndarray, parms_id: ParmsId, scale: float) -> Plaintext:
        cd = self.context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        if len(values) > self.slots:
            raise ValueError("values size is too large")
        if not np.isfinite(values).all():
            raise ValueError("values must be finite")
        if not (scale > 0 and math.floor(math.log2(scale)) < cd.total_coeff_modulus_bit_count):
            raise ValueError("scale out of bounds")

        n = self.n
        conj_values = np.zeros(n, dtype=np.complex128)
        conj_values[self.index_map[: len(values)]] = values
        conj_values[self.index_map[self.slots : self.slots + len(values)]] = np.conj(values)

        fix = scale / n
        if self._device_fft_enabled():
            # |coeff| <= scale * max|v| (the iFFT's fused 1/n cancels the
            # n-term sum), so when that bound clears both thresholds the
            # device path needs no max-coefficient fetch at all
            bound = scale * float(np.max(np.abs(conj_values)) if len(values) else 0.0) * 1.000001
            out = self._encode_vector_device(conj_values, fix, cd, parms_id, scale, bound)
            if out is not None:
                return out
            # fell through: coefficients beyond the df-exact integer range
            # (~2^46) — take the host wide tier below
        coeffs = self._fft_from_rev(conj_values, fix).real

        max_coeff = float(np.max(np.abs(coeffs))) if n else 0.0
        if not np.isfinite(max_coeff):
            raise ValueError("encoded values are too large")
        max_coeff_bits = max(int(math.ceil(math.log2(max(max_coeff, 1.0)))), 0) + 1
        if max_coeff_bits >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded values are too large")

        # Round half away from zero, exact integers via Python ints
        qv = cd.coeff_modulus_values
        k = len(qv)
        from .context import jit_cached

        if max_coeff_bits <= 52:
            # Fast path: coefficients fit a double exactly; vectorized numpy
            rns = np.zeros((k, n), dtype=np.uint64)
            neg = np.signbit(coeffs)
            absr = np.floor(np.abs(coeffs) + 0.5).astype(np.uint64)
            for j, q in enumerate(qv):
                red = absr % np.uint64(q)
                rns[j] = np.where(neg, (np.uint64(q) - red) % np.uint64(q), red)
            fwd = jit_cached(cd, ("ckks_encode_ntt", cd.parms_id),
                             lambda d: NTT.ntt_forward(d, cd.limb_tables()))
            ntt_data = fwd(U.from_np_u64(rns))
        else:
            # Wide tier (reference's 128-bit / multiprecision tiers,
            # ckks.h:593-667), vectorized: every |coeff| >= 2^52 double IS an
            # integer m * 2^e (53-bit significand); reduce m * 2^e mod q_j on
            # device as gather(2^e mod q_j) * m with Barrett.  Identical
            # values to the Python-int path, no per-coefficient loops.
            absc = np.abs(coeffs)
            neg = np.signbit(coeffs)
            small = absc < 9007199254740992.0  # 2^53
            rounded_small = np.floor(absc + 0.5)
            mant, exp = np.frexp(absc)
            m_wide = np.round(mant * 9007199254740992.0).astype(np.uint64)
            e_wide = (exp - 53).astype(np.int32)
            m_all = np.where(small, np.where(small, rounded_small, 0.0).astype(np.uint64), m_wide)
            e_all = np.where(small, np.int32(0), e_wide)

            max_e = int(e_all.max()) + 1
            pow2 = np.zeros((k, max_e), dtype=np.uint64)
            for j, q in enumerate(qv):
                p = 1
                for e in range(max_e):
                    pow2[j, e] = p
                    p = (p << 1) % q

            def builder(m_pair, e_arr, neg_arr):
                import jax.numpy as jnp
                from .ops.rns import _ratio

                t = cd.limb_tables()
                rlo, rhi = _ratio(qv)
                p_lo, p_hi = U.from_np_u64(pow2)
                pe = (p_lo[:, e_arr], p_hi[:, e_arr])  # (k, n) gathered 2^e mod q_j
                m_red = U.barrett_reduce_64((m_pair[0][None], m_pair[1][None]), t.q, rhi)
                r = U.mul_mod(m_red, pe, t.q, rlo, rhi)
                r_neg = U.neg_mod(r, t.q)
                out = (jnp.where(neg_arr[None], r_neg[0], r[0]),
                       jnp.where(neg_arr[None], r_neg[1], r[1]))
                return NTT.ntt_forward(out, t)

            fwd = jit_cached(cd, ("ckks_encode_wide_ntt", cd.parms_id, max_e), builder)
            ntt_data = fwd(U.from_np_u64(m_all), e_all, neg)
        p = Plaintext()
        p.parms_id = parms_id
        p.scale = scale
        p.rns_data = ntt_data
        p.coeff_data = np.zeros(0, dtype=np.uint64)
        return p

    def _encode_vector_device(self, conj_values, fix, cd, parms_id, scale, bound):
        """ONE-dispatch encode: device double-float inverse FFT (ops/
        slot_fft.py) + round-half-away + per-limb reduction + forward NTT.
        Only the (n,) complex input crosses the link; when the host-side
        coefficient bound already clears the validity and wide-tier
        thresholds the dispatch stays fully asynchronous (no fetch), else
        one scalar (the true max |coeff|) comes back for the exact checks.

        Returns None when max |coeff| exceeds the df-exact integer range —
        the caller then runs the host wide tier (ckks.h:593-667 analog).
        """
        import math as _math

        from .context import jit_cached
        from .ops import slot_fft as SF

        qv = cd.coeff_modulus_values
        stages = self._inv_stages()
        n = self.n

        def builder_fft(c4, fix_hi, fix_lo):
            re_h, re_l, _, _ = SF.fft_from_rev(c4, stages, (fix_hi, fix_lo), n)
            return re_h, re_l

        def builder_tail(re_h, re_l):
            rns, max_abs = SF.df_round_to_rns((re_h, re_l), qv, cd.limb_tables())
            ntt = NTT.ntt_forward(rns, cd.limb_tables())
            return ntt, max_abs

        c4 = tuple(np.ascontiguousarray(a) for a in SF.split_c128(conj_values))
        fix_hi = np.float32(fix)
        fix_lo = np.float32(fix - np.float64(fix_hi))
        if NTT._effective_platform() == "tpu":
            # fully fused: ONE dispatch (FFT + round + reduce + NTT)
            def builder(c4, fh, fl):
                return builder_tail(*builder_fft(c4, fh, fl))

            fn = jit_cached(cd, ("ckks_encode_devfft", cd.parms_id), builder)
            ntt_data, max_abs_dev = fn(c4, fix_hi, fix_lo)
        else:
            # materialize between the FFT and the NTT tail on CPU — same
            # XLA:CPU consumer-recompute fusion pathology as decode
            f1 = jit_cached(cd, ("ckks_encode_devfft_fft", cd.parms_id), builder_fft)
            f2 = jit_cached(cd, ("ckks_encode_devfft_tail", cd.parms_id), builder_tail)
            ntt_data, max_abs_dev = f2(*f1(c4, fix_hi, fix_lo))
        bound_bits = max(int(_math.ceil(_math.log2(max(bound, 1.0)))), 0) + 1
        if bound < 2.0 ** 46 and bound_bits < cd.total_coeff_modulus_bit_count:
            # bound clears both thresholds -> no device fetch, stay async
            pass
        else:
            max_coeff = float(max_abs_dev)
            if not np.isfinite(max_coeff):
                raise ValueError("encoded values are too large")
            max_coeff_bits = max(int(_math.ceil(_math.log2(max(max_coeff, 1.0)))), 0) + 1
            if max_coeff_bits >= cd.total_coeff_modulus_bit_count:
                raise ValueError("encoded values are too large")
            if max_coeff >= 2.0 ** 46:
                return None  # host wide tier preserves full precision
        p = Plaintext()
        p.parms_id = parms_id
        p.scale = scale
        p.rns_data = ntt_data
        p.coeff_data = np.zeros(0, dtype=np.uint64)
        return p

    def _encode_scalar(self, value: complex, parms_id: ParmsId, scale: float) -> Plaintext:
        """Scalar fast path: fills all slots without FFT (ckks.cpp:75-230).

        A real scalar v encodes as the constant polynomial round(v*scale);
        a complex scalar additionally gets an X^{n/2}-type imaginary part —
        here we use the generic vector path for complex values.
        """
        if value.imag != 0:
            return self._encode_vector(np.full(self.slots, value, dtype=np.complex128), parms_id, scale)
        cd = self.context.get_context_data(parms_id)
        if cd is None:
            raise ValueError("parms_id is not valid for encryption parameters")
        if not (scale > 0 and math.floor(math.log2(scale)) < cd.total_coeff_modulus_bit_count):
            raise ValueError("scale out of bounds")
        coeffd = value.real * scale
        if not math.isfinite(coeffd):
            raise ValueError("encoded value is too large")
        rounded = int(math.floor(abs(coeffd) + 0.5)) * (-1 if coeffd < 0 else 1)
        if abs(rounded).bit_length() + 1 >= cd.total_coeff_modulus_bit_count:
            raise ValueError("encoded value is too large")
        qv = cd.coeff_modulus_values
        n = self.n
        rns = np.zeros((len(qv), n), dtype=np.uint64)
        for j, q in enumerate(qv):
            rns[j, :] = rounded % q
        p = Plaintext()
        p.parms_id = parms_id
        p.scale = scale
        # constant polynomial: NTT of a constant is the constant everywhere
        p.rns_data = U.from_np_u64(rns)
        p.coeff_data = np.zeros(0, dtype=np.uint64)
        return p

    def encode_int(self, value: int, parms_id: ParmsId = None) -> Plaintext:
        """Exact int64 encode, scale = 1 (ckks.cpp:232-287)."""
        if parms_id is None:
            parms_id = self.context.first_parms_id
        cd = self.context.get_context_data(parms_id)
        qv = cd.coeff_modulus_values
        n = self.n
        rns = np.zeros((len(qv), n), dtype=np.uint64)
        for j, q in enumerate(qv):
            rns[j, :] = value % q
        p = Plaintext()
        p.parms_id = parms_id
        p.scale = 1.0
        p.rns_data = U.from_np_u64(rns)
        p.coeff_data = np.zeros(0, dtype=np.uint64)
        return p

    # -- decode ------------------------------------------------------------
    def decode(self, plain: Plaintext) -> np.ndarray:
        """NTT plaintext -> N/2 complex slot values (ckks.h:683-787)."""
        if not plain.is_ntt_form:
            raise ValueError("plain is not in NTT form")
        cd = self.context.get_context_data(plain.parms_id)
        if cd is None:
            raise ValueError("plain is not valid for encryption parameters")
        if not (plain.scale > 0 and math.floor(math.log2(plain.scale)) < cd.total_coeff_modulus_bit_count):
            raise ValueError("scale out of bounds")

        import os

        from .context import jit_cached

        if (
            self._device_fft_enabled()
            and os.environ.get("SEAL_TPU_DEVICE_COMPOSE", "1") not in ("", "0")
        ):
            # Fully-fused decode: iNTT + CRT compose + centered float +
            # 1/scale + forward slot FFT + slot gather in ONE dispatch
            # (double-float FFT, ops/slot_fft.py); the only fetch is the
            # (4, slots) f32 result — 8 B per slot value.
            from .ops import crt_compose as CC
            from .ops import slot_fft as SF

            stages = self._fwd_stages()
            n = self.n

            def builder_parts(d, inv_hi, inv_lo):
                from .ops.rns import _cshoup

                x = NTT.ntt_inverse(d, cd.limb_tables())
                op, qt = _cshoup(cd.base_q.inv_punctured, cd.coeff_modulus_values)
                scaled = U.mul_mod_shoup(x, op, qt, cd.limb_tables().q)
                mant, exp, neg = CC.centered_float_parts(scaled, cd.base_q)
                return SF.parts_to_df(mant, exp, neg, (inv_hi, inv_lo))

            def builder_fft(vh, vl):
                import jax.numpy as jnp

                z = jnp.zeros_like(vh)
                return jnp.stack(SF.fft_to_rev((vh, vl, z, z), stages, n))

            inv = 1.0 / plain.scale
            inv_hi = np.float32(inv)
            inv_lo = np.float32(inv - np.float64(inv_hi))
            if NTT._effective_platform() == "tpu":
                # fully fused: ONE dispatch, one (4, n) f32 fetch
                def builder_full(d, ih, il):
                    return builder_fft(*builder_parts(d, ih, il))

                fn = jit_cached(cd, ("ckks_decode_devfft", cd.parms_id), builder_full)
                packed = np.asarray(fn(plain.rns_data, inv_hi, inv_lo))
            else:
                # XLA:CPU's fusion re-computes the whole compose subgraph
                # inside every FFT butterfly consumer (exponential in the
                # stage count — an empirically-confirmed compiler
                # pathology), so the CPU path materializes the df values
                # between two executables.  TPU fuses the whole thing fine.
                f1 = jit_cached(cd, ("ckks_decode_devfft_parts", cd.parms_id), builder_parts)
                f2 = jit_cached(cd, ("ckks_decode_devfft_fft", cd.parms_id), builder_fft)
                packed = np.asarray(f2(*f1(plain.rns_data, inv_hi, inv_lo)))
            from .ops.slot_fft import combine_c128

            slots_out = combine_c128(packed[0], packed[1], packed[2], packed[3])
            return slots_out[self.index_map[: self.slots]]

        if os.environ.get("SEAL_TPU_DEVICE_COMPOSE", "1") not in ("", "0"):
            # Default path: iNTT + CRT scaling + compose + center + float
            # normalization in ONE device dispatch (ops/crt_compose.py);
            # only (mantissa, exponent, sign) — 13 B/coefficient — cross
            # the link.  Within an ulp or two of the reference's double
            # ladder (tolerance-bounded like all CKKS decode).
            from .ops import crt_compose as CC

            def builder_dev(d):
                import jax.numpy as jnp

                from .ops.rns import _cshoup

                x = NTT.ntt_inverse(d, cd.limb_tables())
                op, qt = _cshoup(cd.base_q.inv_punctured, cd.coeff_modulus_values)
                scaled = U.mul_mod_shoup(x, op, qt, cd.limb_tables().q)
                mant, exp, neg = CC.centered_float_parts(scaled, cd.base_q)
                # pack into one array: a single host fetch (the tunnel's
                # round-trip latency, not bandwidth, dominates small fetches)
                return jnp.stack(
                    [mant[0], mant[1], exp.astype(jnp.uint32), neg.astype(jnp.uint32)]
                )

            fn = jit_cached(cd, ("ckks_decode_parts", cd.parms_id), builder_dev)
            packed = np.asarray(fn(plain.rns_data))
            mant_np = packed[0].astype(np.uint64) | (packed[1].astype(np.uint64) << 32)
            res = CC.parts_to_float(
                mant_np, packed[2].astype(np.int32), packed[3] != 0, 1.0 / plain.scale
            )
        else:
            def builder(d):
                from .ops.rns import _cshoup

                x = NTT.ntt_inverse(d, cd.limb_tables())
                # fold the CRT scaling (* inv_punctured_i mod q_i) into the
                # device dispatch so the host compose is a plain word-matrix
                op, qt = _cshoup(cd.base_q.inv_punctured, cd.coeff_modulus_values)
                return U.mul_mod_shoup(x, op, qt, cd.limb_tables().q)

            intt_scaled = jit_cached(cd, ("ckks_decode_intt_scaled", cd.parms_id), builder)
            scaled = U.to_np_u64(intt_scaled(plain.rns_data))
            # exact vectorized CRT compose + centered double ladder —
            # bit-identical to the reference's multiprecision path
            # (ckks.h:683-787)
            res = cd.base_q.compose_scaled_centered_double(
                scaled, cd.upper_half_threshold, 1.0 / plain.scale
            )

        slots_out = self._fft_to_rev(res.astype(np.complex128))
        return slots_out[self.index_map[: self.slots]]
