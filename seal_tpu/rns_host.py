"""RNS base / base-converter / RNS-tool precompute (host, exact Python ints).

Host counterpart of the reference's ``util/rns.{h,cpp}`` (RNSBase compose /
decompose, BaseConverter matrices, the BEHZ RNSTool machinery).  All scalar
constants are exact Python ints computed here once per context level; device
bundles (uint32 word arrays) are derived lazily for the jnp/Pallas kernels in
``ops/rns.py``.

Key construction parity points (cf. ``rns.cpp:578-788``):
  * aux primes for B, m_sk, gamma: 61-bit primes from the deterministic
    descending ``get_primes(2n, 61, count)`` search; m_sk and gamma are the
    first two, B the rest — identical selection order.
  * B grows by one prime when ``32 + t.bits + log2(q) >= 61*(k+1)``.
  * m_tilde = 2^32.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from . import numth
from .modulus import Modulus, INTERNAL_MOD_BIT_COUNT
from .ntt_tables import HostNTTTables, build_limb_tables, LimbTables


def split_u64_array(values: Sequence[int], shape=None):
    """List of u64 ints -> (lo, hi) uint32 numpy arrays, default shape (k, 1)."""
    a = np.array([v & 0xFFFFFFFFFFFFFFFF for v in values], dtype=np.uint64)
    if shape is None:
        shape = (len(values), 1)
    a = a.reshape(shape)
    return (a & np.uint64(0xFFFFFFFF)).astype(np.uint32), (a >> np.uint64(32)).astype(np.uint32)


def shoup_pair(operand: int, q: int):
    """(operand, floor(operand << 64 / q)) — a MultiplyUIntModOperand."""
    return operand % q, ((operand % q) << 64) // q


class HostRNSBase:
    """CRT base with punctured products and their inverses (``RNSBase``)."""

    def __init__(self, moduli: Sequence[Modulus]):
        if not moduli:
            raise ValueError("rnsbase cannot be empty")
        vals = [m.value for m in moduli]
        for i, v in enumerate(vals):
            if v == 0:
                raise ValueError("rnsbase is invalid")
            for j in range(i):
                if numth.gcd(v, vals[j]) != 1:
                    raise ValueError("rnsbase is invalid (not coprime)")
        self.moduli = list(moduli)
        self.values = vals
        self.size = len(vals)
        self.base_prod = 1
        for v in vals:
            self.base_prod *= v
        self.punctured_prod = [self.base_prod // v for v in vals]
        self.inv_punctured = []
        for v, p in zip(vals, self.punctured_prod):
            ok, inv = numth.try_invert_mod(p % v, v)
            if not ok:
                raise ValueError("rnsbase is invalid (non-invertible)")
            self.inv_punctured.append(inv)

    def extend(self, modulus: Modulus) -> "HostRNSBase":
        return HostRNSBase(self.moduli + [modulus])

    def drop(self) -> "HostRNSBase":
        if self.size == 1:
            raise ValueError("cannot drop from base of size 1")
        return HostRNSBase(self.moduli[:-1])

    def decompose(self, value: int) -> List[int]:
        return [value % v for v in self.values]

    def compose(self, residues: Sequence[int]) -> int:
        acc = 0
        for r, inv, p, v in zip(residues, self.inv_punctured, self.punctured_prod, self.values):
            acc = (acc + (r * inv % v) * p) % self.base_prod
        return acc

    def decompose_array(self, values: np.ndarray) -> np.ndarray:
        """(n,) object/int array -> (k, n) uint64."""
        out = np.zeros((self.size, len(values)), dtype=np.uint64)
        for i, q in enumerate(self.values):
            out[i] = np.array([int(v) % q for v in values], dtype=np.uint64)
        return out

    def _punctured_words32(self) -> List[List[int]]:
        """Punctured products as little-endian 32-bit word lists (cached)."""
        cached = getattr(self, "_punct_w32", None)
        if cached is None:
            cached = []
            for p in self.punctured_prod:
                words = []
                while p:
                    words.append(p & 0xFFFFFFFF)
                    p >>= 32
                cached.append(words or [0])
            self._punct_w32 = cached
        return cached

    def compose_scaled_words(self, scaled: np.ndarray) -> np.ndarray:
        """Exact vectorized CRT compose from pre-scaled residues.

        ``scaled``: (k, n) uint64 with scaled[i] = residue_i * inv_punctured_i
        mod q_i.  Returns (W, n) uint64 holding little-endian 32-bit words of
        v = sum_i scaled_i * punctured_i mod base_prod, in [0, base_prod).
        All arithmetic is numpy uint64 on 32-bit payloads (exact); the only
        Python-level loops are over limbs and words, never coefficients.
        """
        k, n = scaled.shape
        mask = np.uint64(0xFFFFFFFF)
        W = (self.base_prod.bit_length() + 31) // 32
        acc = np.zeros((W + 3, n), dtype=np.uint64)

        # Plane-fused accumulation as ONE f64 matmul (multithreaded BLAS):
        # B[s, (i, a)] = 16-bit digit (s - a) of punctured_prod_i, C[(i, a), n]
        # = 16-bit digits of scaled_i.  Each plane sum is < 4k * 2^32 < 2^40,
        # exact in f64; ~20x faster than the per-(limb, word) uint64 ladder
        # at 32768 (the reference's compose is the O(k^2) scalar path,
        # rns.cpp compose_array).
        B = getattr(self, "_compose_digit_matrix", None)
        if B is None:
            wd = (self.base_prod.bit_length() + 15) // 16
            sp = wd + 4
            B = np.zeros((sp, k * 4), dtype=np.float64)
            for i, p in enumerate(self.punctured_prod):
                for a in range(4):
                    for s in range(a, min(a + wd, sp)):
                        B[s, i * 4 + a] = float((p >> (16 * (s - a))) & 0xFFFF)
            self._compose_digit_matrix = B
        sp = B.shape[0]
        C = np.empty((k * 4, n), dtype=np.float64)
        for a in range(4):
            C[a::4] = ((scaled >> np.uint64(16 * a)) & np.uint64(0xFFFF)).astype(
                np.float64
            )
        planes = (B @ C).astype(np.uint64)  # (sp, n), each < 2^40: exact
        # each acc word receives one even plane (< 2^40) and one odd plane
        # shifted by 16 (< 2^56): sums stay far below 2^64 before normalize
        for s in range(sp):
            w = s >> 1
            if w >= acc.shape[0]:
                break
            acc[w] += planes[s] << np.uint64(16 * (s & 1))
        self._mw_normalize(acc)

        # v < k * base_prod: estimate the multiple in float64 from the top
        # words (error << 1), subtract, then at most two exact fix-ups
        qw = []
        p = self.base_prod
        while p:
            qw.append(p & 0xFFFFFFFF)
            p >>= 32
        # estimate from the top ~10 words only, in units of 2^(32*base), so
        # the floats stay finite for arbitrarily wide bases (k up to 64)
        base = max(0, len(acc) - 10)
        v_f = np.zeros(n, dtype=np.float64)
        for w in range(base, len(acc)):
            v_f += acc[w].astype(np.float64) * float(1 << (32 * (w - base)))
        q_scaled = float(self.base_prod >> (32 * base)) if base else float(self.base_prod)
        m = np.floor(v_f / q_scaled)
        m = np.maximum(m - 1.0, 0.0).astype(np.uint64)
        if m.any():
            sub = self._mw_scalar_mul(m, qw, len(acc), n)
            acc, _ = self._mw_sub(acc, sub)
        qw_arr = np.zeros((len(acc), n), dtype=np.uint64)
        for w, q in enumerate(qw):
            qw_arr[w] = np.uint64(q)
        for _ in range(3):
            diff, borrow = self._mw_sub(acc, qw_arr)
            take = borrow == 0
            if not take.any():
                break
            for w in range(len(acc)):
                acc[w] = np.where(take, diff[w], acc[w])
        return acc[:W]

    @staticmethod
    def _mw_normalize(acc: np.ndarray) -> None:
        mask = np.uint64(0xFFFFFFFF)
        for w in range(len(acc) - 1):
            acc[w + 1] += acc[w] >> np.uint64(32)
            acc[w] &= mask

    @staticmethod
    def _mw_scalar_mul(m: np.ndarray, q_words: List[int], W: int, n: int) -> np.ndarray:
        """(n,) small scalar vector times multiword constant -> (W, n)."""
        out = np.zeros((W, n), dtype=np.uint64)
        carry = np.zeros(n, dtype=np.uint64)
        mask = np.uint64(0xFFFFFFFF)
        for w, qword in enumerate(q_words):
            t = m * np.uint64(qword) + carry
            out[w] = t & mask
            carry = t >> np.uint64(32)
        if len(q_words) < W:
            out[len(q_words)] = carry
        return out

    @staticmethod
    def _mw_sub(a: np.ndarray, b: np.ndarray):
        """Multiword subtract (32-bit payloads): returns (diff, borrow)."""
        mask = np.uint64(0xFFFFFFFF)
        diff = np.zeros_like(a)
        borrow = np.zeros(a.shape[1], dtype=np.uint64)
        for w in range(len(a)):
            bw = b[w] if w < len(b) else np.uint64(0)
            t = a[w] - bw - borrow
            diff[w] = t & mask
            borrow = (t >> np.uint64(32)) & np.uint64(1)
        return diff, borrow

    def compose_scaled_centered_double(
        self, scaled: np.ndarray, upper_half_threshold: int, inv_scale: float
    ) -> np.ndarray:
        """Centered lift of the composed value to float64 * inv_scale.

        Bit-identical to the reference's per-64-bit-word double ladder
        (``ckks.h:746-781``): same word order, same rounding sequence.
        """
        words = self.compose_scaled_words(scaled)
        W, n = words.shape
        uh = []
        p = upper_half_threshold
        while p:
            uh.append(p & 0xFFFFFFFF)
            p >>= 32
        uh_arr = np.zeros((W, n), dtype=np.uint64)
        for w, u in enumerate(uh):
            uh_arr[w] = np.uint64(u)
        _, borrow = self._mw_sub(words, uh_arr)
        is_upper = borrow == 0  # v >= (q+1)/2  ->  centered value is negative
        qw_arr = np.zeros((W, n), dtype=np.uint64)
        p = self.base_prod
        w = 0
        while p:
            qw_arr[w] = np.uint64(p & 0xFFFFFFFF)
            p >>= 32
            w += 1
        q_minus_v, _ = self._mw_sub(qw_arr, words)
        mag = np.where(is_upper[None, :], q_minus_v, words)

        # reference semantics: the ladder runs only while words remain
        # (``while c:``) — a suffix-nonzero mask reproduces that exactly and
        # keeps 0 * inf out of lanes whose value has already been consumed
        nz = mag != 0
        suffix_nz = np.flip(np.logical_or.accumulate(np.flip(nz, axis=0), axis=0), axis=0)
        res = np.zeros(n, dtype=np.float64)
        scale_ladder = float(inv_scale)
        with np.errstate(invalid="ignore", over="ignore"):
            for w64 in range(0, W, 2):
                f = mag[w64].astype(np.float64)
                live = suffix_nz[w64]
                if w64 + 1 < W:
                    f = f + mag[w64 + 1].astype(np.float64) * 4294967296.0
                    live = np.logical_or(live, suffix_nz[w64 + 1])
                res += np.where(live, f * scale_ladder, 0.0)
                scale_ladder *= 18446744073709551616.0
        return np.where(is_upper, -res, res)

    def compose_array(self, residues: np.ndarray) -> List[int]:
        """(k, n) -> list of n Python ints in [0, base_prod).

        Vectorized over numpy object arrays: value = sum_i r_i * C_i mod Q
        with C_i = ((Q/q_i)^-1 mod q_i) * (Q/q_i) precomputed.
        """
        k, n = residues.shape
        if k == 1:
            return [int(v) for v in residues[0]]
        consts = [
            (self.inv_punctured[i] * self.punctured_prod[i]) % self.base_prod
            for i in range(k)
        ]
        total = np.zeros(n, dtype=object)
        for i in range(k):
            total += residues[i].astype(object) * consts[i]
        Q = self.base_prod
        return [int(v) % Q for v in total]


class HostBaseConverter:
    """Fast base conversion q -> p via cached change matrix (``BaseConverter``).

    ``prescale`` (per-input-limb ints) folds an extra factor into the
    inv-punctured pre-multiplication, so e.g. the BEHZ ``x m_tilde`` step
    (rns.cpp:1086) costs nothing extra: the FBC's one Shoup multiply uses
    the combined constant ``prescale_i * (q/q_i)^-1 mod q_i``.
    """

    def __init__(self, ibase: HostRNSBase, obase: HostRNSBase, prescale=None):
        self.ibase = ibase
        self.obase = obase
        self.prescale = list(prescale) if prescale is not None else None
        # matrix[j][i] = punctured_prod_i mod p_j
        self.matrix = [
            [p % oj for p in ibase.punctured_prod] for oj in obase.values
        ]
        self._dev = None

    def device(self):
        """Device bundle: dict of uint32 arrays (built lazily, cached)."""
        if self._dev is None:
            ib, ob = self.ibase, self.obase
            inv_op, inv_qt = [], []
            pres = self.prescale or [1] * ib.size
            for inv, q, pre in zip(ib.inv_punctured, ib.values, pres):
                o, s = shoup_pair(inv * (pre % q) % q, q)
                inv_op.append(o)
                inv_qt.append(s)
            mat_flat = [self.matrix[j][i] for j in range(ob.size) for i in range(ib.size)]
            d = {}
            d["inv_punct_op"] = split_u64_array(inv_op)
            d["inv_punct_qt"] = split_u64_array(inv_qt)
            d["matrix"] = split_u64_array(mat_flat, (ob.size, ib.size))
            d["iq"] = split_u64_array(ib.values)
            d["oq"] = split_u64_array(ob.values)
            oratio = [(1 << 128) // v for v in ob.values]
            d["oratio_lo"] = split_u64_array([r & ((1 << 64) - 1) for r in oratio])
            d["oratio_hi"] = split_u64_array([r >> 64 for r in oratio])
            # For exact_convert: fixed-point 2^-128 reciprocal fractions of ibase
            iratio = [(1 << 128) // v for v in ib.values]
            d["iratio_lo"] = split_u64_array([r & ((1 << 64) - 1) for r in iratio])
            d["iratio_hi"] = split_u64_array([r >> 64 for r in iratio])
            d["q_mod_obase0"] = ib.base_prod % ob.values[0]
            self._dev = d
        return self._dev


class HostRNSTool:
    """Per-level BEHZ machinery + mod-switch constants (``RNSTool``)."""

    def __init__(self, poly_modulus_degree: int, base_q: HostRNSBase, plain_modulus: Modulus):
        n = poly_modulus_degree
        logn = n.bit_length() - 1
        if (1 << logn) != n:
            raise ValueError("poly_modulus_degree must be a power of 2")
        self.n = n
        self.t = plain_modulus
        self.base_q = base_q
        k = base_q.size

        total_bits = base_q.base_prod.bit_length()
        base_B_size = k
        if 32 + self.t.bit_count + total_bits >= INTERNAL_MOD_BIT_COUNT * k + INTERNAL_MOD_BIT_COUNT:
            base_B_size += 1

        count = base_B_size + 2  # B plus m_sk, gamma
        # 60-bit internal primes share the user-modulus bit range (the
        # reference reserves 61-bit, defines.h:37; here 60-bit keeps Bsk
        # NTTs under the stage-B digit-plane bound, see modulus.py) — so
        # skip any prime already used by base_q or equal to t to preserve
        # coprimality of the extended base.
        used = set(base_q.values) | {self.t.value}
        fetch = count
        while True:
            cands = [p for p in numth.get_primes(2 * n, INTERNAL_MOD_BIT_COUNT, fetch)
                     if p not in used]
            if len(cands) >= count:
                primes = cands[:count]
                break
            fetch += count + len(used)
        self.m_sk = Modulus(primes[0])
        self.gamma = Modulus(primes[1])
        base_B_primes = [Modulus(p) for p in primes[2:]]
        self.m_tilde = Modulus(1 << 32)

        self.base_B = HostRNSBase(base_B_primes)
        self.base_Bsk = self.base_B.extend(self.m_sk)
        self.base_Bsk_m_tilde = self.base_Bsk.extend(self.m_tilde)
        self.base_t_gamma: Optional[HostRNSBase] = None
        if not self.t.is_zero:
            self.base_t_gamma = HostRNSBase([self.t, self.gamma])

        self._logn = logn
        self._base_Bsk_ntt = None

        # Base converters
        self.conv_q_to_Bsk = HostBaseConverter(base_q, self.base_Bsk)
        self.conv_q_to_m_tilde = HostBaseConverter(base_q, HostRNSBase([self.m_tilde]))
        # merged + m_tilde-prescaled converter: fastbconv_m_tilde in ONE
        # Shoup multiply + ONE contraction (rns.cpp:1086 folds the x m_tilde
        # and both conversions)
        self.conv_q_to_Bsk_m_tilde_scaled = HostBaseConverter(
            base_q, self.base_Bsk_m_tilde, prescale=[self.m_tilde.value] * k
        )
        self.conv_B_to_q = HostBaseConverter(self.base_B, base_q)
        self.conv_B_to_m_sk = HostBaseConverter(self.base_B, HostRNSBase([self.m_sk]))
        # merged converter: fastbconv_sk's two conversions (B->q and
        # B->m_sk, rns.cpp:903-978) share their input scaling and run as
        # one contraction to q U {m_sk}
        self.conv_B_to_q_m_sk = HostBaseConverter(
            self.base_B, HostRNSBase(list(base_q.moduli) + [self.m_sk])
        )
        self.conv_q_to_t_gamma = None
        self.conv_q_to_t = None
        if self.base_t_gamma is not None:
            self.conv_q_to_t_gamma = HostBaseConverter(base_q, self.base_t_gamma)
            self.conv_q_to_t = HostBaseConverter(base_q, HostRNSBase([self.t]))

        q_prod = base_q.base_prod
        B_prod = self.base_B.base_prod
        # prod(B) mod q_i
        self.prod_B_mod_q = [B_prod % v for v in base_q.values]
        # prod(q)^-1 mod Bsk
        self.inv_prod_q_mod_Bsk = [numth.invert_mod(q_prod % v, v) for v in self.base_Bsk.values]
        # prod(B)^-1 mod m_sk
        self.inv_prod_B_mod_m_sk = numth.invert_mod(B_prod % self.m_sk.value, self.m_sk.value)
        # m_tilde^-1 mod Bsk
        self.inv_m_tilde_mod_Bsk = [
            numth.invert_mod(self.m_tilde.value % v, v) for v in self.base_Bsk.values
        ]
        # -prod(q)^-1 mod m_tilde
        mt = self.m_tilde.value
        self.neg_inv_prod_q_mod_m_tilde = (-numth.invert_mod(q_prod % mt, mt)) % mt
        # prod(q) mod Bsk
        self.prod_q_mod_Bsk = [q_prod % v for v in self.base_Bsk.values]

        if self.base_t_gamma is not None:
            tv, gv = self.t.value, self.gamma.value
            self.inv_gamma_mod_t = numth.invert_mod(gv % tv, tv)
            self.prod_t_gamma_mod_q = [tv * gv % v for v in base_q.values]
            self.neg_inv_q_mod_t_gamma = [
                (-numth.invert_mod(q_prod % v, v)) % v for v in (tv, gv)
            ]

        # q_last^{-1} mod q_i (mod switch / rescale)
        q_last = base_q.values[-1]
        self.inv_q_last_mod_q = [numth.invert_mod(q_last, v) for v in base_q.values[:-1]] if k > 1 else []
        if not self.t.is_zero:
            self.inv_q_last_mod_t = numth.invert_mod(q_last, self.t.value)
            self.q_last_mod_t = q_last % self.t.value
        self._dev = None

    @property
    def base_Bsk_ntt(self):
        """NTT tables over Bsk (BEHZ dyadic stage), built lazily and shared."""
        if self._base_Bsk_ntt is None:
            from .ntt_tables import cached_host_ntt_tables

            self._base_Bsk_ntt = [cached_host_ntt_tables(self._logn, m) for m in self.base_Bsk.moduli]
        return self._base_Bsk_ntt

    def device(self):
        """Lazily-built device constant dict for this tool."""
        if self._dev is None:
            def pairs(vals, qs):
                ops, qts = [], []
                for v, q in zip(vals, qs):
                    o, s = shoup_pair(v, q)
                    ops.append(o)
                    qts.append(s)
                return (
                    split_u64_array(ops),
                    split_u64_array(qts),
                )

            d = {}
            qv = self.base_q.values
            bskv = self.base_Bsk.values
            d["inv_prod_q_mod_Bsk"] = pairs(self.inv_prod_q_mod_Bsk, bskv)
            d["prod_q_mod_Bsk"] = split_u64_array(self.prod_q_mod_Bsk)
            d["inv_m_tilde_mod_Bsk"] = pairs(self.inv_m_tilde_mod_Bsk, bskv)
            d["prod_B_mod_q"] = split_u64_array(self.prod_B_mod_q)
            d["neg_prod_B_mod_q"] = pairs([(q - p) % q for p, q in zip(self.prod_B_mod_q, qv)], qv)
            d["prod_B_mod_q_shoup"] = pairs(self.prod_B_mod_q, qv)
            msk = self.m_sk.value
            d["inv_prod_B_mod_m_sk"] = pairs([self.inv_prod_B_mod_m_sk], [msk])
            d["neg_inv_prod_q_mod_m_tilde"] = pairs([self.neg_inv_prod_q_mod_m_tilde], [self.m_tilde.value])
            if self.inv_q_last_mod_q:
                d["inv_q_last_mod_q"] = pairs(self.inv_q_last_mod_q, qv[:-1])
            if self.base_t_gamma is not None:
                tv, gv = self.t.value, self.gamma.value
                d["prod_t_gamma_mod_q"] = pairs(self.prod_t_gamma_mod_q, qv)
                d["neg_inv_q_mod_t_gamma"] = pairs(self.neg_inv_q_mod_t_gamma, [tv, gv])
                d["inv_gamma_mod_t"] = pairs([self.inv_gamma_mod_t], [tv])
            self._dev = d
        return self._dev
