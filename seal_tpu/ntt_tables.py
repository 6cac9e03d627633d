"""Negacyclic NTT table generation (host) and device-constant bundles.

Host counterpart of the reference's ``NTTTables`` (``util/ntt.cpp:241-300``):
powers of the minimal primitive 2n-th root psi stored so that each butterfly
stage reads a *contiguous* slice —

  * forward table: slot ``j`` holds ``psi^bitrev(j, log_n)``; stage ``s``
    (with ``m = 2^s`` blocks) reads slots ``[m, 2m)``.
  * inverse table: slot ``bitrev(i-1, log_n) + 1`` holds ``psi^-i``; stages
    read slots sequentially from 1 (sizes n/2, n/4, ..., 1), with ``1/n``
    fused into the last stage (Longa–Naehrig style, cf. ``dwthandler.h``).

Each twiddle carries a Shoup quotient ``floor(w << 64 / q)`` for the lazy
multiply.  All tables are exact Python ints here; ``LimbTables`` packs them
into uint32 device arrays for a whole RNS modulus vector so one traced kernel
transforms every limb.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple, Sequence

import numpy as np

from . import numth
from .modulus import Modulus


_HOST_NTT_CACHE = {}


def cached_host_ntt_tables(log_n: int, modulus: "Modulus") -> "HostNTTTables":
    """Shared cache: tables depend only on (log_n, q), reused across levels."""
    key = (log_n, modulus.value)
    if key not in _HOST_NTT_CACHE:
        _HOST_NTT_CACHE[key] = HostNTTTables(log_n, modulus)
    return _HOST_NTT_CACHE[key]


class HostNTTTables:
    """Exact-integer NTT tables for one (log_n, q) pair."""

    def __init__(self, log_n: int, modulus: Modulus):
        if not (0 <= log_n <= 17):
            raise ValueError("log_n out of range")
        self.log_n = log_n
        self.n = 1 << log_n
        self.modulus = modulus
        q = modulus.value
        self.root = numth.minimal_primitive_root(2 * self.n, q)
        self.inv_root = numth.invert_mod(self.root, q)

        n, psi, ipsi = self.n, self.root, self.inv_root
        # Forward: root_powers[bitrev(i)] = psi^i
        fwd = [1] * n
        power = psi
        for i in range(1, n):
            fwd[numth.reverse_bits(i, log_n)] = power
            power = power * psi % q
        self.root_powers = fwd
        # Inverse (scrambled): inv_root_powers[bitrev(i-1)+1] = ipsi^i
        inv = [1] * n
        power = ipsi
        for i in range(1, n):
            inv[numth.reverse_bits(i - 1, log_n) + 1] = power
            power = power * ipsi % q
        self.inv_root_powers = inv
        self.inv_degree = numth.invert_mod(n, q)
        # Last inverse stage fuses 1/n: the y-output root is scaled by 1/n.
        self.scaled_last_inv_root = self.inv_root_powers[n - 1] * self.inv_degree % q if n > 1 else self.inv_degree


def _shoup(operand: int, q: int) -> int:
    return (operand << 64) // q


_HOST_C_NTT_CACHE: dict = {}


def host_c_ntt_tables(log_n: int, modulus: Modulus) -> dict:
    """Numpy (op, qt) twiddle arrays + fused-inverse constants for the
    native C host NTT (native/ntt_mod.c); cached per (log_n, q)."""
    key = (log_n, modulus.value)
    t = _HOST_C_NTT_CACHE.get(key)
    if t is None:
        tab = cached_host_ntt_tables(log_n, modulus)
        q = modulus.value
        mask = (1 << 64) - 1

        def pair(vals):
            return (
                np.array(vals, dtype=np.uint64),
                np.array([_shoup(w, q) & mask for w in vals], dtype=np.uint64),
            )

        fwd_op, fwd_qt = pair(tab.root_powers)
        inv_op, inv_qt = pair(tab.inv_root_powers)
        t = {
            "q": q,
            "fwd_op": fwd_op, "fwd_qt": fwd_qt,
            "inv_op": inv_op, "inv_qt": inv_qt,
            "invn_op": tab.inv_degree,
            "invn_qt": _shoup(tab.inv_degree, q) & mask,
            "last_op": tab.scaled_last_inv_root,
            "last_qt": _shoup(tab.scaled_last_inv_root, q) & mask,
        }
        _HOST_C_NTT_CACHE[key] = t
    return t


def _split_words(values, dtype=np.uint32):
    a = np.asarray(values, dtype=np.uint64)
    return (a & np.uint64(0xFFFFFFFF)).astype(dtype), (a >> np.uint64(32)).astype(dtype)


class LimbTables(NamedTuple):
    """Device-resident NTT + modulus constants for a vector of k moduli.

    All arrays uint32.  Twiddle tables have shape (k, n) split into lo/hi
    words for operand and Shoup quotient; scalar per-limb constants have
    shape (k, 1) so they broadcast over the coefficient axis.
    """

    fwd_op_lo: np.ndarray
    fwd_op_hi: np.ndarray
    fwd_qt_lo: np.ndarray
    fwd_qt_hi: np.ndarray
    inv_op_lo: np.ndarray
    inv_op_hi: np.ndarray
    inv_qt_lo: np.ndarray
    inv_qt_hi: np.ndarray
    # inv_degree (1/n) and the last-stage scaled root, per limb: (k, 1)
    invn_op_lo: np.ndarray
    invn_op_hi: np.ndarray
    invn_qt_lo: np.ndarray
    invn_qt_hi: np.ndarray
    invn_last_op_lo: np.ndarray
    invn_last_op_hi: np.ndarray
    invn_last_qt_lo: np.ndarray
    invn_last_qt_hi: np.ndarray
    # modulus constants: (k, 1)
    q_lo: np.ndarray
    q_hi: np.ndarray
    two_q_lo: np.ndarray
    two_q_hi: np.ndarray
    ratio_lo_lo: np.ndarray  # floor(2^128/q) low u64, low/high u32 words
    ratio_lo_hi: np.ndarray
    ratio_hi_lo: np.ndarray  # floor(2^128/q) high u64
    ratio_hi_hi: np.ndarray
    # metadata enabling the four-step MXU kernel to rebuild its matrices
    # for any limb subset (ops/ntt.py dispatch); () disables the MXU path
    log_n: int = 0
    moduli_values: tuple = ()
    # per-limb scalar folded into the inverse transform's 1/n constants
    # (e.g. the BEHZ x t pass); () means unscaled
    inv_scale: tuple = ()

    N_ARRAY_FIELDS = 24  # fields before the metadata tail

    @property
    def q(self):
        return self.q_lo, self.q_hi

    @property
    def two_q(self):
        return self.two_q_lo, self.two_q_hi

    @property
    def ratio_lo(self):
        return self.ratio_lo_lo, self.ratio_lo_hi

    @property
    def ratio_hi(self):
        return self.ratio_hi_lo, self.ratio_hi_hi


class DenseStageTables(NamedTuple):
    """Per-stage dense twiddle layout for the fused Pallas NTT kernel.

    ``fwd_*``/``inv_*`` have shape (k, log_n, n): stage s, coefficient j
    holds the twiddle of j's butterfly block, so a lane-aligned kernel can
    multiply without gathers.  The last inverse stage fuses 1/n: its lo
    slots hold n^-1 and hi slots hold (last root * n^-1).
    """

    fwd_op_lo: np.ndarray
    fwd_op_hi: np.ndarray
    fwd_qt_lo: np.ndarray
    fwd_qt_hi: np.ndarray
    inv_op_lo: np.ndarray
    inv_op_hi: np.ndarray
    inv_qt_lo: np.ndarray
    inv_qt_hi: np.ndarray
    q_lo: np.ndarray       # (k, 1)
    q_hi: np.ndarray
    two_q_lo: np.ndarray
    two_q_hi: np.ndarray


def build_dense_stage_tables(log_n: int, moduli: Sequence[Modulus], host_tables=None) -> DenseStageTables:
    if host_tables is None:
        host_tables = [cached_host_ntt_tables(log_n, m) for m in moduli]
    n = 1 << log_n
    k = len(moduli)
    S = log_n
    fwd = np.zeros((k, S, n), dtype=np.uint64)
    fwd_qt = np.zeros((k, S, n), dtype=np.uint64)
    inv = np.zeros((k, S, n), dtype=np.uint64)
    inv_qt = np.zeros((k, S, n), dtype=np.uint64)
    j = np.arange(n)
    for ki, (mod, tab) in enumerate(zip(moduli, host_tables)):
        q = mod.value
        rp = np.array(tab.root_powers, dtype=np.uint64)
        ip = np.array(tab.inv_root_powers, dtype=np.uint64)
        # Shoup quotients computed once per distinct root, then broadcast
        rp_qt = np.array([((int(w) << 64) // q) & 0xFFFFFFFFFFFFFFFF for w in tab.root_powers], dtype=np.uint64)
        ip_qt = np.array([((int(w) << 64) // q) & 0xFFFFFFFFFFFFFFFF for w in tab.inv_root_powers], dtype=np.uint64)
        for s in range(S):
            m = 1 << s
            block = j >> (log_n - s)          # forward stage s block index
            fwd[ki, s] = rp[m + block]
            fwd_qt[ki, s] = rp_qt[m + block]
        # inverse stages: stage s has m = n >> (s+1) blocks of size 2^(s+1)
        offset = 1
        for s in range(S):
            m = n >> (s + 1)
            block = j >> (s + 1)
            if m > 1:
                inv[ki, s] = ip[offset + block]
                inv_qt[ki, s] = ip_qt[offset + block]
            else:
                # last stage: fuse n^-1 (lo half) and scaled last root (hi half)
                lo_val, hi_val = tab.inv_degree, tab.scaled_last_inv_root
                lo_qt = ((lo_val << 64) // q) & 0xFFFFFFFFFFFFFFFF
                hi_qt = ((hi_val << 64) // q) & 0xFFFFFFFFFFFFFFFF
                half = j < (n >> 1)
                inv[ki, s] = np.where(half, np.uint64(lo_val), np.uint64(hi_val))
                inv_qt[ki, s] = np.where(half, np.uint64(lo_qt), np.uint64(hi_qt))
            offset += m

    qv = np.array([[m.value] for m in moduli], dtype=np.uint64)
    parts = []
    for arr in (fwd, fwd_qt, inv, inv_qt, qv, qv * np.uint64(2)):
        parts.extend(_split_words(arr))
    (fol, foh, fql, fqh, iol, ioh, iql, iqh, q_lo, q_hi, tq_lo, tq_hi) = parts
    return DenseStageTables(fol, foh, fql, fqh, iol, ioh, iql, iqh, q_lo, q_hi, tq_lo, tq_hi)


def build_limb_tables(
    log_n: int,
    moduli: Sequence[Modulus],
    host_tables: "Sequence[HostNTTTables] | None" = None,
    inv_scale: "Sequence[int] | None" = None,
) -> LimbTables:
    """Build the packed device bundle for a modulus vector.

    ``inv_scale`` (per-limb ints) folds an extra scalar into the inverse
    transform's fused 1/n stage, so iNTT(x)·s costs the same as iNTT(x) —
    used by the BEHZ x t pass (evaluator.cpp:549) and decrypt tails.
    """
    if host_tables is None:
        host_tables = [HostNTTTables(log_n, m) for m in moduli]
    n = 1 << log_n
    k = len(moduli)
    if inv_scale is None:
        inv_scale = [1] * k

    fwd_op = np.zeros((k, n), dtype=np.uint64)
    fwd_qt = np.zeros((k, n), dtype=np.uint64)
    inv_op = np.zeros((k, n), dtype=np.uint64)
    inv_qt = np.zeros((k, n), dtype=np.uint64)
    invn = np.zeros((k, 1), dtype=np.uint64)
    invn_qt = np.zeros((k, 1), dtype=np.uint64)
    last = np.zeros((k, 1), dtype=np.uint64)
    last_qt = np.zeros((k, 1), dtype=np.uint64)
    for i, (mod, tab) in enumerate(zip(moduli, host_tables)):
        q = mod.value
        fwd_op[i] = tab.root_powers
        fwd_qt[i] = [_shoup(w, q) & 0xFFFFFFFFFFFFFFFF for w in tab.root_powers]
        inv_op[i] = tab.inv_root_powers
        inv_qt[i] = [_shoup(w, q) & 0xFFFFFFFFFFFFFFFF for w in tab.inv_root_powers]
        s = inv_scale[i] % q
        invn[i, 0] = tab.inv_degree * s % q
        invn_qt[i, 0] = _shoup(tab.inv_degree * s % q, q) & 0xFFFFFFFFFFFFFFFF
        last[i, 0] = tab.scaled_last_inv_root * s % q
        last_qt[i, 0] = _shoup(tab.scaled_last_inv_root * s % q, q) & 0xFFFFFFFFFFFFFFFF

    qv = np.array([[m.value] for m in moduli], dtype=np.uint64)
    two_q = qv * np.uint64(2)
    ratio = [(1 << 128) // m.value for m in moduli]
    ratio_lo = np.array([[r & 0xFFFFFFFFFFFFFFFF] for r in ratio], dtype=np.uint64)
    ratio_hi = np.array([[(r >> 64) & 0xFFFFFFFFFFFFFFFF] for r in ratio], dtype=np.uint64)

    parts = []
    for arr in (fwd_op, fwd_qt, inv_op, inv_qt, invn, invn_qt, last, last_qt, qv, two_q):
        parts.extend(_split_words(arr))
    # ratio words: lo u64 then hi u64, each split
    parts.extend(_split_words(ratio_lo))
    parts.extend(_split_words(ratio_hi))
    # Reorder to match LimbTables field order:
    (fol, foh, fql, fqh, iol, ioh, iql, iqh, nl, nh, nql, nqh, ll, lh, lql, lqh,
     q_lo, q_hi, tq_lo, tq_hi, rll, rlh, rhl, rhh) = parts
    return LimbTables(
        fol, foh, fql, fqh, iol, ioh, iql, iqh,
        nl, nh, nql, nqh, ll, lh, lql, lqh,
        q_lo, q_hi, tq_lo, tq_hi, rll, rlh, rhl, rhh,
        log_n=log_n, moduli_values=tuple(m.value for m in moduli),
        inv_scale=tuple(int(s) for s in inv_scale),
    )


# ---------------------------------------------------------------------------
# Four-step (MXU) NTT tables
# ---------------------------------------------------------------------------

class MXUTables(NamedTuple):
    """Constant bundle for the four-step matmul NTT (``ops/mxu_ntt.py``).

    The negacyclic length-n transform factors as
    ``n1-point negacyclic NTT (matmul over the strided axis)`` →
    ``per-element twiddle α_{t1}^c`` → ``n2-point cyclic DFT (matmul)``,
    with all three factors exact mod q and the composite bit-identical to
    the reference's Harvey natural→bit-reversed form
    (``util/dwthandler.h:94-191``).  The two small dense matrices run on the
    MXU as int8 digit-plane contractions accumulated in int32.

    Matrix planes are int8 arrays of 7-bit digits, little-endian:
    ``value = Σ_p plane[p] * 2^(7p)``.
    """

    n1: int
    n2: int
    nplanes: int            # digit planes per operand (= ceil(max_q_bits / 7))
    kchunk_a: int           # contraction chunk (overflow guard), stage A (K = n1)
    kchunk_b: int           # stage B (K = n2)
    # forward matrices: W[k, t1, r], F[k, t2, c]
    w_planes: np.ndarray    # int8 (P, k, n1, n1)
    f_planes: np.ndarray    # int8 (P, k, n2, n2)
    # inverse matrices: Winv[k, r, t1] (1/n1 folded), Finv[k, c, t2] (1/n2 folded)
    winv_planes: np.ndarray
    finv_planes: np.ndarray
    # twiddles T[k, t1, c] = α_{t1}^c (and inverse), Shoup pairs
    t_op_lo: np.ndarray
    t_op_hi: np.ndarray
    t_qt_lo: np.ndarray
    t_qt_hi: np.ndarray
    ti_op_lo: np.ndarray
    ti_op_hi: np.ndarray
    ti_qt_lo: np.ndarray
    ti_qt_hi: np.ndarray
    # modulus constants, shape (k, 1, 1) for broadcasting over (n1, n2)
    q_lo: np.ndarray
    q_hi: np.ndarray
    two_q_lo: np.ndarray
    two_q_hi: np.ndarray
    ratio_lo_lo: np.ndarray
    ratio_lo_hi: np.ndarray
    ratio_hi_lo: np.ndarray
    ratio_hi_hi: np.ndarray


def _digit_planes(mat: np.ndarray, q: int, nplanes: int) -> np.ndarray:
    """(..., ) object/uint64 matrix of values < q -> int8 planes (P, ...)."""
    m = mat.astype(np.uint64)
    out = np.zeros((nplanes,) + mat.shape, dtype=np.int8)
    for p in range(nplanes):
        out[p] = ((m >> np.uint64(7 * p)) & np.uint64(0x7F)).astype(np.int8)
    return out


def _max_kchunk(K: int, max_q: int) -> int:
    """Largest power-of-2 chunk of the contraction dim with
    chunk*(q-1)^2 < 2^128 (so the digit-plane recombination fits u128)."""
    kc = K
    while kc > 1 and kc * (max_q - 1) * (max_q - 1) >= (1 << 128):
        kc //= 2
    return kc


def build_mxu_tables(
    log_n: int,
    moduli: Sequence[Modulus],
    n2: "int | None" = None,
    host_tables: "Sequence[HostNTTTables] | None" = None,
    inv_scale: "Sequence[int] | None" = None,
) -> MXUTables:
    n = 1 << log_n
    if n2 is None:
        # favor the larger factor on the contiguous axis, capped at 128
        n2 = min(128, 1 << ((log_n + 1) // 2))
        # ... but keep n1 <= 512: the staged Pallas kernel holds one limb's
        # (P, n1, n1) int8 constant planes in VMEM, and n1=1024 (9 planes
        # ~ 9.4 MB) plus data/twiddle tiles exceeds the 16 MB scoped-VMEM
        # budget at n=131072.  n1=512/n2=256 compiles and keeps both
        # stages MXU-shaped.
        while n // n2 > 512:
            n2 *= 2
    n1 = n // n2
    if n1 < 2 or n2 < 2:
        raise ValueError("mxu ntt needs n1, n2 >= 2")
    ln1, ln2 = n1.bit_length() - 1, n2.bit_length() - 1
    if host_tables is None:
        host_tables = [cached_host_ntt_tables(log_n, m) for m in moduli]
    k = len(moduli)
    max_q = max(m.value for m in moduli)
    nplanes = (max_q.bit_length() + 6) // 7

    W = np.zeros((k, n1, n1), dtype=object)
    F = np.zeros((k, n2, n2), dtype=object)
    Winv = np.zeros((k, n1, n1), dtype=object)
    Finv = np.zeros((k, n2, n2), dtype=object)
    T = np.zeros((k, n1, n2), dtype=np.uint64)
    Tq = np.zeros((k, n1, n2), dtype=np.uint64)
    Ti = np.zeros((k, n1, n2), dtype=np.uint64)
    Tiq = np.zeros((k, n1, n2), dtype=np.uint64)

    if inv_scale is None:
        inv_scale = [1] * k
    for ki, (mod, tab) in enumerate(zip(moduli, host_tables)):
        q = mod.value
        psi = tab.root
        eta = pow(psi, n2, q)          # primitive 2*n1-th root
        zeta = pow(psi, 2 * n1, q)     # primitive n2-th root of unity
        # the extra inverse-scale (see build_limb_tables) folds into Winv,
        # the LAST inverse-stage matrix
        inv_n1 = numth.invert_mod(n1, q) * (inv_scale[ki] % q) % q
        inv_n2 = numth.invert_mod(n2, q)
        for t1 in range(n1):
            e = 2 * numth.reverse_bits(t1, ln1) + 1
            w = pow(eta, e, q)
            winv = numth.invert_mod(w, q)
            alpha = pow(psi, e, q)
            alphainv = numth.invert_mod(alpha, q)
            acc_w, acc_wi = 1, inv_n1
            acc_a, acc_ai = 1, 1
            for r in range(n1):
                W[ki, t1, r] = acc_w
                Winv[ki, r, t1] = acc_wi
                acc_w = acc_w * w % q
                acc_wi = acc_wi * winv % q
            for c in range(n2):
                T[ki, t1, c] = acc_a
                Tq[ki, t1, c] = _shoup(acc_a, q) & 0xFFFFFFFFFFFFFFFF
                Ti[ki, t1, c] = acc_ai
                Tiq[ki, t1, c] = _shoup(acc_ai, q) & 0xFFFFFFFFFFFFFFFF
                acc_a = acc_a * alpha % q
                acc_ai = acc_ai * alphainv % q
        for t2 in range(n2):
            e = numth.reverse_bits(t2, ln2)
            z = pow(zeta, e, q)
            zi = numth.invert_mod(z, q)
            acc_f, acc_fi = 1, inv_n2
            for c in range(n2):
                F[ki, t2, c] = acc_f
                Finv[ki, c, t2] = acc_fi
                acc_f = acc_f * z % q
                acc_fi = acc_fi * zi % q

    qv = np.array([m.value for m in moduli], dtype=np.uint64).reshape(k, 1, 1)
    two_q = qv * np.uint64(2)
    ratio = [(1 << 128) // m.value for m in moduli]
    rlo = np.array([r & 0xFFFFFFFFFFFFFFFF for r in ratio], dtype=np.uint64).reshape(k, 1, 1)
    rhi = np.array([(r >> 64) & 0xFFFFFFFFFFFFFFFF for r in ratio], dtype=np.uint64).reshape(k, 1, 1)

    def planes(mat):
        return _digit_planes(mat, max_q, nplanes)

    t_lo, t_hi = _split_words(T)
    tq_lo, tq_hi = _split_words(Tq)
    ti_lo, ti_hi = _split_words(Ti)
    tiq_lo, tiq_hi = _split_words(Tiq)
    q_lo, q_hi = _split_words(qv)
    twoq_lo, twoq_hi = _split_words(two_q)
    rll, rlh = _split_words(rlo)
    rhl, rhh = _split_words(rhi)

    return MXUTables(
        n1=n1, n2=n2, nplanes=nplanes,
        kchunk_a=_max_kchunk(n1, max_q), kchunk_b=_max_kchunk(n2, max_q),
        w_planes=planes(W), f_planes=planes(F),
        winv_planes=planes(Winv), finv_planes=planes(Finv),
        t_op_lo=t_lo, t_op_hi=t_hi, t_qt_lo=tq_lo, t_qt_hi=tq_hi,
        ti_op_lo=ti_lo, ti_op_hi=ti_hi, ti_qt_lo=tiq_lo, ti_qt_hi=tiq_hi,
        q_lo=q_lo, q_hi=q_hi, two_q_lo=twoq_lo, two_q_hi=twoq_hi,
        ratio_lo_lo=rll, ratio_lo_hi=rlh, ratio_hi_lo=rhl, ratio_hi_hi=rhh,
    )
