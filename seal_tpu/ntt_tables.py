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


def build_limb_tables(log_n: int, moduli: Sequence[Modulus], host_tables: "Sequence[HostNTTTables] | None" = None) -> LimbTables:
    """Build the packed device bundle for a modulus vector."""
    if host_tables is None:
        host_tables = [HostNTTTables(log_n, m) for m in moduli]
    n = 1 << log_n
    k = len(moduli)

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
        invn[i, 0] = tab.inv_degree
        invn_qt[i, 0] = _shoup(tab.inv_degree, q) & 0xFFFFFFFFFFFFFFFF
        last[i, 0] = tab.scaled_last_inv_root
        last_qt[i, 0] = _shoup(tab.scaled_last_inv_root, q) & 0xFFFFFFFFFFFFFFFF

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
    )
