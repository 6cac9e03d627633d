"""Device RNS operations: base conversion and the BEHZ / mod-switch toolchain.

Device counterpart of the reference's ``RNSTool``/``BaseConverter`` ops
(``util/rns.cpp:418-1258``).  The fast base conversion is an exact u128
matrix-vector contraction over the limb axis (the reference's
``dot_product_mod``); on TPU this is the natural limb-sharded kernel (see
SURVEY.md §2.12).  Composite ops (sm_mrq, fast_floor, fastbconv_sk,
divide-and-round) mirror the reference's arithmetic step for step, expressed
as broadcast u64-lane ops.

All functions are pure and trace-friendly; host-side exact constants are
pulled from ``HostRNSTool`` / ``HostBaseConverter`` at trace time and become
jit constants.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..rns_host import HostBaseConverter, HostRNSTool, shoup_pair, split_u64_array
from ..ntt_tables import LimbTables
from . import ntt as NTT
from . import u64 as U

U64 = U.U64


def _c(values, shape=None) -> U64:
    """Host ints -> device (k,1) u64 constant pair."""
    lo, hi = split_u64_array(values, shape)
    return jnp.asarray(lo), jnp.asarray(hi)


def _cshoup(values, qs) -> Tuple[U64, U64]:
    ops, qts = [], []
    for v, q in zip(values, qs):
        o, s = shoup_pair(v, q)
        ops.append(o)
        qts.append(s)
    return _c(ops), _c(qts)


def _ratio(qs) -> Tuple[U64, U64]:
    r = [(1 << 128) // q for q in qs]
    return _c([x & ((1 << 64) - 1) for x in r]), _c([x >> 64 for x in r])


def fast_convert_array(x: U64, conv: HostBaseConverter) -> U64:
    """FBC: x in ibase (..., k_in, n) -> (..., k_out, n) in obase.

    cf. ``BaseConverter::fast_convert_array`` (rns.cpp:418-465): scale by
    inverse punctured products, then an exact u128-accumulated dot product
    with the base-change matrix, Barrett-reduced per output limb.  On TPU
    the contraction dispatches to an int8 digit-plane matmul (the
    ``ops/mxu_ntt.py`` machinery applied to the base-change matrix) — the
    MXU path for the k_in x k_out limb contraction called out in
    SURVEY.md §2.12.
    """
    d = conv.device()
    temp = U.mul_mod_shoup(x, d["inv_punct_op"], d["inv_punct_qt"], d["iq"])
    if _use_mxu_fbc():
        return _convert_contraction_mxu(temp, conv)
    return _convert_contraction(temp, d["matrix"], d["oq"], d["oratio_lo"], d["oratio_hi"])


def int8_plane_dot(eq: str, b, x):
    """int8 digit-plane contraction with int32 accumulation.

    On the CPU backend the int8 operands are upcast to int32 first: XLA's
    CPU emitter miscompiles fused i8xi8->i32 dots under
    --xla_force_host_platform_device_count (invalid LLVM IR, 'add i32, i8');
    on TPU the int8 form is what engages the MXU.
    """
    from .ntt import _effective_platform

    if _effective_platform() == "cpu":
        b = jnp.asarray(b, dtype=jnp.int32)
        x = x.astype(jnp.int32)
    else:
        b = jnp.asarray(b)
    return jnp.einsum(eq, b, x, preferred_element_type=jnp.int32)


def _use_mxu_fbc() -> bool:
    """Trace-time backend choice for the FBC contraction.

    SEAL_TPU_FBC=u128 forces the lane-pair u128 ladder; =mxu forces the
    digit-plane matmul (exact everywhere, incl. CPU); 'auto' (default)
    picks mxu on accelerator backends — the u128 ladder is
    u32-multiply-throughput-bound on the VPU.
    """
    import os

    mode = os.environ.get("SEAL_TPU_FBC", "auto")
    if mode == "mxu":
        return True
    if mode == "u128":
        return False
    from .ntt import _effective_platform

    return _effective_platform() != "cpu"


def _fbc_planes(conv: HostBaseConverter):
    """Cached plane-fused int8 matrix + bounds for conv's change matrix.

    The digit-plane decomposition is folded INTO the contraction axis:
    one (k_out*P_s, k_in*P_d) int8 matrix B with
    ``B[(s, j), (a, i)] = matrix[j, i]'s (s-a)-th 7-bit digit`` turns the
    P_d x P_m per-plane dot products into a single MXU-shaped matmul whose
    contraction axis is k_in*P_d wide (a bare k_in-deep contraction would
    waste the systolic array at the FBC's small limb counts).
    """
    cache = getattr(conv, "_mxu_planes", None)
    if cache is not None:
        return cache
    in_vals = conv.ibase.values
    out_vals = conv.obase.values
    k_out, k_in = len(out_vals), len(in_vals)
    max_in = max(in_vals)
    max_mat = max(max(row) for row in conv.matrix) if k_out else 0
    p_d = max(1, -(-((max_in - 1).bit_length()) // 7))
    p_m = max(1, -(-(max(1, max_mat).bit_length()) // 7))
    p_s = p_d + p_m - 1
    mat = np.array(conv.matrix, dtype=np.uint64)  # (k_out, k_in)
    big = np.zeros((p_s, k_out, p_d, k_in), dtype=np.int8)
    for s in range(p_s):
        for a in range(p_d):
            b = s - a
            if 0 <= b < p_m:
                big[s, :, a, :] = (
                    (mat >> np.uint64(7 * b)) & np.uint64(0x7F)
                ).astype(np.int8)
    big = big.reshape(p_s * k_out, p_d * k_in)
    # per-plane digit bounds (top plane is smaller than 127)
    db_d = [127] * (p_d - 1) + [(max_in - 1) >> (7 * (p_d - 1))]
    db_m = [127] * (p_m - 1) + [max(1, max_mat) >> (7 * (p_m - 1))]
    bounds = [0] * p_s
    for a in range(p_d):
        for b in range(p_m):
            bounds[a + b] += db_d[a] * db_m[b]
    # contraction chunk (over k_in) so the recombined sum stays < 2^128
    per_term = max_in * max(1, max_mat)
    kchunk = max(1, min(k_in, (1 << 128) // max(1, per_term)))
    # cached host-side (numpy): a jnp constant captured inside one trace
    # must not leak into later traces
    cache = (big, p_d, p_m, bounds, int(kchunk))
    conv._mxu_planes = cache
    return cache


def _convert_contraction_mxu(temp: U64, conv: HostBaseConverter) -> U64:
    """Plane-fused int8 matmul formulation of _convert_contraction.

    Bit-identical result: 7-bit digit products are < 2^14 ints summed over
    at most kchunk*P_d terms per int32 partial (no overflow), recombined
    into a u128 and Barrett-reduced with the same constants as the u128
    ladder.
    """
    from .mxu_ntt import _recombine_barrett_q, _to_planes

    d = conv.device()
    big, p_d, p_m, bounds0, kchunk = _fbc_planes(conv)
    k_in = conv.ibase.size
    k_out = conv.obase.size
    p_s = p_d + p_m - 1
    xp = _to_planes(temp, p_d)  # list of int8 (..., k_in, n)
    # data layout (..., p_d * k_in, n) matching B's column order
    x_all = jnp.concatenate(xp, axis=-2)
    lead = x_all.shape[:-2]
    n = x_all.shape[-1]
    nchunks = -(-k_in // kchunk)
    oq = d["oq"]
    orlo, orhi = d["oratio_lo"], d["oratio_hi"]
    bigm = big.reshape(p_s * k_out, p_d, k_in)
    acc = None
    for ch in range(nchunks):
        sl = slice(ch * kchunk, min((ch + 1) * kchunk, k_in))
        ck = min(kchunk, k_in - ch * kchunk)
        if nchunks > 1:
            bc = jnp.asarray(np.ascontiguousarray(bigm[:, :, sl]).reshape(p_s * k_out, -1))
            xc = x_all.reshape(*lead, p_d, k_in, n)[..., sl, :].reshape(*lead, -1, n)
        else:
            bc, xc = jnp.asarray(big), x_all
        part = int8_plane_dot("RA,...An->...Rn", bc, xc).reshape(
            *lead, p_s, k_out, n
        )
        planes_out = [part[..., s, :, :] for s in range(p_s)]
        bounds = [b * ck for b in bounds0]
        red = _recombine_barrett_q(planes_out, bounds, oq, orlo, orhi)
        acc = red if acc is None else U.add_mod(acc, red, oq)
    return acc


def _convert_contraction(temp: U64, matrix: U64, oq: U64, oratio_lo: U64, oratio_hi: U64) -> U64:
    """sum_i temp[..., i, :] * matrix[j, i] mod oq[j] with exact u128 accum.

    Each term is < 2^122 (61-bit operand pairs), so the accumulator is
    Barrett-reduced every 64 summands — the u128 overflow guard that lets
    k_in run to COEFF_MOD_COUNT_MAX = 256 (same rationale as the
    reference's SEAL_MULTIPLY_ACCUMULATE_*_MAX, defines.h:66).
    """
    m_lo, m_hi = matrix
    k_out, k_in = m_lo.shape
    lead = temp[0].shape[:-2]
    n = temp[0].shape[-1]
    acc = U.zero128((*lead, k_out, n))
    for i in range(k_in):
        xi = (temp[0][..., i : i + 1, :], temp[1][..., i : i + 1, :])
        mi = (m_lo[:, i : i + 1], m_hi[:, i : i + 1])
        acc = U.add128(acc, U.mul64_wide(xi, mi))
        if (i + 1) % 64 == 0 and i + 1 < k_in:
            red = U.barrett_reduce_128(acc, oq, oratio_lo, oratio_hi)
            acc = (red[0], red[1], jnp.zeros_like(red[0]), jnp.zeros_like(red[0]))
    return U.barrett_reduce_128(acc, oq, oratio_lo, oratio_hi)


def exact_convert_array(x: U64, conv: HostBaseConverter) -> U64:
    """Exact (rounded) conversion to a single-modulus obase.

    cf. ``BaseConverter::exact_convert_array`` (rns.cpp:466-541).  The
    reference aggregates the rationals x_i/q_i in double precision; here we
    use 64-bit fixed point via the 128-bit reciprocals floor(2^128/q_i) —
    strictly more accurate, so the rounded overflow count v is identical in
    the regime where the algorithm is exact (CT-RSA 2019 bound).
    """
    d = conv.device()
    if conv.obase.size != 1:
        raise ValueError("exact_convert_array requires obase of size 1")
    k_in = conv.ibase.size
    lead, n = x[0].shape[:-2], x[0].shape[-1]
    temp = U.mul_mod_shoup(x, d["inv_punct_op"], d["inv_punct_qt"], d["iq"])

    # Fixed-point fraction of temp_i / q_i: bits [64,128) of temp_i * floor(2^128/q_i)
    frac_lo = U.mulhi64(temp, (d["iratio_lo"][0], d["iratio_lo"][1]))
    frac_hi = U.mullo64(temp, (d["iratio_hi"][0], d["iratio_hi"][1]))
    frac = U.add64(frac_lo, frac_hi)

    carries = jnp.zeros((*lead, 1, n), dtype=jnp.uint32)
    acc = (jnp.zeros((*lead, 1, n), dtype=jnp.uint32),) * 2
    for i in range(k_in):
        fi = (frac[0][..., i : i + 1, :], frac[1][..., i : i + 1, :])
        acc, c = U.add64_carry(acc, fi)
        carries = carries + c
    # rounding: + 1/2
    acc, c = U.add64_carry(acc, U.const_u64(1 << 63))
    carries = carries + c
    v = (carries, jnp.zeros_like(carries))

    sum_mod_t = _convert_contraction(temp, d["matrix"], d["oq"], d["oratio_lo"], d["oratio_hi"])
    t = conv.obase.values[0]
    vq_op, vq_qt = _cshoup([d["q_mod_obase0"]], [t])
    v_q_mod_t = U.mul_mod_shoup(v, vq_op, vq_qt, d["oq"])
    return U.sub_mod(sum_mod_t, v_q_mod_t, d["oq"])


# ---------------------------------------------------------------------------
# BEHZ toolchain (BFV multiply) — cf. rns.cpp:903-1131
# ---------------------------------------------------------------------------

def fastbconv_m_tilde(x: U64, tool: HostRNSTool) -> U64:
    """q -> Bsk U {m_tilde}: scale by m_tilde then FBC (rns.cpp:1086-1131).

    The x m_tilde scaling, the FBC inv-punctured scaling, and both output
    bases (Bsk and {m_tilde}) are fused into one prescaled merged
    converter: a single Shoup multiply + a single contraction.
    """
    return fast_convert_array(x, tool.conv_q_to_Bsk_m_tilde_scaled)


def sm_mrq(x: U64, tool: HostRNSTool) -> U64:
    """Small Montgomery reduction mod q: Bsk U {m_tilde} -> Bsk (rns.cpp:979).

    dest = (input + q * r_m_tilde) * m_tilde^{-1} mod Bsk, with r_m_tilde
    centered modulo m_tilde = 2^32.
    """
    bskv = tool.base_Bsk.values
    k_bsk = len(bskv)
    x_bsk = (x[0][..., :k_bsk, :], x[1][..., :k_bsk, :])
    x_mt = (x[0][..., k_bsk:, :], x[1][..., k_bsk:, :])

    mt = tool.m_tilde.value
    neg_op, neg_qt = _cshoup([tool.neg_inv_prod_q_mod_m_tilde], [mt])
    r_mt = U.mul_mod_shoup(x_mt, neg_op, neg_qt, U.const_u64(mt, (1, 1)))

    # centered reduction: r >= m_tilde/2 -> r + (q_bsk - m_tilde)
    half = U.const_u64(mt >> 1)
    corr = _c([q - mt for q in bskv])
    centered = U.select64(U.ge64(r_mt, half), U.add64(r_mt, corr), r_mt)

    q_bsk = _c(bskv)
    # centered * prod_q mod q via Shoup (prod_q < q is the precomputed
    # operand; centered may exceed q — Shoup multiplication stays exact
    # for any 64-bit multiplicand), cheaper than the 128-bit Barrett
    pq_op, pq_qt = _cshoup(tool.prod_q_mod_Bsk, bskv)
    inner = U.add_mod(U.mul_mod_shoup(centered, pq_op, pq_qt, q_bsk), x_bsk, q_bsk)
    imt_op, imt_qt = _cshoup(tool.inv_m_tilde_mod_Bsk, bskv)
    return U.mul_mod_shoup(inner, imt_op, imt_qt, q_bsk)


def fast_floor(x: U64, tool: HostRNSTool) -> U64:
    """floor(x/q): q U Bsk -> Bsk (rns.cpp:1041-1085)."""
    k_q = tool.base_q.size
    x_q = (x[0][..., :k_q, :], x[1][..., :k_q, :])
    x_bsk = (x[0][..., k_q:, :], x[1][..., k_q:, :])
    dest = fast_convert_array(x_q, tool.conv_q_to_Bsk)
    bskv = tool.base_Bsk.values
    q_bsk = _c(bskv)
    # (x_bsk + q - dest) * inv_prod_q_mod_Bsk; lazy negation is fine for Shoup
    diff = U.sub64(U.add64(x_bsk, q_bsk), dest)
    iq_op, iq_qt = _cshoup(tool.inv_prod_q_mod_Bsk, bskv)
    return U.mul_mod_shoup(diff, iq_op, iq_qt, q_bsk)


def fastbconv_sk(x: U64, tool: HostRNSTool) -> U64:
    """Shenoy-Kumaresan conversion Bsk -> q (rns.cpp:903-978).

    The two conversions (B -> q and B -> m_sk) run as one merged
    contraction to q U {m_sk}.
    """
    k_B = tool.base_B.size
    k_q = tool.base_q.size
    x_B = (x[0][..., :k_B, :], x[1][..., :k_B, :])
    x_sk = (x[0][..., k_B:, :], x[1][..., k_B:, :])

    both = fast_convert_array(x_B, tool.conv_B_to_q_m_sk)
    dest = (both[0][..., :k_q, :], both[1][..., :k_q, :])
    temp = (both[0][..., k_q:, :], both[1][..., k_q:, :])

    msk = tool.m_sk.value
    msk_c = U.const_u64(msk, (1, 1))
    iB_op, iB_qt = _cshoup([tool.inv_prod_B_mod_m_sk], [msk])
    # alpha_sk = (temp + (m_sk - x_sk)) * invB mod m_sk (lazy input ok)
    alpha = U.mul_mod_shoup(U.sub64(U.add64(temp, msk_c), x_sk), iB_op, iB_qt, msk_c)

    qv = tool.base_q.values
    q = _c(qv)
    pB_op, pB_qt = _cshoup(tool.prod_B_mod_q, qv)
    nB_op, nB_qt = _cshoup([(qi - p) % qi for p, qi in zip(tool.prod_B_mod_q, qv)], qv)

    alpha_neg = U.neg_mod(alpha, msk_c)
    branch_hi = U.add_mod(U.mul_mod_shoup(alpha_neg, pB_op, pB_qt, q), dest, q)
    branch_lo = U.add_mod(U.mul_mod_shoup(alpha, nB_op, nB_qt, q), dest, q)
    big = U.ge64(alpha, U.const_u64((msk >> 1) + 1))  # alpha > m_sk/2
    return U.select64(big, branch_hi, branch_lo)


# ---------------------------------------------------------------------------
# Modulus switching / rescaling — cf. rns.cpp:789-902, 1193-1237
# ---------------------------------------------------------------------------

def divide_and_round_q_last(x: U64, tool: HostRNSTool) -> U64:
    """(..., k, n) coefficient-domain -> (..., k-1, n): round(x / q_last).

    cf. ``divide_and_round_q_last_inplace`` (rns.cpp:789-829).
    """
    qv = tool.base_q.values
    k = len(qv)
    q_last = qv[-1]
    half = q_last >> 1
    x_last = (x[0][..., k - 1 :, :], x[1][..., k - 1 :, :])
    x_rest = (x[0][..., : k - 1, :], x[1][..., : k - 1, :])

    last_plus = U.add_mod(x_last, U.const_u64(half, (1, 1)), U.const_u64(q_last, (1, 1)))
    rest_q = _c(qv[:-1])
    rest_ratio_hi = _ratio(qv[:-1])[1]
    temp = U.barrett_reduce_64(last_plus, rest_q, rest_ratio_hi)
    half_mod = _c([half % qi for qi in qv[:-1]])
    temp = U.sub_mod(temp, half_mod, rest_q)
    diff = U.sub_mod(x_rest, temp, rest_q)
    inv_op, inv_qt = _cshoup(tool.inv_q_last_mod_q, qv[:-1])
    return U.mul_mod_shoup(diff, inv_op, inv_qt, rest_q)


def divide_and_round_q_last_ntt(x: U64, tool: HostRNSTool, tables: LimbTables) -> U64:
    """NTT-domain variant (rns.cpp:830-902); ``tables`` covers base q (k limbs)."""
    qv = tool.base_q.values
    k = len(qv)
    q_last = qv[-1]
    half = q_last >> 1

    x_last = (x[0][..., k - 1 :, :], x[1][..., k - 1 :, :])
    x_rest = (x[0][..., : k - 1, :], x[1][..., : k - 1, :])

    last_tab = slice_limbs(tables, k - 1, k)
    rest_tab = slice_limbs(tables, 0, k - 1)

    last_coeff = NTT.ntt_inverse(x_last, last_tab)
    last_plus = U.add_mod(last_coeff, U.const_u64(half, (1, 1)), U.const_u64(q_last, (1, 1)))

    rest_q = _c(qv[:-1])
    rest_ratio_hi = _ratio(qv[:-1])[1]
    # (ct mod q_last) mod q_i — copy when q_i >= q_last (value already < q_i)
    need_reduce = [qi < q_last for qi in qv[:-1]]
    reduced = U.barrett_reduce_64(last_plus, rest_q, rest_ratio_hi)
    mask = jnp.asarray(np.array(need_reduce).reshape(-1, 1))
    temp = U.select64(mask, reduced, last_plus)
    # lazy subtract of half: temp += q_i - (half mod q_i); stays < 2q_i
    neg_half = _c([qi - (half % qi) for qi in qv[:-1]])
    temp = U.add64(temp, neg_half)
    temp = NTT.ntt_forward(temp, rest_tab, lazy=True)  # < 4q_i
    # x_i + 4q_i - temp, then Shoup-reduce via multiply
    qi_lazy = _c([qi << 2 for qi in qv[:-1]])
    diff = U.sub64(U.add64(x_rest, qi_lazy), temp)
    inv_op, inv_qt = _cshoup(tool.inv_q_last_mod_q, qv[:-1])
    return U.mul_mod_shoup(diff, inv_op, inv_qt, rest_q)


def mod_t_and_divide_q_last_ntt(x: U64, tool: HostRNSTool, tables: LimbTables) -> U64:
    """BGV modulus switch (rns.cpp:1193-1237): exact division after mod-t fix."""
    qv = tool.base_q.values
    k = len(qv)
    t = tool.t.value
    q_last = qv[-1]

    x_last = (x[0][..., k - 1 :, :], x[1][..., k - 1 :, :])
    x_rest = (x[0][..., : k - 1, :], x[1][..., : k - 1, :])

    last_tab = slice_limbs(tables, k - 1, k)
    rest_tab = slice_limbs(tables, 0, k - 1)

    c_last = NTT.ntt_inverse(x_last, last_tab)
    t_c = U.const_u64(t, (1, 1))
    t_ratio_hi = _ratio([t])[1]
    c_last_mod_t = U.barrett_reduce_64(c_last, t_c, t_ratio_hi)
    neg_c_mod_t = U.neg_mod(c_last_mod_t, t_c)
    if tool.inv_q_last_mod_t != 1:
        op, qt = _cshoup([tool.inv_q_last_mod_t], [t])
        neg_c_mod_t = U.mul_mod_shoup(neg_c_mod_t, op, qt, t_c)

    rest_q = _c(qv[:-1])
    rest_rlo, rest_rhi = _ratio(qv[:-1])
    # delta_i = (neg_c_mod_t mod q_i) * q_last mod q_i
    delta = U.barrett_reduce_64(neg_c_mod_t, rest_q, rest_rhi)
    ql_op, ql_qt = _cshoup([q_last % qi for qi in qv[:-1]], qv[:-1])
    delta = U.mul_mod_shoup(delta, ql_op, ql_qt, rest_q)
    # delta_i += c_last mod q_i
    delta = U.add_mod(delta, U.barrett_reduce_64(c_last, rest_q, rest_rhi), rest_q)
    delta = NTT.ntt_forward(delta, rest_tab)
    out = U.sub_mod(x_rest, delta, rest_q)
    inv_op, inv_qt = _cshoup(tool.inv_q_last_mod_q, qv[:-1])
    return U.mul_mod_shoup(out, inv_op, inv_qt, rest_q)


# ---------------------------------------------------------------------------
# Decryption tails — cf. rns.cpp:1133-1258
# ---------------------------------------------------------------------------

def decrypt_scale_and_round(x: U64, tool: HostRNSTool) -> U64:
    """BFV decrypt tail: round(t/q * x) mod t via the {t, gamma} base."""
    qv = tool.base_q.values
    t, gamma = tool.t.value, tool.gamma.value
    tg_op, tg_qt = _cshoup(tool.prod_t_gamma_mod_q, qv)
    temp = U.mul_mod_shoup(x, tg_op, tg_qt, _c(qv))
    tg = fast_convert_array(temp, tool.conv_q_to_t_gamma)
    ninv_op, ninv_qt = _cshoup(tool.neg_inv_q_mod_t_gamma, [t, gamma])
    tg = U.mul_mod_shoup(tg, ninv_op, ninv_qt, _c([t, gamma]))

    t_part = (tg[0][..., 0:1, :], tg[1][..., 0:1, :])
    g_part = (tg[0][..., 1:2, :], tg[1][..., 1:2, :])

    t_c = U.const_u64(t, (1, 1))
    t_rhi = _ratio([t])[1]
    gamma_c = U.const_u64(gamma, (1, 1))
    add_result = U.add_mod(t_part, U.barrett_reduce_64(U.sub64(gamma_c, g_part), t_c, t_rhi), t_c)
    sub_result = U.sub_mod(t_part, U.barrett_reduce_64(g_part, t_c, t_rhi), t_c)
    big = U.ge64(g_part, U.const_u64((gamma >> 1) + 1))
    out = U.select64(big, add_result, sub_result)
    ig_op, ig_qt = _cshoup([tool.inv_gamma_mod_t], [t])
    return U.mul_mod_shoup(out, ig_op, ig_qt, t_c)


def decrypt_modt(x: U64, tool: HostRNSTool) -> U64:
    """BGV decrypt tail: exact conversion q -> {t}."""
    return exact_convert_array(x, tool.conv_q_to_t)


# ---------------------------------------------------------------------------
# Table slicing helper
# ---------------------------------------------------------------------------

def slice_limbs(t: LimbTables, start: int, stop: int) -> LimbTables:
    """Restrict a LimbTables bundle to limbs [start, stop)."""
    na = LimbTables.N_ARRAY_FIELDS
    return LimbTables(
        *(arr[start:stop] for arr in t[:na]),
        log_n=t.log_n, moduli_values=t.moduli_values[start:stop],
        inv_scale=t.inv_scale[start:stop] if t.inv_scale else (),
    )


def take_limbs(t: LimbTables, indices) -> LimbTables:
    """Gather arbitrary limb rows of a LimbTables bundle."""
    idx = np.asarray(indices)
    na = LimbTables.N_ARRAY_FIELDS
    return LimbTables(
        *(arr[idx] for arr in t[:na]),
        log_n=t.log_n,
        moduli_values=tuple(t.moduli_values[int(i)] for i in idx) if t.moduli_values else (),
        inv_scale=tuple(t.inv_scale[int(i)] for i in idx) if t.inv_scale else (),
    )
