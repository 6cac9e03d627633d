"""Speed-of-light model for the benchmarked op taxonomy.

For every ciphertext-domain op the model computes the minimal HBM traffic
(read every input once, write every output once, perfect fusion — the
floor any schedule can hit) and, where the op is MXU-dominated (the
four-step digit-plane NTT), the MXU int-op floor.  The op's speed-of-light
time is max(HBM bound, MXU bound); the MFU-style column reported next to
each measured time is sol_us / measured_us.

Calibration (measured on this chip, tools of round 3; TPU v5e specs in
parentheses): HBM_GBPS = 780 (819), INT8_TOPS = 278 (394 peak) — the
measured stream/matmul rates, not datasheet numbers, so the column answers
"how far from what this chip demonstrably does", not "from marketing".

Data model: one u64 coefficient = 2x u32 lanes = 8 bytes; ciphertext =
size*k*n*8 bytes; plaintext (RNS form) = k*n*8; key-switch key =
2*D*k_key*n*8 (c0+c1 stacks, kept resident in HBM — reads counted because
each key limb is streamed through the MXU contraction per op).
"""

from __future__ import annotations

HBM_GBPS = 780.0  # measured stream bandwidth (jit a+1 slope, 256 MB live set)
INT8_TOPS = 278.0  # measured int8 dot_general throughput at 4096^3


def _us_bw(nbytes: float) -> float:
    return nbytes / (HBM_GBPS * 1e3)  # bytes / (GB/s) -> us


def _us_mxu(int8_macs: float) -> float:
    return 2.0 * int8_macs / (INT8_TOPS * 1e6)  # 2 ops per MAC -> us


def ntt_cost_us(n: int, k: int, nplanes: int = 9, polys: int = 1) -> dict:
    """Four-step MXU NTT floor: two modular matmul stages (n1 x n1 and
    n2 x n2 shared matrices), P data planes x P constant planes each."""
    n1 = 1
    while n1 * n1 < n:
        n1 *= 2
    n2 = n // n1
    macs = (nplanes ** 2) * n * (n1 + n2) * k * polys
    io = 2 * k * n * 8 * polys
    return {
        "sol_hbm_us": _us_bw(io),
        "sol_mxu_us": _us_mxu(macs),
        "sol_us": max(_us_bw(io), _us_mxu(macs)),
    }


def op_sol_us(op: str, scheme: str, n: int, k: int, k_key: int | None = None,
              k_bsk: int | None = None) -> float | None:
    """Speed-of-light us for one evaluator op at (scheme, n, k limbs).

    Returns None for ops with no model (host-boundary ops).
    """
    if k_key is None:
        k_key = k + 1
    if k_bsk is None:
        k_bsk = k + 2  # Bsk = B u {m_sk}, |B| = k or k+1 (rns.cpp:607-613)
    ct = 2 * k * n * 8          # size-2 ciphertext bytes
    ct3 = 3 * k * n * 8
    pt = k * n * 8
    ntt1 = ntt_cost_us(n, k)["sol_us"]          # one k-limb transform

    if op in ("add", "sub"):
        return _us_bw(2 * ct + ct)
    if op == "negate":
        return _us_bw(ct + ct)
    if op == "add_plain":
        return _us_bw(ct + pt + ct)
    if op == "multiply_plain":
        return _us_bw(ct + pt + ct)
    if op in ("multiply", "square") and scheme in ("ckks", "bgv"):
        # NTT-domain dyadic convolution: read 2 cts (1 for square), write size-3
        rd = ct if op == "square" else 2 * ct
        return _us_bw(rd + ct3)
    if op in ("multiply", "square") and scheme == "bfv":
        # BEHZ: 4 forward NTTs of k+k_bsk limbs x 2 polys (x1 for square),
        # 1 inverse of (k+k_bsk) x 3 polys, plus the base-conversion
        # matmuls (k x k_bsk contractions, bw-dominated) and IO.
        inputs = 1 if op == "square" else 2
        fw = ntt_cost_us(n, (k + k_bsk) * 2 * inputs)["sol_us"]
        inv = ntt_cost_us(n, (k + k_bsk) * 3)["sol_us"]
        io = _us_bw(inputs * ct + ct3 + 3 * (k + k_bsk) * n * 8 * 2)
        return fw + inv + io
    if op == "relinearize":
        # key-switch: stream the (2, D, k_key, n) key pair + inner-product
        # contraction (digit-plane matmul over D) + 2(k+1)-limb NTT work
        key_bytes = 2 * k * k_key * n * 8
        ntts = ntt_cost_us(n, k * (k + 1))["sol_us"]  # D NTTs of target per output limb set
        return _us_bw(key_bytes + ct3 + ct) + ntts
    if op in ("rotate_one_step", "rotate_rows_one_step", "rotate_columns"):
        return (op_sol_us("relinearize", scheme, n, k, k_key) or 0) + _us_bw(ct + ct)
    if op in ("rescale", "mod_switch"):
        # divide_and_round_q_last: iNTT last limb, NTT back per remaining limb
        return ntt_cost_us(n, k + (k - 1) * 2)["sol_us"] * (1 if scheme == "ckks" else 1) + _us_bw(ct + ct)
    if op in ("to_ntt", "from_ntt"):
        return ntt_cost_us(n, 2 * k)["sol_us"] + _us_bw(ct + ct)
    if op == "ntt_forward" or op == "ntt_inverse":
        return ntt_cost_us(n, k)["sol_us"]
    return None
