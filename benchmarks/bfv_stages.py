#!/usr/bin/env python3
"""BFV BEHZ multiply: per-stage timing + composed-graph scheduling probe.

Round-2 verdict #3: BFV multiply measured 849 us at n=8192 under chained
timing vs BGV's 10 us, with no per-stage breakdown.  Two hypotheses:

  (a) one stage (base conversion / NTT / tail) dominates;
  (b) the chained harness *inlines* the staged pipeline into one XLA
      graph (calling jitted fns inside a jit traces through them), which
      recreates the round-1 "composed graph mis-schedules" pathology the
      dispatch boundaries were added to avoid.

This script times every stage separately (chained), the full multiply
(chained = composed graph), and a composed graph with
``lax.optimization_barrier`` between stages — if (b) holds, barriers
should recover the stage-sum time inside a single dispatch, which is also
the fix for real fused pipelines (deep circuits under one jit).

Usage: python benchmarks/bfv_stages.py [--n 8192]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seal_tpu.context import SealContext
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator, _stack_polys
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency
    from seal_tpu.ops import ntt as NTT
    from seal_tpu.ops import rns as R
    from seal_tpu.ops import u64 as U
    from seal_tpu.ops.rns import _cshoup

    n = args.n
    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
        kg = KeyGenerator(ctx)
        enc = Encryptor(ctx, secret_key=kg.secret_key)
        be = BatchEncoder(ctx)
        ct1 = enc.encrypt_symmetric(be.encode(list(range(n))))
        ct2 = enc.encrypt_symmetric(be.encode(list(range(1, n + 1))))

    cd = ctx.first_context_data()
    tool = cd.rns_tool
    k = len(cd.coeff_modulus_values)
    ct1.data = jax.device_put(ct1.data, target)
    ct2.data = jax.device_put(ct2.data, target)
    ev = Evaluator(ctx, throw_on_transparent=False)

    tv = cd.parms.plain_modulus.value
    qv = cd.coeff_modulus_values
    bskv = tool.base_Bsk.values

    # ---- stage bodies (mirroring evaluator._bfv_multiply) -----------------
    def s_ntt_q(d):
        return NTT.ntt_forward(d, cd.limb_tables(), lazy=True)

    def s_ext(d):
        return R.sm_mrq(R.fastbconv_m_tilde(d, tool), tool)

    def s_ntt_bsk(d):
        return NTT.ntt_forward(d, cd.bsk_limb_tables(), lazy=True)

    def conv(d1, d2, tables):
        t = tables
        polys1 = [(d1[0][j], d1[1][j]) for j in range(2)]
        polys2 = [(d2[0][j], d2[1][j]) for j in range(2)]
        return _stack_polys(ev._convolve(polys1, polys2, t.q, t.ratio_lo, t.ratio_hi))

    def s_intt_scale(d, tables, mods):
        op, qt = _cshoup([tv % q for q in mods], mods)
        y = NTT.ntt_inverse(d, tables, lazy=True)
        return U.mul_mod_shoup(y, op, qt, tables.q)

    def s_tail(d):
        return R.fastbconv_sk(R.fast_floor(d, tool), tool)

    res = {"n": n, "k": k}

    def scalar(x):
        return x[0].reshape(-1)[0]

    def chain(label, step, init):
        us = chained_device_time_us(step, init, lo=4, hi=20, repeats=3)
        res[label] = us
        print(f"  {label:22s} {us:9.1f} us", flush=True)
        return us

    print(f"=== BFV BEHZ stages n={n} k={k} ===", flush=True)
    d1, d2 = ct1.data, ct2.data

    # per-stage chained loops (self-serializing via output feed)
    e1_q = jax.jit(s_ntt_q)(d1)
    e1_b0 = jax.jit(s_ext)(d1)
    e1_b = jax.jit(s_ntt_bsk)(e1_b0)
    chain("ntt_q(x2)", lambda c: serialize_dependency(scalar(s_ntt_q(c)), c, d2), d1)
    chain("ext_bsk(x2)", lambda c: serialize_dependency(scalar(s_ext(c)), c, d2), d1)
    chain("ntt_bsk(x2)", lambda c: serialize_dependency(scalar(s_ntt_bsk(c)), c, e1_b0), e1_b0)
    e2_q = jax.jit(s_ntt_q)(d2)
    e2_b = jax.jit(s_ntt_bsk)(jax.jit(s_ext)(d2))
    chain("conv_q", lambda c: serialize_dependency(
        scalar(conv(c, e2_q, cd.limb_tables())), c, e1_q), e1_q)
    chain("conv_b", lambda c: serialize_dependency(
        scalar(conv(c, e2_b, cd.bsk_limb_tables())), c, e1_b), e1_b)
    dq = jax.jit(lambda a, b: conv(a, b, cd.limb_tables()))(e1_q, e2_q)
    db = jax.jit(lambda a, b: conv(a, b, cd.bsk_limb_tables()))(e1_b, e2_b)
    chain("intt_q", lambda c: serialize_dependency(
        scalar(s_intt_scale(c, cd.limb_tables(), qv)), c, dq), dq)
    chain("intt_b", lambda c: serialize_dependency(
        scalar(s_intt_scale(c, cd.bsk_limb_tables(), bskv)), c, db), db)
    j_q = jax.jit(lambda d: s_intt_scale(d, cd.limb_tables(), qv))(dq)
    j_b = jax.jit(lambda d: s_intt_scale(d, cd.bsk_limb_tables(), bskv))(db)
    joined = (jnp.concatenate([j_q[0], j_b[0]], axis=1),
              jnp.concatenate([j_q[1], j_b[1]], axis=1))
    chain("tail_floor_sk", lambda c: serialize_dependency(
        scalar(s_tail(c)), c, joined), joined)

    # 2x the unary stages (both inputs) + both convs + both iNTTs + tail
    stage_sum = (2 * (res["ntt_q(x2)"] + res["ext_bsk(x2)"] + res["ntt_bsk(x2)"])
                 + res["conv_q"] + res["conv_b"] + res["intt_q"] + res["intt_b"]
                 + res["tail_floor_sk"])
    res["stage_sum"] = stage_sum
    print(f"  {'stage_sum':22s} {stage_sum:9.1f} us", flush=True)

    # ---- composed graph (what chained timing of ev.multiply measures) ----
    def full(c):
        out = ev.multiply(Ciphertext_like(ct1, c), ct2)
        return serialize_dependency(scalar(out.data), c, d2)

    def Ciphertext_like(proto, data):
        o = proto.copy()
        o.data = data
        return o

    chain("composed_full", full, d1)

    # ---- composed with optimization_barrier between stages ---------------
    def full_barrier(c):
        b = jax.lax.optimization_barrier
        x1q = b(s_ntt_q(c))
        x1b = b(s_ntt_bsk(b(s_ext(c))))
        x2q = b(s_ntt_q(d2))
        x2b = b(s_ntt_bsk(b(s_ext(d2))))
        cq = b(conv(x1q, x2q, cd.limb_tables()))
        cb = b(conv(x1b, x2b, cd.bsk_limb_tables()))
        iq = b(s_intt_scale(cq, cd.limb_tables(), qv))
        ib = b(s_intt_scale(cb, cd.bsk_limb_tables(), bskv))
        jn = (jnp.concatenate([iq[0], ib[0]], axis=1),
              jnp.concatenate([iq[1], ib[1]], axis=1))
        out = s_tail(jn)
        return serialize_dependency(scalar(out), c, d2)

    chain("composed_barriers", full_barrier, d1)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps({k2: round(v, 1) if isinstance(v, float) else v
                      for k2, v in res.items()}))


if __name__ == "__main__":
    main()
