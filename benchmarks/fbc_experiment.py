#!/usr/bin/env python3
"""Experiment: MXU digit-plane FBC contraction vs the u128 lane loop.

The BEHZ tail (fast_floor + fastbconv_sk) measured 134 us at n=8192 —
~10x above op-count theory.  Hypothesis: the per-(i,j) mul64_wide/add128
ladder is u32-multiply-throughput-bound on the VPU; an int8 digit-plane
einsum (the ops/mxu_ntt.py machinery, applied to the (k_out, k_in)
base-change matrix) moves the multiplies to the MXU.

Usage: python benchmarks/fbc_experiment.py [--n 8192]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from seal_tpu.modulus import CoeffModulus, PlainModulus
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.context import SealContext
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency
    from seal_tpu.ops import rns as R
    from seal_tpu.ops import u64 as U
    from seal_tpu.modulus import SecurityLevel

    n = args.n
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        parms.set_plain_modulus(PlainModulus.batching(n, 20))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
    cd = ctx.first_context_data()
    tool = cd.rns_tool
    conv = tool.conv_q_to_Bsk
    k_in = conv.ibase.size
    k_out = conv.obase.size
    print(f"n={n} k_in={k_in} k_out={k_out}")

    rng = np.random.default_rng(5)
    qv = np.array(conv.ibase.values, dtype=np.uint64)[:, None]
    # ciphertext has 3 output polys in the BEHZ tail; shape (3, k, n)
    x_np = rng.integers(0, 1 << 62, (3, k_in, n), dtype=np.uint64) % qv
    x = jax.device_put(U.from_np_u64(x_np))

    def scalar(v):
        return v[0].reshape(-1)[0]

    def chain(label, step, init):
        us = chained_device_time_us(step, init, lo=4, hi=20, repeats=3)
        print(f"  {label:28s} {us:9.1f} us", flush=True)
        return us

    # -- current u128 path --------------------------------------------------
    def fbc_u128(c):
        out = R.fast_convert_array(c, conv)
        return serialize_dependency(scalar(out), c, x)

    # -- mxu digit-plane path ----------------------------------------------
    os.environ["SEAL_TPU_FBC"] = "mxu"
    def fbc_mxu(c):
        out = R.fast_convert_array(c, conv)
        return serialize_dependency(scalar(out), c, x)

    # verify parity first
    os.environ["SEAL_TPU_FBC"] = "u128"
    ref = U.to_np_u64(jax.jit(lambda c: R.fast_convert_array(c, conv))(x))
    os.environ["SEAL_TPU_FBC"] = "mxu"
    got = U.to_np_u64(jax.jit(lambda c: R.fast_convert_array(c, conv))(x))
    np.testing.assert_array_equal(ref, got)
    print("parity OK")

    os.environ["SEAL_TPU_FBC"] = "u128"
    chain("fbc u128", fbc_u128, x)
    os.environ["SEAL_TPU_FBC"] = "mxu"
    chain("fbc mxu", fbc_mxu, x)

    # full BEHZ tail both ways
    bskv = np.array(tool.base_Bsk.values, dtype=np.uint64)[:, None]
    joined_np = np.concatenate(
        [x_np, rng.integers(0, 1 << 62, (3, tool.base_Bsk.size, n), dtype=np.uint64) % bskv],
        axis=1,
    )
    joined = jax.device_put(U.from_np_u64(joined_np))

    def tail(c):
        out = R.fastbconv_sk(R.fast_floor(c, tool), tool)
        return serialize_dependency(scalar(out), c, joined)

    os.environ["SEAL_TPU_FBC"] = "u128"
    ref = U.to_np_u64(jax.jit(lambda c: R.fastbconv_sk(R.fast_floor(c, tool), tool))(joined))
    os.environ["SEAL_TPU_FBC"] = "mxu"
    got = U.to_np_u64(jax.jit(lambda c: R.fastbconv_sk(R.fast_floor(c, tool), tool))(joined))
    np.testing.assert_array_equal(ref, got)
    print("tail parity OK")

    os.environ["SEAL_TPU_FBC"] = "u128"
    chain("tail u128", tail, joined)
    os.environ["SEAL_TPU_FBC"] = "mxu"
    chain("tail mxu", tail, joined)


if __name__ == "__main__":
    main()
