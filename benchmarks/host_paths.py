#!/usr/bin/env python3
"""Tunnel-independent timing of the host-boundary encode/decode paths.

encode/decode/encrypt/decrypt involve host work (complex FFT, CRT compose,
PRNG expansion) plus a host->device transfer.  On this environment the
transfer rides a ~1 MB/s dev tunnel that swamps everything, so BENCH_DETAIL's
*_host rows say nothing about the actual host compute.  This script times
the pure host compute with the device left out entirely (JAX on CPU,
eager numpy paths), giving the number a production host (PCIe DMA, GB/s)
would approach.

Rows are merged into BENCH_DETAIL.json under "<scheme>_<n>"."<op>_host_cpu".

Usage: python benchmarks/host_paths.py [--sizes 8192,32768]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wall_us(fn, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192,32768")
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from seal_tpu.context import SealContext
    from seal_tpu.ckks_encoder import CKKSEncoder
    from seal_tpu.decryptor import Decryptor
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType

    results = {}
    if os.path.exists(args.out):
        try:
            results = json.load(open(args.out))
        except Exception:
            results = {}

    baseline = {}
    bp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE_CPU.json")
    if os.path.exists(bp):
        baseline = json.load(open(bp))

    for n in (int(s) for s in args.sizes.split(",")):
        for scheme_name in ("ckks", "bfv"):
            scheme = SchemeType.CKKS if scheme_name == "ckks" else SchemeType.BFV
            parms = EncryptionParameters(scheme)
            parms.set_poly_modulus_degree(n)
            parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
            if scheme != SchemeType.CKKS:
                parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
            ctx = SealContext(parms, True, SecurityLevel.TC128)
            kg = KeyGenerator(ctx)
            enc = Encryptor(ctx, secret_key=kg.secret_key)
            dec = Decryptor(ctx, kg.secret_key)
            row = results.setdefault(f"{scheme_name}_{n}", {})
            base = baseline.get(scheme_name, {}).get(str(n), {})

            if scheme == SchemeType.CKKS:
                encoder = CKKSEncoder(ctx)
                scale = 2.0 ** 40
                vals = np.linspace(0, 1, n // 2)
                pt = encoder.encode(vals, scale)
                row["encode_host_cpu"] = _wall_us(lambda: encoder.encode(vals, scale), 3)
                row["decode_host_cpu"] = _wall_us(lambda: encoder.decode(pt), 3)
            else:
                encoder = BatchEncoder(ctx)
                vals = list(range(n))
                pt = encoder.encode(vals)
                row["encode_host_cpu"] = _wall_us(lambda: encoder.encode(vals), 3)
                row["decode_host_cpu"] = _wall_us(lambda: encoder.decode(pt), 3)
            # encrypt/decrypt are DEVICE pipelines; timing them on the CPU
            # backend measures XLA-CPU running TPU-shaped kernels, not a
            # host path — the device numbers live in the chained rows.

            for op in ("encode", "decode"):
                us = row[f"{op}_host_cpu"]
                b = base.get(op)
                sp = f"  {b / us:6.1f}x vs ref-CPU" if b else ""
                print(f"{scheme_name} n={n} {op}_host_cpu {us:12.1f} us{sp}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
