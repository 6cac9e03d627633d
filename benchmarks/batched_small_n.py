#!/usr/bin/env python3
"""Small-N batched throughput: proof that batching beats the dispatch floor.

At n=1024-2048 every single-ciphertext op is dispatch-floor-bound on TPU
(docs/PERFORMANCE.md "Small-N honesty"): the device does < 5 us of work
per op, so per-op wall-clock = the host->device dispatch round-trip and
single-op latency cannot beat a CPU.  The TPU answer is the batch axis:
ONE dispatch over B ciphertexts (BatchEvaluator).  This benchmark measures
BFV multiply (the default chain at these sizes is k=1, so multiply is the
representative op — no keyswitching exists below 2 primes):

* ``single_wall_us_per_ct``  — wall-clock of a B-iteration Evaluator loop
  (B dispatches), per ciphertext;
* ``batched_wall_us_per_ct`` — wall-clock of one BatchEvaluator.multiply
  over the same B ciphertexts (1 dispatch), per ciphertext;
* ``batched_dev_us_per_ct``  — in-dispatch chained device time of the
  batched op, per ciphertext (tunnel-independent device cost).

The wall-clock ratio is the dispatch-floor amortization (it includes this
environment's tunneled-dispatch cost and is larger here than on a PCIe
host, which is disclosed); the device number is the durable per-ct cost.

Usage: python benchmarks/batched_small_n.py [--sizes 1024,2048]
         [--batch 32] [--out BENCH_DETAIL.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(n, B):
    import jax

    from seal_tpu.context import SealContext
    from seal_tpu.encoders import BatchEncoder
    from seal_tpu.encryptor import Encryptor
    from seal_tpu.evaluator import Evaluator
    from seal_tpu.keygen import KeyGenerator
    from seal_tpu.modulus import CoeffModulus, PlainModulus, SecurityLevel
    from seal_tpu.params import EncryptionParameters, SchemeType
    from seal_tpu.parallel.batch import BatchEvaluator, CiphertextBatch
    from seal_tpu.profiling import chained_device_time_us, serialize_dependency

    cpu = jax.devices("cpu")[0]
    target = jax.devices()[0]
    with jax.default_device(cpu):
        parms = EncryptionParameters(SchemeType.BFV)
        parms.set_poly_modulus_degree(n)
        parms.set_plain_modulus(PlainModulus.batching(n, 20).value)
        parms.set_coeff_modulus(CoeffModulus.bfv_default(n))
        ctx = SealContext(parms, True, SecurityLevel.TC128)
        keygen = KeyGenerator(ctx)
        enc = Encryptor(ctx, secret_key=keygen.secret_key)
        be = BatchEncoder(ctx)
        pt = be.encode(list(range(n)))
        cts = [enc.encrypt_symmetric(pt) for _ in range(B)]

    for ct in cts:
        ct.data = jax.device_put(ct.data, target)

    ev = Evaluator(ctx, throw_on_transparent=False)
    bev = BatchEvaluator(ctx)
    batch = CiphertextBatch.from_ciphertexts(cts)

    # -- single-ciphertext loop: B dispatches per pass ----------------------
    def single_pass():
        outs = [ev.multiply(c, c) for c in cts]
        jax.block_until_ready([o.data for o in outs])

    single_pass()  # warm/compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        single_pass()
    single_wall = (time.perf_counter() - t0) / reps / B * 1e6

    # -- batched: ONE dispatch per pass -------------------------------------
    def batched_pass():
        out = bev.multiply(batch, batch)
        jax.block_until_ready(out.data)

    batched_pass()
    t0 = time.perf_counter()
    for _ in range(reps):
        batched_pass()
    batched_wall = (time.perf_counter() - t0) / reps / B * 1e6

    # -- batched device time (chained, dispatch-independent) ----------------
    def like(data):
        return CiphertextBatch(data, batch.parms_id, batch.is_ntt_form,
                               batch.scale, batch.correction_factor)

    def step(carry):
        prod = bev.multiply(like(carry), like(carry))
        return serialize_dependency(prod.data[0][0, 0, 0, 0], carry, batch.data)

    dev_us = chained_device_time_us(step, batch.data, lo=3, hi=11, repeats=3)

    return {
        "op": "bfv multiply",
        "batch": B,
        "single_wall_us_per_ct": round(single_wall, 1),
        "batched_wall_us_per_ct": round(batched_wall, 1),
        "batched_dev_us_per_ct": round(dev_us / B, 2),
        "wall_speedup": round(single_wall / batched_wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out", default="BENCH_DETAIL.json")
    args = ap.parse_args()

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    results = {}
    if os.path.exists(out_path):
        try:
            results = json.load(open(out_path))
        except Exception:
            results = {}
    for n in (int(s) for s in args.sizes.split(",")):
        res = bench(n, args.batch)
        results[f"batched_{n}"] = res
        print(json.dumps({"n": n, **res}))
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
