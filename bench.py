#!/usr/bin/env python3
"""Benchmark: CKKS n=8192 ct*ct multiply+relinearize+rescale throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline is the reference (microsoft/SEAL) CPU time for
multiply+relinearize+rescale at the same parameters, recorded in
BASELINE_CPU.json (measured with the reference's 8_performance example on
this machine); vs_baseline = ours / reference (higher is better).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from __graft_entry__ import _build

    # Build context/keys/ciphertexts on CPU (host-heavy, eager small ops),
    # then ship the arrays to the accelerator for the timed jitted pipeline.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ctx, fn, args = _build(8192, [60, 40, 40, 40, 60])

    target = jax.devices()[0]
    args = jax.device_put(args, target)

    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)  # compile + warmup

    # time steady-state: chain iterations to avoid dispatch gaps
    iters = 10
    t0 = time.perf_counter()
    d1 = args[0]
    for _ in range(iters):
        out = jitted(d1, args[1], args[2], args[3])
    jax.block_until_ready(out)
    t1 = time.perf_counter()

    per_op = (t1 - t0) / iters
    ops_per_sec = 1.0 / per_op

    vs_baseline = 0.0
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_CPU.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        base_us = base.get("ckks_n8192_mult_relin_rescale_us")
        if base_us:
            vs_baseline = ops_per_sec / (1e6 / base_us)

    print(
        json.dumps(
            {
                "metric": "ckks_n8192_mult_relin_rescale_ops_per_sec",
                "value": round(ops_per_sec, 3),
                "unit": "ops/sec",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
