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
    d1, d2, kc0, kc1 = args

    from seal_tpu.profiling import chained_device_time_us, serialize_dependency

    # K pipeline iterations inside ONE dispatch, serialized by a
    # compile-opaque data dependency: per-dispatch timing through this
    # environment's tunneled TPU measures the tunnel's ~267 us enqueue
    # rate, not the device (see docs/PERFORMANCE.md "timing reconciliation")
    def step(carry):
        out = fn(carry, d2, kc0, kc1)
        return serialize_dependency(out[0][0, 0, 0], carry, d2)

    per_op_us = chained_device_time_us(step, d1, lo=4, hi=20, repeats=3)
    per_op = per_op_us / 1e6
    ops_per_sec = 1.0 / per_op if per_op > 0 else 0.0

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
