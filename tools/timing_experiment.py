"""Reconcile per-dispatch slope timing vs in-dispatch chained timing.

Hypothesis (VERDICT weak #2): the slope harness issues one tunnel RPC per
op, so when the tunnel's enqueue rate is slower than device execution the
slope measures the tunnel, not the device — explaining the 43 vs 199 us
spread between driver and builder runs of the same bench.py.

This script times the flagship pipeline three ways on the live chip:
  1. per-dispatch slope (profiling.device_time_us, the round-1 method)
  2. in-dispatch chain: K pipeline iterations inside ONE jitted
     lax.fori_loop, serialized by a data dependency XLA cannot fold
     (a select keyed on an output value), slope over two K values
  3. dispatch-rate calibration: slope timing of a trivial jitted op
"""

import time

import jax
import jax.numpy as jnp
from functools import partial

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build
from seal_tpu.profiling import device_time_us, _force_fetch


def chain_time_us(fn, d1, d2, kc0, kc1, lo=4, hi=20, repeats=3):
    """Per-op device time from K-chained iterations inside one dispatch."""

    @partial(jax.jit, static_argnums=0)
    def chain(K, d1, d2, kc0, kc1):
        def body(i, carry):
            out = fn(carry, d2, kc0, kc1)
            # runtime-false, compile-opaque predicate: serializes iterations
            pred = out[0][0, 0, 0] == jnp.uint32(0x12345)
            return (jnp.where(pred, d2[0], carry[0]), jnp.where(pred, d2[1], carry[1]))

        return jax.lax.fori_loop(0, K, body, d1)

    def run(K):
        out = chain(K, d1, d2, kc0, kc1)
        _force_fetch(out)

    run(lo)  # compile both
    run(hi)

    def timed(K):
        t0 = time.perf_counter()
        run(K)
        return time.perf_counter() - t0

    t_lo = min(timed(lo) for _ in range(repeats))
    t_hi = min(timed(hi) for _ in range(repeats))
    return (t_hi - t_lo) / (hi - lo) * 1e6


def main():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ctx, fn, args = _build(8192, [60, 40, 40, 40, 60])
    tgt = jax.devices()[0]
    print("device:", tgt)
    args = jax.device_put(args, tgt)
    d1, d2, kc0, kc1 = args

    # 3. dispatch-rate calibration with a trivial op
    x = jax.device_put(jnp.arange(128, dtype=jnp.uint32), tgt)
    triv = jax.jit(lambda v: v + jnp.uint32(1))
    disp = device_time_us(triv, x, lo=3, hi=33, repeats=3)
    print(f"trivial-op per-dispatch slope: {disp:.1f} us  (= tunnel enqueue rate)")

    # 1. round-1 method
    jitted = jax.jit(fn)
    s = device_time_us(jitted, *args, lo=3, hi=13, repeats=3)
    print(f"per-dispatch slope (round-1 method): {s:.1f} us/op")

    # 2. in-dispatch chain
    c = chain_time_us(fn, d1, d2, kc0, kc1)
    print(f"in-dispatch chained fori_loop:       {c:.1f} us/op")


if __name__ == "__main__":
    main()
