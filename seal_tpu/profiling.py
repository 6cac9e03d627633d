"""Profiling/observability hooks.

The reference has no tracing framework (SURVEY.md §5) — its observability is
the benchmark harness plus wall-clock loops.  The TPU build adds:

  * ``trace(path)`` — context manager around ``jax.profiler`` producing a
    Perfetto/TensorBoard trace of device execution;
  * ``op_timer`` — lightweight wall-clock timing of jitted ops with
    ``block_until_ready`` semantics (the benchmark harness's primitive);
  * ``compile_stats(context)`` — introspection of the per-context jit cache
    (how many op executables exist per level).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def op_timer(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Average wall-clock seconds per call of a device function."""
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _force_fetch(out):
    """Force device completion by pulling one element of one leaf to host.

    ``jax.block_until_ready`` is NOT a reliable completion barrier on
    remote/tunneled PJRT backends (observed on this environment's 'axon'
    TPU tunnel: enqueue is acknowledged before execution finishes, which
    made every op "run" in the ~40us RPC round-trip and inflated measured
    bandwidth past hardware limits).  A host fetch of any output element
    cannot complete before the computation does.
    """
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "ndim"):
            np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
            return
    jax.block_until_ready(out)


def device_time_us(fn: Callable, *args, lo: int = 3, hi: int = 13, repeats: int = 2) -> float:
    """Trustworthy per-call device time in microseconds.

    Runs ``fn(*args)`` in two batches of ``lo`` and ``hi`` back-to-back
    calls, each terminated by a host fetch (see ``_force_fetch``), and
    returns the slope ``(t_hi - t_lo) / (hi - lo)``: the fetch round-trip
    and per-batch dispatch overhead cancel, leaving steady-state device
    throughput — the number a non-tunneled production host would see.
    """
    out = fn(*args)
    _force_fetch(out)  # compile + warm

    def batch(iters: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _force_fetch(out)
        return time.perf_counter() - t0

    batch(lo)
    t_lo = min(batch(lo) for _ in range(repeats))
    t_hi = min(batch(hi) for _ in range(repeats))
    return max(0.0, (t_hi - t_lo) / (hi - lo)) * 1e6


def serialize_dependency(out_scalar_u32, primary, alternate):
    """Thread a false-at-runtime, compile-opaque dependency into ``primary``.

    Returns ``where(out_scalar == 0x12345, alternate, primary)`` per leaf —
    at runtime always ``primary`` (unchanged values), but XLA cannot fold
    the select, so an op chained through this cannot start before the
    previous op's output exists.  ``alternate`` must be a second, distinct
    valid input of the same structure (``where(p, x, x)`` folds to ``x``).
    """
    import jax
    import jax.numpy as jnp

    pred = out_scalar_u32 == jnp.uint32(0x12345)
    return jax.tree_util.tree_map(lambda p, a: jnp.where(pred, a, p), primary, alternate)


def chained_device_time_us(step, init, lo: int = 4, hi: int = 20, repeats: int = 3) -> float:
    """Per-op device time from K chained iterations inside ONE dispatch.

    ``step: carry -> carry`` must serialize iterations through a data
    dependency (see ``serialize_dependency``).  The whole K-iteration loop
    runs as a single ``lax.fori_loop`` under one jit, so per-dispatch host/
    tunnel overhead — which on this environment's tunneled TPU exceeds the
    device time of most ops (~267 us/dispatch measured) — cannot contaminate
    the measurement.  Slope between K=lo and K=hi cancels the single
    dispatch + fetch round-trip.  This supersedes ``device_time_us`` (one
    dispatch per op) for anything faster than ~1 ms/op.
    """
    import time as _time

    import jax
    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def chain(k, carry):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)

    def run(k):
        _force_fetch(chain(k, init))

    def timed(k):
        t0 = _time.perf_counter()
        run(k)
        return _time.perf_counter() - t0

    # the tunnel's dispatch+fetch round-trip has multi-ms jitter; grow the
    # chain span until the K-dependent signal clears it decisively
    min_signal_s = 20e-3
    for _ in range(6):
        run(lo)  # compile both executables before timing
        run(hi)
        t_lo = min(timed(lo) for _ in range(repeats))
        t_hi = min(timed(hi) for _ in range(repeats))
        signal = t_hi - t_lo
        if signal >= min_signal_s or hi - lo >= 4096:
            break
        factor = max(2, int(min_signal_s / max(signal, 1e-3)) + 1)
        hi = lo + min(4096, (hi - lo) * factor)
    return max(0.0, (t_hi - t_lo) / (hi - lo)) * 1e6


def chained_slope_samples(
    step,
    init,
    lo: int = 8,
    hi: int = 40,
    repeats: int = 3,
    samples: int = 5,
    min_signal_s: float = 0.08,
):
    """Several independent chained-slope measurements of per-op device time.

    Same single-dispatch ``lax.fori_loop`` chaining as
    ``chained_device_time_us``, but (a) the chain span is grown until the
    K-dependent signal is at least ``min_signal_s`` (default 80 ms — well
    clear of the tunnel's multi-ms dispatch jitter), and (b) ``samples``
    fully independent slope measurements are taken back to back.  Returns
    the list of per-op microsecond estimates; callers take ``min`` (the
    least-congested observation — tunnel interference only ever adds
    time) and report ``(max-min)/median`` as the spread.
    """
    import time as _time

    import jax
    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def chain(k, carry):
        return jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)

    def run(k):
        _force_fetch(chain(k, init))

    def timed(k):
        t0 = _time.perf_counter()
        run(k)
        return _time.perf_counter() - t0

    # Grow the span until the K-dependent signal decisively clears the
    # dispatch jitter, then hold it fixed for every sample.
    for _ in range(8):
        run(lo)
        run(hi)
        t_lo = min(timed(lo) for _ in range(repeats))
        t_hi = min(timed(hi) for _ in range(repeats))
        signal = t_hi - t_lo
        if signal >= min_signal_s or hi - lo >= 8192:
            break
        factor = max(2, int(min_signal_s / max(signal, 1e-3)) + 1)
        hi = lo + min(8192, (hi - lo) * factor)

    out = []
    for _ in range(samples):
        t_lo = min(timed(lo) for _ in range(repeats))
        t_hi = min(timed(hi) for _ in range(repeats))
        out.append(max(0.0, (t_hi - t_lo) / (hi - lo)) * 1e6)
    return out


def compile_stats(context) -> Dict[str, int]:
    """Count compiled op executables in a context's jit cache by op name."""
    stats: Dict[str, int] = {}
    for key in context._jit_cache:
        name = key[0] if isinstance(key, tuple) else str(key)
        stats[name] = stats.get(name, 0) + 1
    for cd_id, cd in getattr(context, "_context_data_map", {}).items():
        for key in cd._jit_cache:
            name = key[0] if isinstance(key, tuple) else str(key)
            stats[name] = stats.get(name, 0) + 1
    return stats
