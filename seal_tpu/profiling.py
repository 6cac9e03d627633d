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
