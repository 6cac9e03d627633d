"""SEAL_TPU_DEBUG=1 assert mode — the reference's SEAL_DEBUG analog.

The reference compiles pervasive argument/range assertions into debug
builds (``#ifdef SEAL_DEBUG`` checks, e.g. ``util/ntt.h:200-209`` asserting
NTT operands < 4q, ``util/defines.h:66`` bounding lazy accumulation).  In
the TPU build those invariants live at jit-kernel seams; with
``SEAL_TPU_DEBUG=1`` every seam verifies its range contract on device and
raises host-side on violation.  Default-off: the checks are simply not
traced into the executable, so production kernels are unchanged.

Usage at a kernel seam::

    from .. import debug
    y = ...                         # e.g. lazy NTT output, contract [0, 4q)
    debug.check_below(y, four_q, "ntt_forward_lazy output < 4q")

CI runs a representative battery under SEAL_TPU_DEBUG=1 (the
``debug-asserts`` job in .github/workflows/ci.yml) so a kernel change
that breaks a range contract fails loudly instead of corrupting
downstream Barrett reductions.

Like the reference's SEAL_DEBUG, this is a *debug-build* feature: it needs
a backend with host-callback support (CPU, standard TPU runtimes).  Some
tunneled PJRT backends reject host callbacks; run the checks on the CPU
backend there (jax.config.update("jax_platforms", "cpu")).
"""

from __future__ import annotations

import os


def enabled() -> bool:
    """Whether SEAL_TPU_DEBUG assertions are active.

    Read from the environment on every call so the flag can be toggled
    after import (between tests, or mid-session).  Note that already-traced
    jit kernels are cached without the checks; clear the context jit caches
    (or use a fresh context) after enabling to get checked executables.
    """
    return os.environ.get("SEAL_TPU_DEBUG", "0") not in ("", "0")


class RangeError(AssertionError):
    pass


def _raise_if(bad, what: str):
    import numpy as np

    if np.any(np.asarray(bad)):
        raise RangeError(f"SEAL_TPU_DEBUG range violation: {what}")


def check_below(x, bound, what: str):
    """Assert every u64 lane-pair element of ``x`` is < ``bound``.

    ``x`` is a (lo, hi) u32 pair; ``bound`` a broadcastable (lo, hi) pair.
    No-op (not traced) unless SEAL_TPU_DEBUG=1.
    """
    if not enabled():
        return x
    import jax

    from .ops import u64 as U

    bad = U.ge64(x, bound)
    jax.debug.callback(_raise_if, bad, what)
    return x


def check_below_scalar(x, bound: int, what: str):
    """Same, with a Python-int bound (split into a u32 pair host-side)."""
    if not enabled():
        return x
    import jax.numpy as jnp

    b = (jnp.uint32(bound & 0xFFFFFFFF), jnp.uint32(bound >> 32))
    return check_below(x, b, what)
