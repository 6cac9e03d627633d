"""Negacyclic NTT / inverse NTT over u64-in-uint32 lanes (device).

TPU-first design: each butterfly stage is a static reshape
``(..., k, m, 2, gap)`` plus elementwise u64 ops — no gathers, no
bit-reversal permutation of the data (twiddle tables are stored so stage
slices are contiguous; see ``ntt_tables.py``).  Outputs land in the standard
"NTT form" (bit-reversed evaluation order), matching the reference's
convention (``util/dwthandler.h:94-356``) so NTT-domain representations are
bit-compatible.  Lazy Harvey reduction keeps values in [0, 4q) through the
forward stages and [0, 2q) through the inverse, exactly as the reference's
``ntt_negacyclic_harvey[_lazy]`` (``util/ntt.h:195-340``).

Shapes: data is (lo, hi) uint32 pairs of shape (..., k, n); all k RNS limbs
transform in one traced computation.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Tuple

import jax.numpy as jnp

from .. import debug
from ..ntt_tables import LimbTables
from . import u64 as U

U64 = U.U64

# ---------------------------------------------------------------------------
# Backend dispatch: four-step MXU kernel vs. XLA-fused butterfly stages
# ---------------------------------------------------------------------------
#
# The MXU four-step kernel (ops/mxu_ntt.py) is bit-identical to the staged
# butterflies below and 2-18x faster on TPU for n >= 2048 (measured v5e,
# docs/PERFORMANCE.md).  Dispatch is decided at trace time:
#   SEAL_TPU_NTT=mxu   force the matmul kernel (any backend; exact on CPU too)
#   SEAL_TPU_NTT=xla   force the staged-butterfly kernel
#   SEAL_TPU_NTT=auto  (default) matmul kernel on TPU backends for n >= 2048
# This is the reference's HEXL seam (util/ntt.cpp:149-223) done the TPU way.

_MXU_TABLE_CACHE = {}


def _mxu_tables_for(t: LimbTables):
    from ..modulus import Modulus
    from ..ntt_tables import build_mxu_tables

    scale = t.inv_scale or None
    key = (t.log_n, t.moduli_values, scale)
    mt = _MXU_TABLE_CACHE.get(key)
    if mt is None:
        mt = build_mxu_tables(
            t.log_n, [Modulus(v) for v in t.moduli_values], inv_scale=scale
        )
        _MXU_TABLE_CACHE[key] = mt
    return mt


# Auto-mode threshold for the fused Pallas kernel.  8192 is the default:
# under hardened min-of-5 chained-slope timing the fused kernel wins both
# standalone (18.9 vs 30.4 us, k=4 fwd) and inside the CKKS
# mult+relin+rescale pipeline (4697 vs 3459 ops/s, v5e; the round-4
# "pipeline regression" did not reproduce once the bench was robust to
# tunnel jitter).  Held in a ContextVar so a concurrent trace on another
# thread never sees a call site's override.
_AUTO_PALLAS_MIN_N = contextvars.ContextVar("seal_tpu_auto_pallas_min_n", default=8192)


@contextlib.contextmanager
def auto_pallas_min_n(n: int):
    """Trace-time override of the auto-mode Pallas threshold.

    Wrap the *invocation* of a jitted kernel (tracing happens on first
    call) whose composed graph is known to profit from the fused kernel at
    smaller n — e.g. the BEHZ multiply stages use ``auto_pallas_min_n(8192)``.
    Explicit SEAL_TPU_NTT=mxu|pallas|xla still forces globally.  The
    override is a ContextVar: it is scoped to the current thread/context,
    so a concurrent trace elsewhere keeps the default threshold.
    """
    token = _AUTO_PALLAS_MIN_N.set(n)
    try:
        yield
    finally:
        _AUTO_PALLAS_MIN_N.reset(token)


def _dispatch_mxu(t: LimbTables, n: int) -> str | None:
    """Pick the NTT backend: None (XLA butterflies), 'mxu' (einsum
    four-step) or 'pallas' (fused four-step kernel, ops/pallas_mxu_ntt.py).

    SEAL_TPU_NTT=xla|mxu|pallas forces; 'auto' (default) uses the einsum
    kernel on TPU for n in [2048, _AUTO_PALLAS_MIN_N) and the Pallas
    kernel above (measured v5e: 1.6x at 16384, 3.1x at 32768; the fused
    recombine keeps the 2P-1 int32 digit planes out of HBM).  BEHZ-shaped
    composed graphs lower the threshold to 8192 via ``auto_pallas_min_n``.
    """
    if not t.moduli_values or (1 << t.log_n) != n:
        return None
    mode = os.environ.get("SEAL_TPU_NTT", "auto")
    if mode in ("mxu", "pallas"):
        return mode
    if mode == "xla":
        return None
    if n < 2048:
        return None
    plat = _effective_platform()
    if plat == "cpu":
        return None
    # The Pallas kernel uses TPU memory spaces (pltpu.VMEM/SMEM) and only
    # compiles for TPU; other accelerators fall back to the portable einsum
    # formulation.
    return "pallas" if (n >= _AUTO_PALLAS_MIN_N.get() and plat == "tpu") else "mxu"


def _effective_platform() -> str:
    """Platform traced computations will execute on ('cpu'/'tpu'/...).

    ``jax.default_device(cpu)`` redirects placement without changing
    ``default_backend()`` — host-orchestrated paths (keygen, bench setup)
    use it inside accelerator processes, and compiled Pallas must not be
    traced for them (CPU supports interpret mode only)."""
    import jax

    dd = jax.config.jax_default_device
    if dd is not None:
        plat = getattr(dd, "platform", None)
        if plat is not None:
            return plat
    return jax.default_backend()


def _on_cpu() -> bool:
    return _effective_platform() == "cpu"


def _bcast_k1(lo, hi):
    """(k, 1) scalar constant -> (k, 1, 1) for stage-shaped broadcasting."""
    return lo[:, :, None], hi[:, :, None]


def _guard(x: U64, two_q: U64) -> U64:
    """Reduce from [0, 4q) to [0, 2q) with one conditional subtraction."""
    return U.select64(U.ge64(x, two_q), U.sub64(x, two_q), x)


def _recombine(a: U64, b: U64, lead, k: int, n: int) -> U64:
    lo = jnp.stack([a[0], b[0]], axis=-2).reshape(*lead, k, n)
    hi = jnp.stack([a[1], b[1]], axis=-2).reshape(*lead, k, n)
    return lo, hi


def ntt_forward(x: U64, t: LimbTables, lazy: bool = False) -> U64:
    """Forward negacyclic NTT; input coefficients in [0, 4q).

    Output in [0, q), or [0, 4q) when ``lazy`` (cf. reference
    ``ntt_negacyclic_harvey_lazy``).
    """
    lo, hi = x
    *lead, k, n = lo.shape
    logn = int(n).bit_length() - 1
    assert (1 << logn) == n
    if debug.enabled():
        tq_b = (t.two_q_lo, t.two_q_hi)  # (k, 1), broadcasts over coeffs
        debug.check_below(x, U.add64(tq_b, tq_b), "ntt_forward input < 4q (ntt.h:200-209)")
    backend = _dispatch_mxu(t, n)
    if backend == "pallas":
        from . import pallas_mxu_ntt

        return pallas_mxu_ntt.pallas_ntt_forward(x, _mxu_tables_for(t), interpret=_on_cpu())
    if backend == "mxu":
        from . import mxu_ntt

        return mxu_ntt.mxu_ntt_forward(x, _mxu_tables_for(t))
    tq = _bcast_k1(t.two_q_lo, t.two_q_hi)
    q3 = _bcast_k1(t.q_lo, t.q_hi)

    for s in range(logn):
        m = 1 << s
        gap = n >> (s + 1)
        shape = (*lead, k, m, 2, gap)
        lo_r = lo.reshape(shape)
        hi_r = hi.reshape(shape)
        x0 = (lo_r[..., 0, :], hi_r[..., 0, :])
        x1 = (lo_r[..., 1, :], hi_r[..., 1, :])
        r_op = (t.fwd_op_lo[:, m : 2 * m, None], t.fwd_op_hi[:, m : 2 * m, None])
        r_qt = (t.fwd_qt_lo[:, m : 2 * m, None], t.fwd_qt_hi[:, m : 2 * m, None])
        u = _guard(x0, tq)
        v = U.mul_mod_shoup_lazy(x1, r_op, r_qt, q3)
        a = U.add64(u, v)                    # < 4q
        b = U.sub64(U.add64(u, tq), v)       # u + 2q - v < 4q
        lo, hi = _recombine(a, b, lead, k, n)

    if not lazy:
        two_q = (t.two_q_lo, t.two_q_hi)
        q = (t.q_lo, t.q_hi)
        y = _guard((lo, hi), two_q)
        y = U.select64(U.ge64(y, q), U.sub64(y, q), y)
        if debug.enabled():
            debug.check_below(y, q, "ntt_forward output < q")
        return y
    if debug.enabled():
        tq_b = (t.two_q_lo, t.two_q_hi)
        debug.check_below((lo, hi), U.add64(tq_b, tq_b), "ntt_forward_lazy output < 4q")
    return lo, hi


def ntt_inverse(x: U64, t: LimbTables, lazy: bool = False) -> U64:
    """Inverse negacyclic NTT with 1/n fused into the last stage.

    Input in [0, 2q); output in [0, q), or [0, 2q) when ``lazy``.
    """
    lo, hi = x
    *lead, k, n = lo.shape
    logn = int(n).bit_length() - 1
    assert (1 << logn) == n
    if debug.enabled():
        debug.check_below(x, (t.two_q_lo, t.two_q_hi), "ntt_inverse input < 2q (ntt.h:298-307)")
    backend = _dispatch_mxu(t, n)
    if backend == "pallas":
        from . import pallas_mxu_ntt

        return pallas_mxu_ntt.pallas_ntt_inverse(x, _mxu_tables_for(t), interpret=_on_cpu())
    if backend == "mxu":
        from . import mxu_ntt

        return mxu_ntt.mxu_ntt_inverse(x, _mxu_tables_for(t))
    tq = _bcast_k1(t.two_q_lo, t.two_q_hi)
    q3 = _bcast_k1(t.q_lo, t.q_hi)

    offset = 1
    for s in range(logn):
        m = n >> (s + 1)
        gap = 1 << s
        last = m == 1
        shape = (*lead, k, m, 2, gap)
        lo_r = lo.reshape(shape)
        hi_r = hi.reshape(shape)
        x0 = (lo_r[..., 0, :], hi_r[..., 0, :])
        x1 = (lo_r[..., 1, :], hi_r[..., 1, :])
        if not last:
            r_op = (t.inv_op_lo[:, offset : offset + m, None], t.inv_op_hi[:, offset : offset + m, None])
            r_qt = (t.inv_qt_lo[:, offset : offset + m, None], t.inv_qt_hi[:, offset : offset + m, None])
            a = _guard(U.add64(x0, x1), tq)                      # < 2q
            b = U.mul_mod_shoup_lazy(U.sub64(U.add64(x0, tq), x1), r_op, r_qt, q3)  # < 2q
        else:
            # Final stage: fuse multiplication by n^{-1} (scalar branch of
            # the reference's transform_from_rev).
            invn_op = _bcast_k1(t.invn_op_lo, t.invn_op_hi)
            invn_qt = _bcast_k1(t.invn_qt_lo, t.invn_qt_hi)
            last_op = _bcast_k1(t.invn_last_op_lo, t.invn_last_op_hi)
            last_qt = _bcast_k1(t.invn_last_qt_lo, t.invn_last_qt_hi)
            u = _guard(x0, tq)
            v = x1
            a = U.mul_mod_shoup_lazy(_guard(U.add64(u, v), tq), invn_op, invn_qt, q3)
            b = U.mul_mod_shoup_lazy(U.sub64(U.add64(u, tq), v), last_op, last_qt, q3)
        lo, hi = _recombine(a, b, lead, k, n)
        offset += m

    if not lazy:
        q = (t.q_lo, t.q_hi)
        y = (lo, hi)
        y = U.select64(U.ge64(y, q), U.sub64(y, q), y)
        if debug.enabled():
            debug.check_below(y, q, "ntt_inverse output < q")
        return y
    if debug.enabled():
        debug.check_below((lo, hi), (t.two_q_lo, t.two_q_hi),
                          "ntt_inverse_lazy output < 2q")
    return lo, hi
