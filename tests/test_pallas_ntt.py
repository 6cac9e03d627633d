"""Pallas fused four-step NTT: bit-exact parity with the einsum MXU kernel.

The Pallas kernel (ops/pallas_mxu_ntt.py) is the production default for
n >= 16384 on TPU; CPU CI exercises it in interpret mode here so kernel
regressions cannot ship silently.  Parity target is ``ops/mxu_ntt.py``,
which is itself parity-tested against the staged butterflies and the
reference Harvey NTT vectors (test_mxu_ntt.py, test_reference_vectors.py).
"""

import numpy as np
import pytest

from seal_tpu import numth
from seal_tpu.modulus import CoeffModulus, Modulus
from seal_tpu.ntt_tables import build_mxu_tables
from seal_tpu.ops import mxu_ntt as M
from seal_tpu.ops import pallas_mxu_ntt as PL
from seal_tpu.ops import u64 as U


def _rand_limbs(mods, n, rng, lead=()):
    qv = np.array([m.value for m in mods], dtype=np.uint64).reshape(
        (1,) * len(lead) + (-1, 1)
    )
    return rng.integers(0, 1 << 62, (*lead, len(mods), n)).astype(np.uint64) % qv


def test_pallas_forward_inverse_parity_interpret():
    n, logn = 2048, 11
    mods = CoeffModulus.create(n, [43, 43, 44])
    mt = build_mxu_tables(logn, mods)
    rng = np.random.default_rng(21)
    vals = _rand_limbs(mods, n, rng)
    x = U.from_np_u64(vals)
    ref_f = U.to_np_u64(M.mxu_ntt_forward(x, mt))
    got_f = U.to_np_u64(PL.pallas_ntt_forward(x, mt, interpret=True))
    np.testing.assert_array_equal(ref_f, got_f)
    xf = U.from_np_u64(ref_f)
    ref_i = U.to_np_u64(M.mxu_ntt_inverse(xf, mt))
    got_i = U.to_np_u64(PL.pallas_ntt_inverse(xf, mt, interpret=True))
    np.testing.assert_array_equal(ref_i, got_i)
    np.testing.assert_array_equal(ref_i, vals)  # roundtrip closes


def test_pallas_61bit_chunked_contraction_interpret():
    """61-bit moduli with a 128-wide stage-B contraction force kchunk < K
    (the split-accumulation overflow guard) inside the kernel."""
    n, logn = 2048, 11
    mods = [Modulus(p) for p in numth.get_primes(2 * n, 61, 2)]
    mt = build_mxu_tables(logn, mods, n2=128)
    assert mt.n2 == 128 and mt.kchunk_b < 128  # chunked branch is exercised
    rng = np.random.default_rng(22)
    vals = _rand_limbs(mods, n, rng)
    x = U.from_np_u64(vals)
    np.testing.assert_array_equal(
        U.to_np_u64(M.mxu_ntt_forward(x, mt)),
        U.to_np_u64(PL.pallas_ntt_forward(x, mt, interpret=True)),
    )
    f = U.from_np_u64(U.to_np_u64(M.mxu_ntt_forward(x, mt)))
    np.testing.assert_array_equal(
        U.to_np_u64(M.mxu_ntt_inverse(f, mt)),
        U.to_np_u64(PL.pallas_ntt_inverse(f, mt, interpret=True)),
    )


def test_pallas_leading_axes_interpret():
    """Leading (poly) axes ride the kernel grid's first dimension."""
    n, logn = 2048, 11
    mods = CoeffModulus.create(n, [45, 46])
    mt = build_mxu_tables(logn, mods)
    rng = np.random.default_rng(23)
    vals = _rand_limbs(mods, n, rng, lead=(3,))
    x = U.from_np_u64(vals)
    np.testing.assert_array_equal(
        U.to_np_u64(M.mxu_ntt_forward(x, mt)),
        U.to_np_u64(PL.pallas_ntt_forward(x, mt, interpret=True)),
    )


def test_auto_dispatch_requires_tpu_for_pallas(monkeypatch):
    """In 'auto' mode only the TPU backend may pick the Pallas kernel —
    other accelerators (GPU) must fall back to the portable einsum path
    (the kernel uses pltpu memory spaces and cannot compile elsewhere)."""
    from seal_tpu.ntt_tables import build_limb_tables
    from seal_tpu.ops import ntt as NTT

    monkeypatch.setenv("SEAL_TPU_NTT", "auto")
    lt16 = build_limb_tables(14, CoeffModulus.create(16384, [50, 50]))
    lt8 = build_limb_tables(13, CoeffModulus.create(8192, [50, 50]))
    monkeypatch.setattr(NTT, "_effective_platform", lambda: "gpu")
    assert NTT._dispatch_mxu(lt16, 16384) == "mxu"
    monkeypatch.setattr(NTT, "_effective_platform", lambda: "tpu")
    assert NTT._dispatch_mxu(lt16, 16384) == "pallas"
    lt4 = build_limb_tables(12, CoeffModulus.create(4096, [50, 50]))
    assert NTT._dispatch_mxu(lt8, 8192) == "pallas"  # default threshold 8192
    assert NTT._dispatch_mxu(lt4, 4096) == "mxu"
    # composed call sites can lower the auto threshold locally
    with NTT.auto_pallas_min_n(4096):
        assert NTT._dispatch_mxu(lt4, 4096) == "pallas"
    assert NTT._dispatch_mxu(lt4, 4096) == "mxu"
    monkeypatch.setattr(NTT, "_effective_platform", lambda: "cpu")
    assert NTT._dispatch_mxu(lt16, 16384) is None
