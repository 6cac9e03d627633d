"""Pallas fused NTT kernel vs the jnp reference implementation (interpret
mode on CPU; the TPU path is exercised by benchmarks)."""

import numpy as np
import pytest

from seal_tpu.modulus import CoeffModulus
from seal_tpu.ntt_tables import build_dense_stage_tables, build_limb_tables
from seal_tpu.ops import ntt as NTT
from seal_tpu.ops import pallas_ntt as PN
from seal_tpu.ops import u64 as U


def test_small_n_rejected():
    # The kernel's tile layout needs at least one full 128-lane row.
    n = 32
    mods = CoeffModulus.create(n, [40])
    t = build_dense_stage_tables(5, mods)
    x = U.from_np_u64(np.zeros((1, n), dtype=np.uint64))
    with pytest.raises(ValueError, match="at least 128"):
        PN.ntt_forward(x, t, interpret=True)


@pytest.mark.parametrize("log_n", [7, 8])
def test_pallas_matches_jnp(log_n):
    n = 1 << log_n
    mods = CoeffModulus.create(n, [40, 41, 42])
    t = build_dense_stage_tables(log_n, mods)
    lt = build_limb_tables(log_n, mods)
    rng = np.random.default_rng(log_n)
    a = np.stack([rng.integers(0, m.value, n, dtype=np.uint64) for m in mods])
    x = U.from_np_u64(a)

    want = U.to_np_u64(NTT.ntt_forward(x, lt))
    got = U.to_np_u64(PN.ntt_forward(x, t, interpret=True))
    assert (want == got).all()

    want_lazy = U.to_np_u64(NTT.ntt_forward(x, lt, lazy=True))
    got_lazy = U.to_np_u64(PN.ntt_forward(x, t, lazy=True, interpret=True))
    assert (want_lazy == got_lazy).all()

    xf = U.from_np_u64(want)
    want_i = U.to_np_u64(NTT.ntt_inverse(xf, lt))
    got_i = U.to_np_u64(PN.ntt_inverse(xf, t, interpret=True))
    assert (want_i == got_i).all()
    assert (want_i == a).all()
