"""Pallas inter-chip DMA corner turn for the distributed NTT (prototype).

The distributed four-step NTT (``parallel/dist_ntt.py``) exchanges data
across chips exactly once, at the transpose between the two matmul
stages.  The default exchange is ``lax.all_to_all`` — XLA schedules it as
a standalone collective between the stage kernels.  This module is the
hand-scheduled alternative the SCALING plan calls for: a Pallas kernel
that issues one ``pltpu.make_async_remote_copy`` RDMA per peer
(SNIPPETS.md pattern [1]), so the per-peer tiles start streaming over ICI
as soon as they are produced and can overlap the stage-B matmul epilogue.

STATUS: prototype — compiled/exercised only where >= 2 real TPU chips
share an ICI domain, which this dev environment (one tunneled chip) does
not provide; the math path and layout parity with the all_to_all
exchange are pinned by construction (identical block indexing), and
``tests/test_dist_ntt.py::test_remote_exchange_api`` guards the API
against drift.  Select with ``dist_ntt_forward(..., exchange="remote")``.

cf. the reference's single-node butterfly (util/dwthandler.h:94-191),
which has no cross-device story at all; SURVEY.md §2.12 distributed-NTT
row; SCALING.md exchange-overlap item.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2a_kernel(nperm, axis, in_ref, out_ref, send_sem, recv_sem):
    """Per-device body: send block j of my input to peer j's slot my_id.

    ``in_ref``: (k, P, rows_local, cols_local) HBM block-split source.
    ``out_ref``: (k, rows_local, P, cols_local) destination; peer j's tile
    lands at out[:, :, j].
    """
    my_id = lax.axis_index(axis)
    for j in range(nperm):
        copy = pltpu.make_async_remote_copy(
            src_ref=in_ref.at[:, j],
            dst_ref=out_ref.at[:, :, my_id],
            send_sem=send_sem.at[j],
            recv_sem=recv_sem.at[j],
            device_id=(j,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        copy.start()
    for j in range(nperm):
        pltpu.make_async_remote_copy(
            src_ref=in_ref.at[:, j],
            dst_ref=out_ref.at[:, :, my_id],
            send_sem=send_sem.at[j],
            recv_sem=recv_sem.at[j],
            device_id=(j,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait()


def remote_corner_turn(a: jnp.ndarray, axis: str, nper: int) -> jnp.ndarray:
    """(k, P, r, c) block-split local array -> (k, r, P, c) with block j
    exchanged to peer j — the RDMA twin of
    ``lax.all_to_all(a, axis, split_axis=1, concat_axis=2)``.

    Must be called inside the shard_map that owns ``axis``.
    """
    k, P_sz, r, c = a.shape
    kern = functools.partial(_a2a_kernel, P_sz, axis)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k, r, P_sz, c), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((P_sz,)),
            pltpu.SemaphoreType.DMA((P_sz,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(a)
