"""Device-mesh and sharding configuration for multi-chip execution.

The reference is single-node (SURVEY.md §2.12); these are the new TPU-native
components that give the framework its multi-chip story:

  * ``host`` axis (optional, outermost): whole hosts over DCN — pure data
    parallelism; nothing in the op stream communicates across it.
  * ``batch`` axis: independent ciphertexts — data parallelism over ICI.
  * ``limb`` axis: RNS limbs — per-limb NTT/dyadic work is embarrassingly
    parallel; XLA GSPMD inserts collectives only at base-conversion and
    key-switch contraction points (the reduce-scatter/all-reduce rows of the
    §2.12 table).

Axis-to-fabric mapping: ``jax.devices()`` enumerates devices grouped by
process (host), so the OUTERMOST mesh dimension changes slowest across
the device list — placing the ``host`` axis first puts exactly the
inter-host (DCN) boundary there, and the inner (batch, limb) axes ride
ICI within a host.  That is the (host x data x limb) DCN-shaped
configuration of SCALING.md: all per-op collectives (limb axis) stay on
ICI; DCN carries nothing during evaluation.

Key placement: key-switch keys are either sharded over the limb axis
(decomposition-parallel contraction; an all-gather of (R, n) partials
joins the partial products) or **replicated** (``replicate_keys=True``,
the default for single-ciphertext latency-bound streams): each device
holds the full key, the target's D NTTs shard over limbs, and the only
collective is the final all-reduce of the inner product — the pattern
projected to >=80 % scaling efficiency in SCALING.md.

All sharding uses ``jax.sharding.NamedSharding`` over a named ``Mesh``; the
evaluator's jitted bodies are sharding-polymorphic, so the same traced code
runs single-chip or sharded.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class HEMesh:
    """A named device mesh with (host?, batch, limb) axes."""

    mesh: Mesh
    batch_axis: str = "data"
    limb_axis: str = "limb"
    host_axis: Optional[str] = None
    replicate_keys: bool = False

    @property
    def batch_size(self) -> int:
        b = self.mesh.shape[self.batch_axis]
        if self.host_axis:
            b *= self.mesh.shape[self.host_axis]
        return b

    @property
    def limb_size(self) -> int:
        return self.mesh.shape[self.limb_axis]

    @property
    def host_size(self) -> int:
        return self.mesh.shape[self.host_axis] if self.host_axis else 1

    def _batch_axes(self):
        if self.host_axis:
            return (self.host_axis, self.batch_axis)
        return self.batch_axis

    def ct_batch_spec(self) -> P:
        """(batch, size, k, n) ciphertext batches: batch over host x data."""
        return P(self._batch_axes(), None, self.limb_axis, None)

    def ct_spec(self) -> P:
        """(size, k, n) single ciphertexts: limbs sharded."""
        return P(None, self.limb_axis, None)

    def key_spec(self) -> P:
        """(D, k_key, n) key-switch keys: decomposition axis sharded, or
        fully replicated when ``replicate_keys`` (single-ct default)."""
        if self.replicate_keys:
            return P()
        return P(self.limb_axis, None, None)


def make_mesh(
    n_devices: Optional[int] = None,
    limb_parallel: int = 1,
    hosts: int = 1,
    axis_names: Tuple[str, ...] = ("data", "limb"),
    replicate_keys: bool = False,
) -> HEMesh:
    """Build a (data, limb) or (host, data, limb) mesh.

    ``hosts > 1`` adds the outermost DCN axis; on a real pod pass the
    process count (jax.process_count()).  On a virtual mesh it still
    produces the 3-axis program (the dryrun path), which is what pins the
    sharding/collective structure.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % (limb_parallel * hosts):
        raise ValueError("n_devices must be divisible by hosts * limb_parallel")
    if hosts > 1:
        names = ("host",) + tuple(axis_names)
        arr = np.array(devices[:n_devices]).reshape(
            hosts, n_devices // (hosts * limb_parallel), limb_parallel
        )
        return HEMesh(
            Mesh(arr, names), names[1], names[2], host_axis="host",
            replicate_keys=replicate_keys,
        )
    arr = np.array(devices[:n_devices]).reshape(
        n_devices // limb_parallel, limb_parallel
    )
    return HEMesh(
        Mesh(arr, axis_names), axis_names[0], axis_names[1],
        replicate_keys=replicate_keys,
    )


def _put(tree, sharding):
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(hem: HEMesh, ct_batch_data):
    """Place a batched ciphertext u64 pair (B, size, k, n) on the mesh."""
    return _put(ct_batch_data, NamedSharding(hem.mesh, hem.ct_batch_spec()))


def shard_kswitch_key(hem: HEMesh, key: dict) -> dict:
    sh = NamedSharding(hem.mesh, hem.key_spec())
    return {
        "c0": _put(key["c0"], sh),
        "c1": _put(key["c1"], sh),
        "seeds": key.get("seeds"),
    }


def replicate(hem: HEMesh, tree):
    return _put(tree, NamedSharding(hem.mesh, P()))
