"""Device-mesh and sharding configuration for multi-chip execution.

The reference is single-node (SURVEY.md §2.12); these are the new TPU-native
components that give the framework its multi-chip story:

  * ``batch`` axis: independent ciphertexts — pure data parallelism over
    ICI/DCN, no communication.
  * ``limb`` axis: RNS limbs — per-limb NTT/dyadic work is embarrassingly
    parallel; XLA GSPMD inserts collectives only at base-conversion and
    key-switch contraction points (the reduce-scatter/all-reduce rows of the
    §2.12 table).

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
    """A named device mesh with (batch, limb) axes."""

    mesh: Mesh
    batch_axis: str = "data"
    limb_axis: str = "limb"

    @property
    def batch_size(self) -> int:
        return self.mesh.shape[self.batch_axis]

    @property
    def limb_size(self) -> int:
        return self.mesh.shape[self.limb_axis]

    def ct_batch_spec(self) -> P:
        """(batch, size, k, n) ciphertext batches."""
        return P(self.batch_axis, None, self.limb_axis, None)

    def ct_spec(self) -> P:
        """(size, k, n) single ciphertexts: limbs sharded."""
        return P(None, self.limb_axis, None)

    def key_spec(self) -> P:
        """(D, k_key, n) key-switch keys: decomposition axis sharded."""
        return P(self.limb_axis, None, None)


def make_mesh(
    n_devices: Optional[int] = None,
    limb_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "limb"),
) -> HEMesh:
    """Build a (data, limb) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % limb_parallel:
        raise ValueError("n_devices must be divisible by limb_parallel")
    arr = np.array(devices[:n_devices]).reshape(n_devices // limb_parallel, limb_parallel)
    return HEMesh(Mesh(arr, axis_names), axis_names[0], axis_names[1])


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
