"""Device-mesh and sharding helpers.

The reference is strictly single-device (no torch.distributed anywhere; device
chosen once at train.py:37). On TPU the primary scaling axis for style
transfer is data parallelism — per-image work is independent — so the
framework shards the batch over a 1-D "data" mesh axis and replicates
parameters; XLA inserts the gradient psum over ICI automatically when the
jitted train step consumes a sharded batch with replicated params.

For the high-resolution (1024^2) configs a second "space" axis shards the
window grid (windows are independent within an attention phase); see
ops/attention.py and parallel/spatial.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a mesh over the first `num_devices` devices.

    Default is a 1-D data-parallel mesh; pass `shape` + two axis names
    (e.g. ("data", "space")) for hybrid batch x spatial sharding.
    """
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    if num_devices > len(devices):
        raise ValueError(
            f"requested {num_devices} devices but only {len(devices)} available")
    devices = devices[:num_devices]
    if shape is None:
        shape = (num_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != num_devices:
        raise ValueError(f"mesh shape {shape} != num_devices {num_devices}")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: shard dim 0 over `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of batch-leading arrays so dim 0 is sharded over `axis`."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, opt state) over the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
