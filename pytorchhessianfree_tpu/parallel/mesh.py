"""Device-mesh construction helpers.

The reference has no distributed runtime at all -- its only batch-scaling
mechanism is the sequential ``acc_step`` accumulator
(reference optimizer.py:519-606, SURVEY.md 2.3).  The TPU-native upgrade is a
``jax.sharding.Mesh`` over ICI: gradient / loss / curvature-matvec
accumulation are linear reductions, so sharding the batch across a ``data``
axis and letting XLA insert ``psum``s reproduces acc_step's weighted sums
exactly, in parallel.  The mesh is built 1-D by default but with named axes
left open for future tensor/pipeline extensions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """A 1-D (or reshaped n-D) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        side = round(len(devices) ** (1.0 / len(axis_names)))
        arr = arr.reshape((side,) * len(axis_names))
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a batch pytree with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
