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


def balanced_mesh_shape(n: int, k: int) -> tuple:
    """Factor ``n`` devices into ``k`` mesh axes as evenly as possible.

    Greedy: each axis takes the divisor of the remaining count closest to the
    k-th root (e.g. 8 devices x 2 axes -> (2, 4); 12 x 2 -> (3, 4); a prime
    count falls back to (n, 1, ..., 1)).  The product is always exactly ``n``.
    """
    if k < 1 or n < 1:
        raise ValueError(f"Invalid mesh factorization: {n} devices, {k} axes")
    shape = []
    for axes_left in range(k, 1, -1):
        target = n ** (1.0 / axes_left)
        best = min(
            (d for d in range(1, n + 1) if n % d == 0),
            key=lambda d: abs(d - target),
        )
        shape.append(best)
        n //= best
    shape.append(n)
    return tuple(shape)


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """A 1-D (or reshaped n-D) mesh over the available devices.

    For multi-axis meshes the device count is factored with
    :func:`balanced_mesh_shape` (exact product, works for non-hypercube
    counts such as 8 devices x 2 axes -> (2, 4)); pass ``shape`` explicitly
    to control the layout (e.g. to align an axis with ICI topology).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"make_mesh(num_devices={num_devices}) but only "
                f"{len(devices)} device(s) are available -- a silently "
                "smaller mesh would make every sharding spec a no-op "
                "(on CPU, set XLA_FLAGS=--xla_force_host_platform_"
                "device_count=N BEFORE jax initializes)."
            )
        devices = devices[:num_devices]
    arr = np.asarray(devices)
    if shape is not None:
        shape = tuple(int(s) for s in shape)
        if len(shape) != len(axis_names):
            raise ValueError(
                f"shape {shape} has {len(shape)} axes, expected "
                f"{len(axis_names)} ({axis_names})"
            )
        if int(np.prod(shape)) != len(devices):
            raise ValueError(
                f"shape {shape} does not cover {len(devices)} devices"
            )
        arr = arr.reshape(shape)
    elif len(axis_names) > 1:
        arr = arr.reshape(balanced_mesh_shape(len(devices), len(axis_names)))
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
