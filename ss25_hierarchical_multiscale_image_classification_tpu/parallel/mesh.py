"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    num_devices: int | None = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """A 1-D (or reshaped N-D) mesh over the visible devices.

    For multi-host runs ``jax.devices()`` already spans all processes, so the
    same mesh covers the full slice; DCN-vs-ICI placement follows JAX's
    device ordering.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if len(axis_names) == 1:
        shape: tuple[int, ...] = (n,)
    else:
        # fill trailing axes greedily with powers of two
        shape = (n // np.prod([1]),)
        raise NotImplementedError(
            "multi-axis meshes are constructed explicitly by callers"
        )
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Device-put every array of a batch pytree with its leading dim sharded
    over the mesh's data axis (host→device boundary of the input pipeline)."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
