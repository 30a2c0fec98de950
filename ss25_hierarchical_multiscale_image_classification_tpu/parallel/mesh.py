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
    shape: Sequence[int] | None = None,
) -> Mesh:
    """A 1-D or N-D mesh over the visible devices.

    ``shape`` gives one extent per axis name and may contain a single -1
    to infer that extent from the device count (e.g. the fleet's
    two-level layout ``axis_names=("group", "data"), shape=(-1, 4)`` on 8
    devices builds a (2, 4) mesh). 1-D meshes need no shape. Device order
    is row-major over ``jax.devices()``, so the FASTEST-varying (last)
    axis spans ICI-adjacent chips — put the within-group/data axis last
    and collectives over it ride ICI.

    For multi-host runs ``jax.devices()`` already spans all processes, so
    the same mesh covers the full slice; DCN-vs-ICI placement follows
    JAX's device ordering.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if shape is None:
        if len(axis_names) != 1:
            raise ValueError(
                f"a {len(axis_names)}-axis mesh needs an explicit shape "
                f"(one extent per axis, a single -1 allowed)"
            )
        shape = (n,)
    shape = tuple(int(s) for s in shape)
    if len(shape) != len(axis_names):
        raise ValueError(
            f"shape {shape} must have one extent per axis name {axis_names}"
        )
    if sum(s == -1 for s in shape) > 1:
        raise ValueError(f"at most one -1 extent allowed, got {shape}")
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        if known == 0 or n % known:
            raise ValueError(
                f"cannot infer -1 in {shape}: {n} devices not divisible "
                f"by {known}"
            )
        shape = tuple(n // known if s == -1 else s for s in shape)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} needs {np.prod(shape)} devices, "
                         f"have {n}")
    return Mesh(np.asarray(devices).reshape(shape), tuple(axis_names))


def group_submeshes(mesh: Mesh, data_axis: str = DATA_AXIS) -> list[Mesh]:
    """Split a 2-D (group, data) mesh into per-group 1-D data meshes.

    XLA programs on disjoint device sets execute concurrently, so the
    fleet runs one independent mesh-sharded program per group while the
    overall layout stays expressed as ONE mesh (``make_mesh(axis_names=
    ("group", "data"), shape=(G, D))``)."""
    if mesh.devices.ndim != 2:
        raise ValueError(
            f"group_submeshes expects a 2-D (group, data) mesh, got shape "
            f"{mesh.devices.shape}"
        )
    return [Mesh(row, (data_axis,)) for row in mesh.devices]


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
