"""Multi-host input feeding.

On a multi-host TPU slice each process sees only its local devices; global
batches are assembled with ``jax.make_array_from_process_local_data`` so
every host loads only its shard of the batch (SURVEY.md §2 "TPU-native
equivalents": the host data-loading side of the DP story). On a single host
this degrades to a plain sharded device_put, so the same trainer code runs
everywhere.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    DATA_AXIS,
)


def process_batch_slice(global_batch_size: int) -> slice:
    """The half-open row range of the global batch this process must load."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = global_batch_size // n_proc
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n_proc} processes"
        )
    return slice(idx * per, (idx + 1) * per)


def feed_global_batch(mesh: Mesh, tree: Any, axis: str = DATA_AXIS) -> Any:
    """Assemble a globally-sharded batch from **process-local** numpy data.

    Args:
        mesh: the device mesh (may span processes).
        tree: pytree of numpy arrays holding this process's rows only
            (``process_batch_slice`` of the global batch).
    Returns:
        pytree of jax Arrays sharded over the mesh's data axis with global
        shapes.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)
