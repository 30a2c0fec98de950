"""Parallelism: device meshes, shardings, and collective helpers.

The reference's entire distribution story is single-process
``nn.DataParallel`` over ≤4 GPUs (``src/main.py:481-482``). Here parallelism
is SPMD over a ``jax.sharding.Mesh``: batches are sharded along the ``data``
axis, parameters are replicated, and XLA inserts the gradient all-reduces
(and the NT-Xent all-gather) over ICI. Multi-host runs use the standard JAX
distributed runtime with the same code path.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
