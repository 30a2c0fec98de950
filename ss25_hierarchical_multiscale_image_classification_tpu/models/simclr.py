"""SimCLR model and NT-Xent loss, sharding-aware.

Rebuild of the reference SimCLR track (``src/models/simclr.py:14-54``):
ResNet18 encoder (fc = identity) + 2-layer MLP projector 512→512→128 and the
NT-Xent contrastive loss at τ=0.5.

TPU-first difference: the reference computes one (2N, 2N) similarity matrix
on a single process (DataParallel gathers activations to GPU0). Under SPMD
each device holds an (n, D) shard of both views, so :func:`nt_xent_loss`
optionally takes an ``axis_name`` and computes the **global** loss with an
``all_gather`` of projections over the mesh axis — each device evaluates only
its own 2n rows of the similarity matrix against all 2N columns, then means
across the axis. This is numerically identical to the reference's
single-matrix version (verified by tests on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18FeatureExtractor,
)

_NEG_INF = -1e9


class SimCLRModel(nn.Module):
    """Encoder + projection head (``src/models/simclr.py:14-29``).

    ``__call__`` returns projections (B, projection_dim);
    ``encode`` returns backbone features (B, 512) for downstream reuse.
    """

    projection_dim: int = 128
    projection_hidden_dim: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: str | None = None

    def setup(self):
        self.encoder = ResNet18FeatureExtractor(
            dtype=self.dtype, param_dtype=self.param_dtype, axis_name=self.axis_name
        )
        self.projector = nn.Sequential(
            [
                nn.Dense(self.projection_hidden_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype),
                nn.relu,
                nn.Dense(self.projection_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype),
            ]
        )

    def __call__(self, x, train: bool = False):
        h = self.encoder(x, train=train)
        z = self.projector(h.astype(self.dtype))
        return z.astype(jnp.float32)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train=train)


def _normalize(z, eps=1e-12):
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)


def nt_xent_loss(
    z_i,
    z_j,
    temperature: float = 0.5,
    axis_name: str | None = None,
    valid=None,
):
    """Normalized-temperature cross-entropy (``src/models/simclr.py:31-54``).

    Args:
        z_i, z_j: (n, D) projections of the two views — the **local shard**
            when ``axis_name`` is given, the full batch otherwise.
        temperature: τ (reference default 0.5).
        axis_name: mesh axis to all-gather over for the global loss.
        valid: optional (n,) bool mask of real examples in the (local) batch;
            False rows (e.g. a wrap-padded final batch) drop out of both the
            loss mean and every other row's softmax denominator.

    Returns:
        scalar loss (global mean over all valid 2N rows).
    """
    z_i = _normalize(z_i.astype(jnp.float32))
    z_j = _normalize(z_j.astype(jnp.float32))
    n = z_i.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid = valid.astype(bool)

    if axis_name is None:
        full_i, full_j = z_i, z_j
        full_valid = valid
        shard = 0
        num_shards = 1
    else:
        # (K, n, D) → (N, D); tiled=False keeps shard order by axis index
        full_i = jax.lax.all_gather(z_i, axis_name).reshape(-1, z_i.shape[-1])
        full_j = jax.lax.all_gather(z_j, axis_name).reshape(-1, z_j.shape[-1])
        full_valid = jax.lax.all_gather(valid, axis_name).reshape(-1)
        shard = jax.lax.axis_index(axis_name)
        num_shards = jax.lax.axis_size(axis_name)

    N = n * num_shards
    z_full = jnp.concatenate([full_i, full_j], axis=0)  # (2N, D)
    z_local = jnp.concatenate([z_i, z_j], axis=0)  # (2n, D)
    valid2_full = jnp.concatenate([full_valid, full_valid])  # (2N,)
    valid2_local = jnp.concatenate([valid, valid])  # (2n,)

    # global row indices of the local rows: [g, g+1, ..] and [N+g, ..]
    g = shard * n
    local_rows = jnp.concatenate(
        [g + jnp.arange(n), N + g + jnp.arange(n)]
    )  # (2n,)
    pos_cols = jnp.concatenate(
        [N + g + jnp.arange(n), g + jnp.arange(n)]
    )  # positive partner of each local row

    sim = (
        jnp.dot(z_local, z_full.T, preferred_element_type=jnp.float32)
        / temperature
    )  # (2n, 2N)
    cols = jnp.arange(2 * N)[None, :]
    dead = (cols == local_rows[:, None]) | ~valid2_full[None, :]
    sim = jnp.where(dead, _NEG_INF, sim)

    pos = jnp.take_along_axis(sim, pos_cols[:, None], axis=1)[:, 0]
    row_loss = jnp.where(
        valid2_local, -pos + jax.nn.logsumexp(sim, axis=1), 0.0
    )
    loss = jnp.sum(row_loss)
    n_valid = jnp.sum(valid2_local)  # local count; psum'd to the global count
    if axis_name is not None:
        loss = jax.lax.psum(loss, axis_name)
        n_valid = jax.lax.psum(n_valid, axis_name)
    return loss / jnp.maximum(n_valid, 1)
