"""Train state: params + optimizer + batch statistics."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with BatchNorm running statistics."""

    batch_stats: Any = None


def create_train_state(
    model,
    rng,
    input_shape: tuple[int, ...],
    tx: optax.GradientTransformation,
    pretrained_variables: dict | None = None,
) -> TrainState:
    """Initialize model variables (optionally merging a pretrained trunk —
    the reference's ImageNet/SimCLR encoder-reuse paths,
    ``src/models/resnet.py:27-31,63-65``) and wrap them in a TrainState."""
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if pretrained_variables:
        from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
            merge_trunk,
        )

        merged = merge_trunk(
            {"params": dict(params), "batch_stats": dict(batch_stats)},
            {
                "params": dict(pretrained_variables.get("params", {})),
                "batch_stats": dict(pretrained_variables.get("batch_stats", {})),
            },
        )
        # also adopt a matching head when the source provides one
        src_fc = pretrained_variables.get("params", {}).get("fc")
        if src_fc is not None and "fc" in params:
            tgt_fc = params["fc"]
            if all(
                src_fc[k].shape == tgt_fc[k].shape for k in tgt_fc
            ):
                merged["params"]["fc"] = src_fc
        params = merged["params"]
        batch_stats = merged["batch_stats"]

    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )
