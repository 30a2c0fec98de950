"""Classification losses and class-weight schemes.

Two weight formulas exist in the reference and both are preserved:

- default trainer (``src/main.py:485-490``):
  ``w_c = (1/count_c) / min_c(1/count_c)``
- strategy trainer (``src/main.py:549-552``):
  ``w_c = total / count_c``

Both give identical *gradient direction* (they differ by a scale), but the
scale changes the effective learning rate, so each trainer keeps its own.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def class_weights_inv_min(labels: np.ndarray, num_classes: int = 2) -> np.ndarray:
    """``(1/count)/min(1/count)`` (reference ``src/main.py:485-490``)."""
    counts = np.array(
        [max(int((labels == c).sum()), 1) for c in range(num_classes)], np.float64
    )
    w = 1.0 / counts
    return (w / w.min()).astype(np.float32)


def class_weights_total_over_count(
    labels: np.ndarray, num_classes: int = 2
) -> np.ndarray:
    """``total/count`` (reference ``src/main.py:549-552``)."""
    counts = np.array(
        [max(int((labels == c).sum()), 1) for c in range(num_classes)], np.float64
    )
    return (len(labels) / counts).astype(np.float32)


def weighted_cross_entropy(logits, labels, class_weights=None, valid=None):
    """Per-class-weighted softmax cross entropy with torch
    ``CrossEntropyLoss(weight=...)`` normalization semantics: the batch loss
    is ``Σ w_{y_i} ℓ_i / Σ w_{y_i}`` (weighted mean), so our numbers are
    comparable to the reference's printed losses.

    Args:
        logits: (B, C) float.
        labels: (B,) int.
        class_weights: (C,) float or None (plain mean).
        valid: (B,) {0,1} mask for padded batch rows.
    Returns:
        scalar loss.
    """
    logits = logits.astype(jnp.float32)
    log_probs = jnp.take_along_axis(
        logits - jnp.expand_dims(jnp.max(logits, axis=-1), -1), labels[:, None], axis=1
    )[:, 0] - (
        jnp.log(
            jnp.sum(
                jnp.exp(logits - jnp.expand_dims(jnp.max(logits, axis=-1), -1)),
                axis=-1,
            )
        )
    )
    nll = -log_probs  # (B,)

    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)[labels]
    else:
        w = jnp.ones_like(nll)
    if valid is not None:
        w = w * valid.astype(jnp.float32)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def accuracy(logits, labels, valid=None):
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    if valid is None:
        return jnp.mean(correct)
    v = valid.astype(jnp.float32)
    return jnp.sum(correct * v) / jnp.maximum(jnp.sum(v), 1.0)
