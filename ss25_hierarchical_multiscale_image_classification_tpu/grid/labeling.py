"""Patch labeling and tissue filtering.

Reference semantics (``src/main.py:707-719``):
- a patch is **tumor** iff any mask pixel > 0 inside its window, else normal;
  slides without an annotation XML are all-normal;
- a patch is **background** (skipped) iff its mean RGB value > 240, evaluated
  on the white-padded patch.

Host (numpy) versions feed the extraction pipeline; jittable versions feed the
streamed on-device pipeline and the Pallas-accelerated path.
"""

from __future__ import annotations

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    TISSUE_MEAN_RGB_THRESHOLD,
)

LABEL_NORMAL = 0
LABEL_TUMOR = 1
LABEL_NAMES = {LABEL_NORMAL: "normal", LABEL_TUMOR: "tumor"}


# ---------------------------------------------------------------------------
# Host versions
# ---------------------------------------------------------------------------


def is_tissue_host(patch: np.ndarray, threshold: float = TISSUE_MEAN_RGB_THRESHOLD) -> bool:
    """True when the patch contains tissue (mean RGB <= threshold),
    matching ``np.mean(patch_array) > 240 → skip`` (``src/main.py:718``)."""
    return float(np.mean(patch)) <= threshold


def patch_labels_from_mask_host(
    mask: np.ndarray | None,
    coords: np.ndarray,
    patch_size: int,
) -> np.ndarray:
    """Labels for patches at level-space ``coords`` (N, 2) given a (H, W)
    mask (0/255) already padded to the grid, or None (no annotation → all
    normal, ``src/main.py:713-716``)."""
    n = len(coords)
    if mask is None:
        return np.full((n,), LABEL_NORMAL, dtype=np.int32)
    labels = np.empty((n,), dtype=np.int32)
    H, W = mask.shape
    for i, (x, y) in enumerate(coords):
        window = mask[y : y + patch_size, x : x + patch_size]
        labels[i] = LABEL_TUMOR if np.any(window > 0) else LABEL_NORMAL
    return labels


# ---------------------------------------------------------------------------
# Jittable versions
# ---------------------------------------------------------------------------


def is_tissue(patches, threshold: float = TISSUE_MEAN_RGB_THRESHOLD):
    """Jittable tissue filter over a batch of patches.

    Args:
        patches: (N, H, W, 3) uint8 (or float) patch batch.
    Returns:
        (N,) bool — True where the patch is tissue (kept).
    """
    import jax.numpy as jnp

    means = jnp.mean(patches.astype(jnp.float32), axis=(1, 2, 3))
    return means <= threshold


def patch_labels_from_mask(mask, patch_size: int):
    """Jittable any-pool labeling of a full grid.

    Args:
        mask: (H, W) mask, H and W multiples of ``patch_size`` (pad first).
    Returns:
        (H // patch_size, W // patch_size) int32 grid of {0, 1} labels
        indexed [row, col] i.e. [y_idx, x_idx].
    """
    import jax.numpy as jnp

    H, W = mask.shape
    gh, gw = H // patch_size, W // patch_size
    tiles = mask.reshape(gh, patch_size, gw, patch_size)
    any_pos = jnp.any(tiles > 0, axis=(1, 3))
    return any_pos.astype(jnp.int32)
