"""Streamed on-device patch extraction.

The BASELINE north star: tile decoding stays host-side (native C++), but
everything after — patch-grid generation, annotation rasterization, tumor
labeling, tissue filtering — runs in ONE jitted XLA program on device,
instead of the reference's per-patch Python loop over PIL crops
(``src/main.py:682-726``).

Per slide level:

    host: decode level plane (native, threaded)  →  device:
      pad-to-grid (white)                 [main.py:658-665,701]
      reshape → (N, P, P, 3) patch grid   [main.py:682-686 order]
      rasterize polygons → mask           [main.py:372-410 semantics]
      any-pool → tumor/normal labels      [main.py:707-716]
      mean-reduce → tissue keep mask      [main.py:718-719]

Outputs are static-shape (full grid) plus a boolean keep mask; the host
compacts. Parity with the host pipeline is asserted at the label/keep level
(the only consumers of the mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    PAD_FILL_VALUE,
    TISSUE_MEAN_RGB_THRESHOLD,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (
    patch_labels_from_mask,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
    PatchGrid,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
    pad_polygons,
    polygons_to_mask_jax,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)

log = get_logger("data.streamed")


@functools.partial(
    jax.jit,
    static_argnames=("patch_size", "level_dims", "base_dims", "tissue_threshold"),
)
def _extract_kernel(
    plane_padded,  # (PH, PW, 3) uint8, already white-padded to the grid
    verts,  # (P, V, 2) float32 level-0 polygon vertices
    valid_polys,  # (P,) bool
    has_mask,  # scalar bool: False ⇒ all-normal (no annotation)
    patch_size: int,
    level_dims: tuple[int, int],
    base_dims: tuple[int, int],
    tissue_threshold: float,
):
    ph, pw = plane_padded.shape[:2]
    gh, gw = ph // patch_size, pw // patch_size

    # patch grid in reference x-major order: (gw*gh, P, P, 3)
    tiles = plane_padded.reshape(gh, patch_size, gw, patch_size, 3)
    patches = tiles.transpose(2, 0, 1, 3, 4).reshape(
        gw * gh, patch_size, patch_size, 3
    )

    # tissue filter (mean over all bytes ≤ threshold keeps the patch)
    means = jnp.mean(
        patches.astype(jnp.float32), axis=(1, 2, 3)
    )
    keep = means <= tissue_threshold

    # annotation mask → per-cell labels
    mask = polygons_to_mask_jax(verts, valid_polys, level_dims, base_dims)
    mask_padded = jnp.zeros((ph, pw), jnp.uint8)
    mask_padded = mask_padded.at[: mask.shape[0], : mask.shape[1]].set(mask)
    label_grid = patch_labels_from_mask(mask_padded, patch_size)  # (gh, gw)
    labels = label_grid.T.reshape(-1)  # x-major to match patch order
    labels = jnp.where(has_mask, labels, 0)

    return patches, labels.astype(jnp.int32), keep, means


def extract_patches_on_device(
    level_plane: np.ndarray,
    grid: PatchGrid,
    polygons_level0: list[np.ndarray],
    base_dims: tuple[int, int],
    tissue_threshold: float = TISSUE_MEAN_RGB_THRESHOLD,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the on-device extraction program for one slide level.

    Args:
        level_plane: (H, W, 3) uint8 decoded level plane (host).
        grid: the level's PatchGrid (stride == patch size).
        polygons_level0: tumor polygons in level-0 coords ([] ⇒ all normal).
        base_dims: (width, height) of level 0.

    Returns:
        (patches (M, P, P, 3) uint8, coords (M, 2) int32, labels (M,)) —
        compacted to tissue patches whose top-left lies inside the image,
        in reference order.
    """
    ps = grid.patch_size
    if grid.stride != ps:
        raise ValueError("on-device extraction covers the stride==size grid")
    ph, pw = grid.padded_height, grid.padded_width
    padded = np.full((ph, pw, 3), PAD_FILL_VALUE, np.uint8)
    padded[: grid.height, : grid.width] = level_plane

    verts, valid = pad_polygons(polygons_level0)
    has_mask = bool(polygons_level0)

    with Timer(f"extract_on_device[{grid.num_patches} cells]", log):
        patches, labels, keep, _means = _extract_kernel(
            jnp.asarray(padded),
            jnp.asarray(verts),
            jnp.asarray(valid),
            jnp.asarray(has_mask),
            patch_size=ps,
            level_dims=(grid.width, grid.height),
            base_dims=tuple(base_dims),
            tissue_threshold=float(tissue_threshold),
        )
        patches = np.asarray(patches)
        labels = np.asarray(labels)
        keep = np.asarray(keep)

    # coords for the full x-major grid, then drop out-of-image + non-tissue
    gh, gw = ph // ps, pw // ps
    xs = np.repeat(np.arange(gw, dtype=np.int32), gh) * ps
    ys = np.tile(np.arange(gh, dtype=np.int32), gw) * ps
    inside = (xs < grid.width) & (ys < grid.height)
    sel = keep & inside
    coords = np.stack([xs, ys], axis=1)[sel]
    return patches[sel], coords, labels[sel]
