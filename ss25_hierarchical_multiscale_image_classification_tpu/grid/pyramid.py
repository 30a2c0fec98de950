"""Hierarchical multiscale patch-grid arithmetic.

Pure, shape-static functions mirroring the reference's extraction grid
(``src/main.py:614,658-703``): per-level patch sizes {0:1792, 1:896, 2:448,
3:224}, stride = patch size, pad-to-grid, and level↔level-0 coordinate maps.
Everything here is plain integer math usable from host code and inside jitted
functions alike.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    PATCH_SIZES,
)


def patch_size_for_level(level: int, default: int = 224) -> int:
    """Per-level patch edge length (reference ``src/main.py:613-615``)."""
    return PATCH_SIZES.get(level, default)


def padded_extent(extent: int, patch_size: int) -> int:
    """Smallest multiple of ``patch_size`` >= ``extent``
    (reference ``src/main.py:658-663``)."""
    pad = (patch_size - extent % patch_size) % patch_size
    return extent + pad


@dataclasses.dataclass(frozen=True)
class PatchGrid:
    """The stride-grid covering one slide level.

    Coordinates are **level-space pixels** of the patch top-left corner, as in
    the reference's ``f"{prefix}_x{x}_y{y}_{label}.png"`` naming
    (``src/main.py:722``). Grid positions whose top-left corner falls outside
    the unpadded image are excluded (``src/main.py:685-686``); border patches
    are white-padded to full size by the extraction stage.
    """

    level: int
    width: int  # level-space width
    height: int  # level-space height
    downsample: float  # level-0 pixels per level pixel
    patch_size: int
    stride: int

    @classmethod
    def for_slide_level(
        cls,
        level: int,
        level_dims: tuple[int, int],
        downsample: float,
        stride: int | None = None,
    ) -> "PatchGrid":
        ps = patch_size_for_level(level)
        return cls(
            level=level,
            width=level_dims[0],
            height=level_dims[1],
            downsample=downsample,
            patch_size=ps,
            stride=stride or ps,
        )

    @property
    def padded_width(self) -> int:
        return padded_extent(self.width, self.patch_size)

    @property
    def padded_height(self) -> int:
        return padded_extent(self.height, self.patch_size)

    @property
    def nx(self) -> int:
        """Number of grid columns with top-left inside the image
        (= positions 0, stride, 2·stride, ... strictly below width)."""
        return -(-self.width // self.stride)

    @property
    def ny(self) -> int:
        return -(-self.height // self.stride)

    @property
    def num_patches(self) -> int:
        return self.nx * self.ny

    def coords(self) -> Iterator[tuple[int, int]]:
        """Yield (x, y) level-space top-left corners in reference order:
        outer loop over x, inner over y (``src/main.py:682-686``)."""
        for x in range(0, self.padded_width, self.stride):
            if x >= self.width:
                continue
            for y in range(0, self.padded_height, self.stride):
                if y >= self.height:
                    continue
                yield x, y

    def coords_array(self) -> np.ndarray:
        """All (x, y) corners as an (N, 2) int32 array, reference order."""
        out = np.array(list(self.coords()), dtype=np.int32)
        return out.reshape(-1, 2)

    def level0_origin(self, x: int, y: int) -> tuple[int, int]:
        """Map a level-space corner to the level-0 pixel origin used for
        region reads (reference ``src/main.py:693``)."""
        return int(x * self.downsample), int(y * self.downsample)

    def valid_patch_extent(self, x: int, y: int) -> tuple[int, int]:
        """(w, h) of the in-bounds part of the patch at (x, y)
        (reference ``src/main.py:688-689``)."""
        return (
            min(self.patch_size, self.width - x),
            min(self.patch_size, self.height - y),
        )

    def coverage_loss_without_padding(self) -> float:
        """Fraction of slide area NOT covered when truncating instead of
        padding — the analytical check of ``02_patch_extraction.ipynb`` cell 2
        (≈1.26% for a 97792x221184 slide with 1792² patches)."""
        covered_w = (self.width // self.patch_size) * self.patch_size
        covered_h = (self.height // self.patch_size) * self.patch_size
        total = self.width * self.height
        return 1.0 - (covered_w * covered_h) / total
