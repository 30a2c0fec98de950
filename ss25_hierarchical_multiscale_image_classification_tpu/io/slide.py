"""Slide readers: the pyramidal WSI abstraction.

Replaces the reference's OpenSlide dependency (``src/main.py:27,650``) with a
small protocol plus three implementations:

- :class:`ArraySlide` — in-memory pyramid (tests, synthetic data).
- :class:`NpzSlide` — on-disk synthetic pyramid (.wsi.npz fixtures).
- :class:`TiffSlide` — native C++/libtiff tiled-BigTIFF decoder for real
  CAMELYON16 slides (see ``io/native``).

Coordinate conventions follow OpenSlide, which the reference relies on:
``read_region(location, level, size)`` takes ``location`` in **level-0**
pixels and ``size`` in **level** pixels, returning an (H, W, 3) uint8 RGB
array.
"""

from __future__ import annotations

import os
from typing import Protocol, Sequence, runtime_checkable

import numpy as np


@runtime_checkable
class Slide(Protocol):
    @property
    def level_count(self) -> int: ...

    @property
    def level_dimensions(self) -> Sequence[tuple[int, int]]: ...

    @property
    def level_downsamples(self) -> Sequence[float]: ...

    def read_region(
        self, location: tuple[int, int], level: int, size: tuple[int, int]
    ) -> np.ndarray: ...

    def close(self) -> None: ...


class ArraySlide:
    """A pyramid held as a list of (H, W, 3) uint8 arrays (level 0 first)."""

    def __init__(self, levels: Sequence[np.ndarray], properties: dict | None = None):
        if not levels:
            raise ValueError("ArraySlide needs at least one level")
        self._levels = [np.ascontiguousarray(lv, dtype=np.uint8) for lv in levels]
        base_h, base_w = self._levels[0].shape[:2]
        self._dims = [(lv.shape[1], lv.shape[0]) for lv in self._levels]
        self._downsamples = [base_w / lv.shape[1] for lv in self._levels]
        self.properties = dict(properties or {})

    @property
    def level_count(self) -> int:
        return len(self._levels)

    @property
    def level_dimensions(self) -> list[tuple[int, int]]:
        return list(self._dims)

    @property
    def level_downsamples(self) -> list[float]:
        return list(self._downsamples)

    def level_array(self, level: int) -> np.ndarray:
        return self._levels[level]

    def read_region(
        self, location: tuple[int, int], level: int, size: tuple[int, int]
    ) -> np.ndarray:
        """OpenSlide-convention region read; out-of-bounds area is white
        (the reference pads borders with white, ``src/main.py:700-703``;
        OpenSlide itself yields transparent-black, but the reference only
        ever reads in-bounds regions and pads explicitly)."""
        ds = self._downsamples[level]
        x0 = int(location[0] / ds)
        y0 = int(location[1] / ds)
        w, h = int(size[0]), int(size[1])
        lv = self._levels[level]
        out = np.full((h, w, 3), 255, dtype=np.uint8)
        x1, y1 = max(x0, 0), max(y0, 0)
        x2 = min(x0 + w, lv.shape[1])
        y2 = min(y0 + h, lv.shape[0])
        if x2 > x1 and y2 > y1:
            out[y1 - y0 : y2 - y0, x1 - x0 : x2 - x0] = lv[y1:y2, x1:x2]
        return out

    def close(self) -> None:
        pass


class NpzSlide(ArraySlide):
    """Synthetic pyramid persisted as ``.wsi.npz`` (keys level_0..level_N)."""

    def __init__(self, path: str):
        with np.load(path) as data:
            keys = sorted(
                (k for k in data.files if k.startswith("level_")),
                key=lambda k: int(k.split("_")[1]),
            )
            levels = [data[k] for k in keys]
        super().__init__(levels, properties={"path": path, "format": "npz"})


def save_npz_slide(
    path: str, levels: Sequence[np.ndarray], compress: bool = False
) -> None:
    """Write a pyramid container. Uncompressed by default: the synthetic
    fixtures' noise textures barely compress (DEFLATE ~2:1) but cost ~60 s
    per gigapixel-ish slide to deflate — fabricating the 60-slide FROC
    fixture set went from ~90 to ~7 s/slide. ``NpzSlide`` reads both."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = np.savez_compressed if compress else np.savez
    writer(
        path, **{f"level_{i}": np.asarray(lv, np.uint8) for i, lv in enumerate(levels)}
    )


def open_slide(path: str) -> Slide:
    """Open any supported slide container by extension."""
    if path.endswith(".npz"):
        return NpzSlide(path)
    if path.endswith((".tif", ".tiff")):
        from ss25_hierarchical_multiscale_image_classification_tpu.io.tiff_slide import (
            TiffSlide,
        )

        return TiffSlide(path)
    raise ValueError(f"Unsupported slide container: {path}")
