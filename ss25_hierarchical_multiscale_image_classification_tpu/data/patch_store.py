"""Patch stores: PNG-per-patch (reference-compatible) and packed memmap.

The reference materializes every patch as a PNG (``src/main.py:722-726``) —
~90k small files per level, decoded one-by-one on loader workers. The packed
store instead appends fixed-size uint8 tensors to one file per slide,
memmap-readable with zero decode cost, which is what a TPU input pipeline
wants: big contiguous gathers feeding host→device transfer.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
    PatchRecord,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (
    LABEL_NAMES,
)


class PngPatchWriter:
    """Writes the reference's one-PNG-per-patch layout
    (``patches/level_{L}/{slide}/{slide}_x{x}_y{y}_{label}.png``)."""

    def __init__(self, patches_dir: str, level: int, slide: str):
        self.level = level
        self.slide = slide
        self.dir = os.path.join(patches_dir, f"level_{level}", slide)
        os.makedirs(self.dir, exist_ok=True)

    def write(self, patch: np.ndarray, x: int, y: int, label: int) -> PatchRecord:
        from PIL import Image

        name = f"{self.slide}_x{x}_y{y}_{LABEL_NAMES[label]}.png"
        path = os.path.join(self.dir, name)
        if not os.path.exists(path):  # idempotent, src/main.py:724-726
            Image.fromarray(patch).save(path)
        return PatchRecord(
            slide=self.slide, level=self.level, x=x, y=y,
            label=label, store="png", path=path,
        )

    def close(self) -> None:
        pass


class PackedPatchWriter:
    """Appends patches to ``patches/level_{L}/{slide}.pack`` as raw
    (N, P, P, 3) uint8; shape goes in a sidecar ``.shape`` file."""

    def __init__(self, patches_dir: str, level: int, slide: str, patch_size: int):
        self.level = level
        self.slide = slide
        self.patch_size = patch_size
        level_dir = os.path.join(patches_dir, f"level_{level}")
        os.makedirs(level_dir, exist_ok=True)
        self.path = os.path.join(level_dir, f"{slide}.pack")
        self._f = open(self.path, "wb")
        self._count = 0

    def write(self, patch: np.ndarray, x: int, y: int, label: int) -> PatchRecord:
        patch = np.ascontiguousarray(patch, dtype=np.uint8)
        expected = (self.patch_size, self.patch_size, 3)
        if patch.shape != expected:
            raise ValueError(f"patch shape {patch.shape} != {expected}")
        self._f.write(patch.tobytes())
        rec = PatchRecord(
            slide=self.slide, level=self.level, x=x, y=y,
            label=label, store="packed", path=self.path, row=self._count,
        )
        self._count += 1
        return rec

    def write_batch(
        self, patches: np.ndarray, coords: np.ndarray, labels: np.ndarray
    ) -> list[PatchRecord]:
        """Vectorized append of (N, P, P, 3) patches with (N, 2) coords."""
        patches = np.ascontiguousarray(patches, dtype=np.uint8)
        self._f.write(patches.tobytes())
        recs = [
            PatchRecord(
                slide=self.slide, level=self.level,
                x=int(coords[i, 0]), y=int(coords[i, 1]),
                label=int(labels[i]), store="packed",
                path=self.path, row=self._count + i,
            )
            for i in range(len(patches))
        ]
        self._count += len(patches)
        return recs

    def close(self) -> None:
        self._f.close()
        with open(self.path + ".shape", "w") as f:
            f.write(f"{self._count} {self.patch_size} {self.patch_size} 3\n")
        if self._count == 0:
            os.remove(self.path)
            os.remove(self.path + ".shape")


class PatchReader:
    """Random-access reader over a manifest, transparent to store format.

    Packed files are memmapped once and cached; PNG records decode via PIL.
    ``read_batch`` optionally resizes to a target edge (the reference resizes
    everything to 224 on host before batching, ``src/main.py:417-425``).
    """

    def __init__(self, manifest: PatchManifest):
        self.manifest = manifest
        self._mmaps: dict[str, np.ndarray] = {}

    def _mmap(self, path: str) -> np.ndarray:
        mm = self._mmaps.get(path)
        if mm is None:
            with open(path + ".shape") as f:
                shape = tuple(int(v) for v in f.read().split())
            mm = np.memmap(path, dtype=np.uint8, mode="r", shape=shape)
            self._mmaps[path] = mm
        return mm

    def read(self, index: int) -> np.ndarray:
        rec = self.manifest[index]
        if rec.store == "packed":
            return np.asarray(self._mmap(rec.path)[rec.row])
        from PIL import Image

        with Image.open(rec.path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def read_batch(
        self, indices: Sequence[int], resize_to: int | None = None,
        s2d: bool = False,
    ) -> np.ndarray:
        """Batch gather. Packed-store rows coming from one pack file go
        through the native OpenMP gather (one memcpy sweep) instead of a
        per-index Python loop — the host half of the input pipeline.

        ``s2d=True`` emits the stem's space-to-depth layout
        (B, edge/2, edge/2, 12): when no resize is needed the native
        gather writes it directly (same bytes, different addresses — free
        relative to the plain gather), feeding the int8 inference path
        with no on-device transpose."""
        indices = [int(i) for i in indices]
        recs = [self.manifest[i] for i in indices]
        all_packed = bool(recs) and all(r.store == "packed" for r in recs)

        def packed_gather(gather_fn):
            imgs = [None] * len(recs)
            by_path: dict[str, list[int]] = {}
            for pos, r in enumerate(recs):
                by_path.setdefault(r.path, []).append(pos)
            for path, positions in by_path.items():
                store = self._mmap(path)
                rows = np.array([recs[p].row for p in positions], np.int64)
                gathered = gather_fn(np.asarray(store), rows)
                for j, p in enumerate(positions):
                    imgs[p] = gathered[j]
            return imgs

        if s2d and all_packed:
            # direct s2d gather when every record is already at target size
            sizes = {self._mmap(r.path).shape[1] for r in recs}
            if len(sizes) == 1 and (
                resize_to is None or resize_to == next(iter(sizes))
            ):
                from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
                    gather_rows_s2d,
                )

                return np.stack(packed_gather(gather_rows_s2d))
        if all_packed:
            from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
                gather_rows,
            )

            imgs = packed_gather(gather_rows)
        else:
            imgs = [self.read(i) for i in indices]
        if resize_to is not None:
            imgs = [_resize(img, resize_to) for img in imgs]
        batch = np.stack(imgs)
        if s2d:
            from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
                space_to_depth_u8,
            )

            batch = space_to_depth_u8(batch)
        return batch


def _resize(img: np.ndarray, edge: int) -> np.ndarray:
    if img.shape[0] == edge and img.shape[1] == edge:
        return img
    import cv2

    return cv2.resize(img, (edge, edge), interpolation=cv2.INTER_AREA)


def resize_batch(batch: np.ndarray, edge: int) -> np.ndarray:
    """Resize an already-read (B, H, W, 3) uint8 batch in memory — for
    callers that only discover the stored size after the gather (avoids a
    second disk read just to change resolution)."""
    if batch.shape[1] == edge and batch.shape[2] == edge:
        return batch
    return np.stack([_resize(img, edge) for img in batch])
