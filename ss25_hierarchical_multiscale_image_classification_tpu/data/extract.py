"""Hierarchical multiscale patch extraction pipeline.

TPU rebuild of the reference extractor (``src/main.py:609-732`` and the
single-slide/tumor-only variant at ``src/main.py:252-370``) with identical
semantics — per-level patch sizes {0:1792, 1:896, 2:448, 3:224}, stride =
patch size, white pad-to-grid, any-mask-pixel tumor labeling, mean-RGB>240
tissue filter, idempotent per-slide skip — but batch-oriented execution:

- slides whose level is memory-resident (synthetic/NPZ, or a fully decoded
  TIFF level) take a **vectorized path**: one reshape produces every patch of
  the grid, labels come from an any-pool over the mask, and the tissue filter
  is one mean-reduction over the patch axis — no per-patch Python loop;
- other slides stream grid rows through a thread pool of ``read_region``
  calls (the native C++ decoder releases the GIL per tile).

Extraction is embarrassingly parallel by slide (reference resume semantics,
``src/main.py:634-640``) and writes a parquet manifest alongside the patches.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    PAD_FILL_VALUE,
    TISSUE_MEAN_RGB_THRESHOLD,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
    PatchRecord,
    manifest_path,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
    PackedPatchWriter,
    PngPatchWriter,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (
    LABEL_NORMAL,
    LABEL_TUMOR,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
    PatchGrid,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
    polygons_to_mask,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (
    parse_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    Slide,
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)

log = get_logger("data.extract")

SLIDE_EXTENSIONS = (".wsi.npz", ".tif", ".tiff")


def slide_name(filename: str) -> str:
    for ext in SLIDE_EXTENSIONS:
        if filename.endswith(ext):
            return filename[: -len(ext)]
    return os.path.splitext(filename)[0]


def list_slides(img_dir: str) -> list[tuple[str, str]]:
    """(name, path) for every slide container in a directory."""
    out = []
    if not os.path.isdir(img_dir):
        return out
    for f in sorted(os.listdir(img_dir)):
        if f.endswith(SLIDE_EXTENSIONS):
            out.append((slide_name(f), os.path.join(img_dir, f)))
    return out


def annotation_path_for(data: DataConfig, name: str) -> str:
    return os.path.join(data.annotations_dir, f"{name}.xml")


# ---------------------------------------------------------------------------
# Per-slide extraction
# ---------------------------------------------------------------------------


def _build_mask(
    xml_path: str, slide: Slide, level: int, grid: PatchGrid
) -> np.ndarray | None:
    """Rasterize the annotation at `level`, zero-padded to the grid
    (``src/main.py:669-676``)."""
    if not os.path.exists(xml_path):
        return None
    polygons = parse_annotation_xml(xml_path)
    if not polygons:
        return None
    level_dims = slide.level_dimensions[level]
    base_dims = slide.level_dimensions[0]
    mask = polygons_to_mask(polygons, level_dims, base_dims)
    ph, pw = grid.padded_height, grid.padded_width
    if mask.shape != (ph, pw):
        padded = np.zeros((ph, pw), np.uint8)
        padded[: mask.shape[0], : mask.shape[1]] = mask
        mask = padded
    return mask


def _vectorized_patches(
    level_img: np.ndarray, grid: PatchGrid
) -> tuple[np.ndarray, np.ndarray]:
    """All grid patches of a memory-resident level in one reshape.

    Returns (patches (N, P, P, 3) uint8, coords (N, 2) int32) in reference
    order (outer x, inner y — ``src/main.py:682-686``).
    """
    ps = grid.patch_size
    ph, pw = grid.padded_height, grid.padded_width
    padded = np.full((ph, pw, 3), PAD_FILL_VALUE, np.uint8)
    padded[: grid.height, : grid.width] = level_img
    gh, gw = ph // ps, pw // ps
    tiles = padded.reshape(gh, ps, gw, ps, 3).transpose(2, 0, 1, 3, 4)
    # tiles[gx, gy] is the patch at (x=gx*ps, y=gy*ps); flatten x-major
    patches = np.ascontiguousarray(tiles.reshape(gw * gh, ps, ps, 3))
    xs = np.repeat(np.arange(gw, dtype=np.int32), gh) * ps
    ys = np.tile(np.arange(gh, dtype=np.int32), gw) * ps
    coords = np.stack([xs, ys], axis=1)
    # drop grid positions whose top-left is outside the unpadded image
    keep = (coords[:, 0] < grid.width) & (coords[:, 1] < grid.height)
    return patches[keep], coords[keep]


def _streamed_patches(
    slide: Slide, grid: PatchGrid, num_threads: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Grid patches via threaded read_region calls (non-resident levels)."""
    coords = grid.coords_array()
    ps = grid.patch_size

    def fetch(idx: int) -> np.ndarray:
        x, y = int(coords[idx, 0]), int(coords[idx, 1])
        w, h = grid.valid_patch_extent(x, y)
        region = slide.read_region(grid.level0_origin(x, y), grid.level, (w, h))
        if w < ps or h < ps:  # white border pad, src/main.py:698-703
            full = np.full((ps, ps, 3), PAD_FILL_VALUE, np.uint8)
            full[:h, :w] = region
            region = full
        return region

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        patches = list(pool.map(fetch, range(len(coords))))
    if not patches:
        return np.zeros((0, ps, ps, 3), np.uint8), coords
    return np.stack(patches), coords


def extract_patches_for_slide(
    slide_path: str,
    xml_path: str,
    level: int,
    patches_dir: str,
    store_format: str = "packed",
    only_tumor: bool = False,
    stride: int | None = None,
    tissue_threshold: float = TISSUE_MEAN_RGB_THRESHOLD,
    num_threads: int = 8,
) -> list[PatchRecord]:
    """Extract, label, filter, and store all patches of one slide level.

    Matches reference per-slide behavior (``src/main.py:609-732``); the
    ``only_tumor`` mode mirrors ``extract_patches_per_slide(only_tumor=True)``
    (``src/main.py:361-366``).
    """
    name = slide_name(os.path.basename(slide_path))
    slide = open_slide(slide_path)
    try:
        if level >= slide.level_count:
            log.warning("%s has no level %d; skipping", name, level)
            return []
        grid = PatchGrid.for_slide_level(
            level,
            slide.level_dimensions[level],
            slide.level_downsamples[level],
            stride=stride,
        )
        mask = _build_mask(xml_path, slide, level, grid)

        level_array = getattr(slide, "level_array", None)
        if level_array is not None and grid.stride == grid.patch_size:
            # the one-reshape fast path only covers the non-overlapping grid
            patches, coords = _vectorized_patches(level_array(level), grid)
        else:
            patches, coords = _streamed_patches(slide, grid, num_threads)

        if len(patches) == 0:
            return []

        # labels: any mask pixel > 0 in the window → tumor (src/main.py:707-716)
        if mask is None:
            labels = np.full((len(coords),), LABEL_NORMAL, np.int32)
        else:
            labels = np.array(
                [
                    LABEL_TUMOR
                    if np.any(mask[y : y + grid.patch_size, x : x + grid.patch_size] > 0)
                    else LABEL_NORMAL
                    for x, y in coords
                ],
                dtype=np.int32,
            )

        # tissue filter AFTER labeling (src/main.py:718-719)
        means = patches.reshape(len(patches), -1).mean(axis=1)
        keep = means <= tissue_threshold
        if only_tumor:
            keep &= labels == LABEL_TUMOR
        patches, coords, labels = patches[keep], coords[keep], labels[keep]

        if store_format == "packed":
            writer = PackedPatchWriter(patches_dir, level, name, grid.patch_size)
            recs = writer.write_batch(patches, coords, labels)
        else:
            writer = PngPatchWriter(patches_dir, level, name)
            recs = [
                writer.write(patches[i], int(coords[i, 0]), int(coords[i, 1]), int(labels[i]))
                for i in range(len(patches))
            ]
        writer.close()
        log.info(
            "Patch extraction complete for %s at level %d: %d patches "
            "(%d tumor / %d normal)",
            name, level, len(recs),
            int((labels == LABEL_TUMOR).sum()), int((labels == LABEL_NORMAL).sum()),
        )
        return recs
    finally:
        slide.close()


# ---------------------------------------------------------------------------
# Dataset-level extraction
# ---------------------------------------------------------------------------


def _slide_already_extracted(
    manifest: PatchManifest, patches_dir: str, level: int, name: str
) -> bool:
    """Idempotent skip (reference ``src/main.py:634-640``): packed store by
    manifest membership, PNG store by non-empty slide directory."""
    if any(r.slide == name for r in manifest):
        return True
    png_dir = os.path.join(patches_dir, f"level_{level}", name)
    return os.path.isdir(png_dir) and len(os.listdir(png_dir)) > 0


def extract_patches(
    data: DataConfig,
    level: int = 3,
    split: str = "train",
    only_tumor: bool = False,
    stride: int | None = None,
    store_format: str | None = None,
    slide_filter: Sequence[str] | None = None,
) -> PatchManifest:
    """Extract patches for every slide of a split at one level.

    Returns the (cumulative) manifest for the level, persisted to
    ``patches/level_{L}/manifest.parquet``.
    """
    img_dir = data.train_img_dir if split == "train" else data.test_img_dir
    store_format = store_format or data.patch_store_format
    mpath = manifest_path(data.patches_dir, level)
    manifest = (
        PatchManifest.load(mpath) if os.path.exists(mpath) else PatchManifest()
    )

    slides = list_slides(img_dir)
    if slide_filter is not None:
        wanted = set(slide_filter)
        slides = [(n, p) for n, p in slides if n in wanted]
    if not slides:
        log.warning("No slides found in %s", img_dir)
        return manifest

    log.info("Extracting patches at level %d from %d slides...", level, len(slides))
    for name, path in slides:
        if _slide_already_extracted(manifest, data.patches_dir, level, name):
            log.info("Patches for %s already extracted, skipping.", name)
            continue
        try:
            with Timer(f"extract[{name} L{level}]", log):
                recs = extract_patches_for_slide(
                    path,
                    annotation_path_for(data, name),
                    level,
                    data.patches_dir,
                    store_format=store_format,
                    only_tumor=only_tumor,
                    stride=stride,
                )
        except Exception as e:  # one bad WSI must not kill the run (main.py:649-653)
            log.error("Could not process %s: %s", path, e)
            continue
        manifest.extend(recs)
        manifest.save(mpath)
    return manifest
