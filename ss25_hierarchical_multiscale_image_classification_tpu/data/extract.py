"""Hierarchical multiscale patch extraction pipeline.

TPU rebuild of the reference extractor (``src/main.py:609-732`` and the
single-slide/tumor-only variant at ``src/main.py:252-370``) with identical
semantics — per-level patch sizes {0:1792, 1:896, 2:448, 3:224}, stride =
patch size, white pad-to-grid, any-mask-pixel tumor labeling, mean-RGB>240
tissue filter, idempotent per-slide skip — executed as **bounded-memory
column-band streaming** so real gigapixel slides extract at level 0:

- the grid is walked in reference x-major order (``src/main.py:682-686``)
  in bands of whole grid columns sized to a host-memory budget;
- each band's patches decode through the native threaded batch API
  (``TiffSlide.read_regions``) or an array slice for memory-resident levels;
- the annotation mask is rasterized **per band** (``polygons_to_mask_band``,
  byte-identical to cropping the full mask) instead of materializing the
  level-sized mask (~21 GB at level 0 of a real slide);
- surviving patches append to the store incrementally, so peak RSS is
  one band of patches + one band of mask regardless of slide size.

An on-device extraction implementation (``data/streamed.py`` — grid,
rasterization, labeling and filtering in one XLA program) is selectable via
``impl="device"`` for levels whose plane fits the device memory budget.

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
    polygons_to_mask_band,
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


# Default per-band host-memory budget for decoded patches. One grid column
# is the minimum band, so worst-case RSS at level 0 of a 97792x221184 slide
# is ~1.2 GB of patches + ~0.4 GB of band mask — gigapixel-safe by design.
BAND_BUDGET_BYTES = 512 << 20


def _load_polygons(xml_path: str) -> list[np.ndarray]:
    if not os.path.exists(xml_path):
        return []
    return parse_annotation_xml(xml_path)


def _band_columns(grid: PatchGrid, budget_bytes: int) -> int:
    """Grid columns per band under the patch-bytes budget (>= 1)."""
    per_col = grid.ny * grid.patch_size * grid.patch_size * 3
    return max(1, int(budget_bytes // max(per_col, 1)))


def _iter_column_bands(grid: PatchGrid, band_cols: int):
    """Yield (xs, coords) per band in reference x-major order
    (outer x, inner y — ``src/main.py:682-686``)."""
    xs_all = [
        x for x in range(0, grid.padded_width, grid.stride) if x < grid.width
    ]
    ys = np.array(
        [y for y in range(0, grid.padded_height, grid.stride) if y < grid.height],
        np.int32,
    )
    for i in range(0, len(xs_all), band_cols):
        xs = xs_all[i : i + band_cols]
        coords = np.empty((len(xs) * len(ys), 2), np.int32)
        coords[:, 0] = np.repeat(np.asarray(xs, np.int32), len(ys))
        coords[:, 1] = np.tile(ys, len(xs))
        yield xs, coords


def _fetch_band(
    slide: Slide, grid: PatchGrid, coords: np.ndarray, num_threads: int
) -> np.ndarray:
    """Decode one band of patches, white-padded to full size
    (``src/main.py:698-703``)."""
    ps = grid.patch_size
    if len(coords) == 0:
        return np.zeros((0, ps, ps, 3), np.uint8)

    level_array = getattr(slide, "level_array", None)
    if level_array is not None:
        arr = level_array(grid.level)
        out = np.full((len(coords), ps, ps, 3), PAD_FILL_VALUE, np.uint8)
        for i, (x, y) in enumerate(coords):
            w, h = grid.valid_patch_extent(int(x), int(y))
            out[i, :h, :w] = arr[y : y + h, x : x + w]
        return out

    read_regions = getattr(slide, "read_regions", None)
    if read_regions is not None:
        # native threaded batch decode; out-of-bounds comes back white
        return read_regions(coords, grid.level, (ps, ps), num_threads=num_threads)

    def fetch(idx: int) -> np.ndarray:
        x, y = int(coords[idx, 0]), int(coords[idx, 1])
        w, h = grid.valid_patch_extent(x, y)
        region = slide.read_region(grid.level0_origin(x, y), grid.level, (w, h))
        if w < ps or h < ps:
            full = np.full((ps, ps, 3), PAD_FILL_VALUE, np.uint8)
            full[:h, :w] = region
            region = full
        return region

    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        patches = list(pool.map(fetch, range(len(coords))))
    return np.stack(patches)


def _compute_label_grid(
    polygons: list[np.ndarray],
    base_dims: tuple[int, int],
    grid: PatchGrid,
) -> np.ndarray | None:
    """The (ny, nx) tumor/normal label grid for a whole level, computed by
    rasterizing the annotation in full-width y-slabs (one patch row tall)
    and any-pooling per window (``src/main.py:707-716``).

    Y-slab rasterization is byte-identical to cropping the full mask (see
    ``polygons_to_mask_band``), so labels match the whole-mask path exactly
    while peak mask memory is one slab (patch_size x width) instead of the
    level-sized mask. Returns None when there is no annotation (all-normal,
    ``src/main.py:716``).
    """
    if not polygons:
        return None
    W, H, ps = grid.width, grid.height, grid.patch_size
    ys = [y for y in range(0, grid.padded_height, grid.stride) if y < H]
    xs = np.array(
        [x for x in range(0, grid.padded_width, grid.stride) if x < W], np.int64
    )
    out = np.zeros((len(ys), len(xs)), np.int32)
    for gy, y in enumerate(ys):
        slab = polygons_to_mask_band(
            polygons, (W, H), base_dims, x0=0, y0=y, band_w=W,
            band_h=min(ps, H - y),
        )
        hit = slab.any(axis=0)
        cum = np.concatenate([[0], np.cumsum(hit, dtype=np.int64)])
        win_any = cum[np.minimum(xs + ps, W)] - cum[xs] > 0
        out[gy] = np.where(win_any, LABEL_TUMOR, LABEL_NORMAL)
    return out


def _stain_normalize(patches: np.ndarray) -> np.ndarray:
    """Macenko-normalize a batch of stored patches on device (--stain_norm).

    Batches pad to the next power of two so XLA compiles a handful of shapes
    instead of one program per band remainder.
    """
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.data.stain import (
        macenko_normalize_batch,
    )

    n = len(patches)
    padded_n = 1 << max(0, (n - 1).bit_length())
    if padded_n != n:
        patches = np.concatenate(
            [patches, np.repeat(patches[-1:], padded_n - n, axis=0)]
        )
    out = np.asarray(macenko_normalize_batch(jnp.asarray(patches)))
    return out[:n]


def _extract_on_device(
    slide: Slide,
    grid: PatchGrid,
    polygons: list[np.ndarray],
    tissue_threshold: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the whole level plane and run the one-XLA-program extraction
    (``data/streamed.py``). Caller guards the plane-size budget."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.streamed import (
        extract_patches_on_device,
    )

    level_array = getattr(slide, "level_array", None)
    if level_array is not None:
        plane = level_array(grid.level)
    else:
        plane = slide.read_region(
            (0, 0), grid.level, slide.level_dimensions[grid.level]
        )
    return extract_patches_on_device(
        plane,
        grid,
        polygons,
        slide.level_dimensions[0],
        tissue_threshold=tissue_threshold,
    )


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
    impl: str = "host",
    band_budget_bytes: int = BAND_BUDGET_BYTES,
    stain_norm: bool = False,
) -> list[PatchRecord]:
    """Extract, label, filter, and store all patches of one slide level.

    Matches reference per-slide behavior (``src/main.py:609-732``); the
    ``only_tumor`` mode mirrors ``extract_patches_per_slide(only_tumor=True)``
    (``src/main.py:361-366``). The host path streams column bands with
    bounded memory; ``impl="device"`` runs the on-device XLA extraction for
    levels whose decoded plane fits ``band_budget_bytes`` (larger planes fall
    back to host streaming with a warning).
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
        polygons = _load_polygons(xml_path)

        if store_format == "packed":
            writer = PackedPatchWriter(patches_dir, level, name, grid.patch_size)
        else:
            writer = PngPatchWriter(patches_dir, level, name)
        recs: list[PatchRecord] = []
        n_tumor = n_normal = 0

        def emit(patches, coords, labels):
            nonlocal n_tumor, n_normal
            if stain_norm and len(patches):
                patches = _stain_normalize(patches)
            n_tumor += int((labels == LABEL_TUMOR).sum())
            n_normal += int((labels == LABEL_NORMAL).sum())
            if store_format == "packed":
                recs.extend(writer.write_batch(patches, coords, labels))
            else:
                recs.extend(
                    writer.write(
                        patches[i],
                        int(coords[i, 0]),
                        int(coords[i, 1]),
                        int(labels[i]),
                    )
                    for i in range(len(patches))
                )

        plane_bytes = grid.width * grid.height * 3
        if impl == "device" and grid.stride == grid.patch_size:
            if plane_bytes > band_budget_bytes:
                log.warning(
                    "%s level %d plane (%.1f GB) exceeds the device budget; "
                    "falling back to host band streaming",
                    name, level, plane_bytes / 2**30,
                )
            else:
                patches, coords, labels = _extract_on_device(
                    slide, grid, polygons, tissue_threshold
                )
                if only_tumor:
                    sel = labels == LABEL_TUMOR
                    patches, coords, labels = patches[sel], coords[sel], labels[sel]
                emit(patches, coords, labels)
                writer.close()
                log.info(
                    "Patch extraction complete for %s at level %d (device): "
                    "%d patches (%d tumor / %d normal)",
                    name, level, len(recs), n_tumor, n_normal,
                )
                return recs

        label_grid = _compute_label_grid(
            polygons, slide.level_dimensions[0], grid
        )
        band_cols = _band_columns(grid, band_budget_bytes)
        for xs, coords in _iter_column_bands(grid, band_cols):
            patches = _fetch_band(slide, grid, coords, num_threads)
            if len(patches) == 0:
                continue
            # labels BEFORE the tissue filter (src/main.py:707-719)
            if label_grid is None:
                labels = np.full((len(coords),), LABEL_NORMAL, np.int32)
            else:
                labels = label_grid[
                    coords[:, 1] // grid.stride, coords[:, 0] // grid.stride
                ]
            means = patches.reshape(len(patches), -1).mean(axis=1)
            keep = means <= tissue_threshold
            if only_tumor:
                keep &= labels == LABEL_TUMOR
            if keep.any():
                emit(patches[keep], coords[keep], labels[keep])

        writer.close()
        log.info(
            "Patch extraction complete for %s at level %d: %d patches "
            "(%d tumor / %d normal)",
            name, level, len(recs), n_tumor, n_normal,
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
    impl: str = "host",
    band_budget_bytes: int = BAND_BUDGET_BYTES,
    stain_norm: bool = False,
    on_slide=None,
) -> PatchManifest:
    """Extract patches for every slide of a split at one level.

    Returns the (cumulative) manifest for the level, persisted to
    ``patches/level_{L}/manifest.parquet``. ``on_slide(name, records)``
    fires after each slide's store+manifest rows land (already-extracted
    slides fire with their existing rows) — the streaming-training hook
    (``train/streaming.py``): consumers can batch a slide's patches while
    the next slide decodes.
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
            if on_slide is not None:
                on_slide(name, [r for r in manifest if r.slide == name])
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
                    impl=impl,
                    band_budget_bytes=band_budget_bytes,
                    stain_norm=stain_norm,
                )
        except Exception as e:  # one bad WSI must not kill the run (main.py:649-653)
            log.error("Could not process %s: %s", path, e)
            continue
        manifest.extend(recs)
        manifest.save(mpath)
        if on_slide is not None:
            on_slide(name, recs)
    return manifest
