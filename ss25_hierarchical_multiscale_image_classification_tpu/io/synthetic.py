"""Synthetic pyramid fixtures.

The reference has no hermetic test data — its notebooks download a 2 GB slide
(tumor_076) for visual QA. Here we fabricate small multi-level pyramids with
known tissue regions and tumor polygons so every pipeline stage is testable
without network or gigabyte slides (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (
    write_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    ArraySlide,
    save_npz_slide,
)


@dataclasses.dataclass
class SyntheticSlideSpec:
    """Procedural slide description.

    The level-0 canvas is white (background), with an elliptical tissue blob
    (pink-ish, mean RGB well under the 240 tissue threshold) and zero or more
    tumor polygons inside the tissue. Tumor regions are tinted darker so a
    classifier can actually learn the distinction.
    """

    width: int = 1024
    height: int = 768
    num_levels: int = 4
    tissue_center: tuple[float, float] = (0.5, 0.5)  # fraction of (w, h)
    tissue_radii: tuple[float, float] = (0.38, 0.4)  # fraction of (w, h)
    tumor_polygons: tuple[tuple[tuple[float, float], ...], ...] = ()
    #: fractional (x, y) vertices; empty tuple = normal slide
    seed: int = 0
    noise: float = 8.0
    #: "tint": tumor is a flat darker-purple shift — separable at every
    #: pyramid level (the easy fixture). "texture": tumor keeps the
    #: tissue's MEAN color but carries a zero-mean 4-px checkerboard
    #: (±texture_amp) — 2x box-downsampling to level 2 preserves the
    #: full amplitude (each level-2 px averages one aligned 4x4 cell),
    #: while level 3 averages 2x2 opposite-sign cells to EXACTLY zero:
    #: a lesion only finer magnifications can see, the discriminative
    #: fixture for hierarchical multiscale (docs/ROADMAP.md round-3 gap 3)
    tumor_style: str = "tint"
    texture_amp: float = 20.0


def _default_tumor_polygon() -> tuple[tuple[float, float], ...]:
    return ((0.40, 0.35), (0.62, 0.38), (0.65, 0.58), (0.45, 0.62), (0.38, 0.5))


def tumor_spec(**kw) -> SyntheticSlideSpec:
    kw.setdefault("tumor_polygons", (_default_tumor_polygon(),))
    return SyntheticSlideSpec(**kw)


def normal_spec(**kw) -> SyntheticSlideSpec:
    return SyntheticSlideSpec(**kw)


def make_level0(spec: SyntheticSlideSpec) -> tuple[np.ndarray, list[np.ndarray]]:
    """Render the level-0 image and return (image, tumor_polygons_level0)."""
    rng = np.random.default_rng(spec.seed)
    h, w = spec.height, spec.width
    img = np.full((h, w, 3), 255, dtype=np.float32)

    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = spec.tissue_center[0] * w, spec.tissue_center[1] * h
    rx, ry = spec.tissue_radii[0] * w, spec.tissue_radii[1] * h
    tissue = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0

    # Tissue texture: pink-ish H&E-looking base with correlated noise.
    base = np.array([205.0, 160.0, 190.0])
    tex = rng.normal(0.0, spec.noise, size=(h, w, 3)).astype(np.float32)
    img[tissue] = base[None, :] + tex[tissue]

    polygons_l0: list[np.ndarray] = []
    for poly in spec.tumor_polygons:
        poly_px = np.array(
            [(px * w, py * h) for px, py in poly], dtype=np.float64
        )
        polygons_l0.append(poly_px)
        # Tint tumor area darker purple so it is visually/statistically distinct.
        from PIL import Image, ImageDraw

        m = Image.new("L", (w, h), 0)
        ImageDraw.Draw(m).polygon(
            [(float(x), float(y)) for x, y in poly_px], outline=255, fill=255
        )
        mm = np.asarray(m) > 0
        if spec.tumor_style == "texture":
            # zero-mean checkerboard, 4-px cells aligned to the level-0
            # grid so pyramid box-averaging cancels it exactly at level 3
            checker = (((xx // 4) + (yy // 4)) % 2).astype(np.float32)
            checker = (checker * 2.0 - 1.0) * spec.texture_amp
            img[mm] = base[None, :] + checker[mm, None] + tex[mm]
        else:
            img[mm] = np.array([150.0, 90.0, 160.0])[None, :] + tex[mm]

    np.clip(img, 0, 255, out=img)
    return img.astype(np.uint8), polygons_l0


def build_pyramid(level0: np.ndarray, num_levels: int) -> list[np.ndarray]:
    """2x-downsample pyramid by box averaging (each level halves both dims)."""
    levels = [level0]
    cur = level0.astype(np.float32)
    for _ in range(1, num_levels):
        h, w = cur.shape[:2]
        h2, w2 = h // 2, w // 2
        cur = cur[: h2 * 2, : w2 * 2]
        cur = cur.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3))
        levels.append(np.clip(cur, 0, 255).astype(np.uint8))
    return levels


def make_synthetic_slide(
    spec: SyntheticSlideSpec | None = None,
) -> tuple[ArraySlide, list[np.ndarray]]:
    """Build an in-memory synthetic slide. Returns (slide, tumor_polygons)."""
    spec = spec or SyntheticSlideSpec()
    level0, polys = make_level0(spec)
    return ArraySlide(build_pyramid(level0, spec.num_levels)), polys


def write_synthetic_case(
    data_dir: str,
    name: str,
    spec: SyntheticSlideSpec | None = None,
    split: str = "train",
    container: str = "npz",
    compression: str = "deflate",
) -> str:
    """Write a synthetic slide (+ annotation XML if it has tumor polygons)
    into the reference-compatible directory layout:
    ``{data_dir}/{split}/img/{name}.<ext>`` and
    ``{data_dir}/annotations/{name}.xml``.

    ``container="tiff"`` writes a real tiled BigTIFF; ``compression=
    "jpeg_ycbcr"`` there fabricates the CAMELYON16 production encoding
    (chroma-subsampled YCbCr JPEG tiles) so the real-data decode path is
    exercised hermetically. Returns the slide path.
    """
    spec = spec or SyntheticSlideSpec()
    level0, polys = make_level0(spec)
    levels = build_pyramid(level0, spec.num_levels)

    img_dir = os.path.join(data_dir, split, "img")
    os.makedirs(img_dir, exist_ok=True)
    if container == "npz":
        slide_path = os.path.join(img_dir, f"{name}.wsi.npz")
        save_npz_slide(slide_path, levels)
    elif container == "tiff":
        from ss25_hierarchical_multiscale_image_classification_tpu.io.tiff_slide import (
            write_pyramidal_tiff,
        )

        slide_path = os.path.join(img_dir, f"{name}.tif")
        write_pyramidal_tiff(slide_path, levels, compression=compression)
    else:
        raise ValueError(f"unknown container {container}")

    if polys:
        xml_path = os.path.join(data_dir, "annotations", f"{name}.xml")
        write_annotation_xml(xml_path, polys)
    return slide_path


def write_giant_synthetic_slide(
    slide_path: str,
    spec: SyntheticSlideSpec | None = None,
    xml_path: str | None = None,
    tile_size: int = 512,
    compression: str = "jpeg",
    target_band_px: int = 48_000_000,
) -> None:
    """Stream-fabricate a full-scale synthetic WSI as a tiled JPEG BigTIFF.

    Unlike :func:`write_synthetic_case` this never materializes a level in
    memory: each pyramid level is rendered procedurally in row bands (tissue
    ellipse analytic, tumor polygons via the band rasterizer, tiled texture
    noise) and appended through :class:`StreamingPyramidWriter`. Rendering a
    97792x221184 slide — the canonical giant CAMELYON16 slide of reference
    ``02_patch_extraction.ipynb`` cell 2 — peaks well under 2 GB of host RAM.
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
        polygons_to_mask_band,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.tiff_slide import (
        StreamingPyramidWriter,
    )

    spec = spec or SyntheticSlideSpec(width=97792, height=221184)
    w0, h0 = spec.width, spec.height
    polys_l0 = [
        np.array([(px * w0, py * h0) for px, py in poly], np.float64)
        for poly in spec.tumor_polygons
    ]

    rng = np.random.default_rng(spec.seed)
    ntile = 256
    noise_tile = rng.normal(0.0, spec.noise, (ntile, ntile, 3)).astype(np.float32)
    tissue_base = np.array([205.0, 160.0, 190.0], np.float32)
    tumor_base = np.array([150.0, 90.0, 160.0], np.float32)

    with StreamingPyramidWriter(slide_path, tile_size=tile_size,
                                compression=compression) as wr:
        for lvl in range(spec.num_levels):
            w = max(1, w0 >> lvl)
            h = max(1, h0 >> lvl)
            wr.begin_level(w, h)
            band_rows = max(
                tile_size, (target_band_px // max(w, 1)) // tile_size * tile_size
            )
            cx, cy = spec.tissue_center[0] * w, spec.tissue_center[1] * h
            rx, ry = spec.tissue_radii[0] * w, spec.tissue_radii[1] * h
            xs = np.arange(w, dtype=np.float32)
            x_term = ((xs - cx) / rx) ** 2  # (w,)
            for y0 in range(0, h, band_rows):
                rows = min(band_rows, h - y0)
                ys = np.arange(y0, y0 + rows, dtype=np.float32)
                y_term = ((ys - cy) / ry) ** 2  # (rows,)
                tissue = (y_term[:, None] + x_term[None, :]) <= 1.0
                img = np.full((rows, w, 3), 255.0, np.float32)
                noise = np.tile(
                    noise_tile,
                    (-(-rows // ntile), -(-w // ntile), 1),
                )[:rows, :w]
                img[tissue] = tissue_base + noise[tissue]
                if polys_l0:
                    tumor = polygons_to_mask_band(
                        polys_l0, (w, h), (w0, h0), x0=0, y0=y0,
                        band_w=w, band_h=rows,
                    ) > 0
                    img[tumor] = tumor_base + noise[tumor]
                np.clip(img, 0, 255, out=img)
                wr.write_band(img.astype(np.uint8))
            wr.end_level()

    if polys_l0 and xml_path:
        write_annotation_xml(xml_path, polys_l0)
