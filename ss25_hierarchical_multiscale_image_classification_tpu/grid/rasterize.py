"""Polygon → binary mask rasterization.

The reference rasterizes ASAP XML tumor polygons with PIL's
``ImageDraw.polygon(outline=255, fill=255)`` into an "L"-mode mask at the
target level, scaling level-0 coordinates by ``level_dims / base_dims``
(``src/main.py:372-410``). Patch labels downstream depend on these exact
semantics, so:

- :func:`polygons_to_mask` — the host source of truth, implemented with PIL
  so boundary-inclusion behavior matches the reference artifact-for-artifact.
- :func:`polygons_to_mask_jax` — a jittable even-odd scan rasterizer with
  boundary dilation, used by the streamed on-device pipeline. Parity with the
  PIL version is asserted by tests at the *patch-label* level (any-pixel>0 per
  patch window), which is the only consumer of the mask.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def scale_polygons(
    polygons_level0: Sequence[np.ndarray],
    level_dims: tuple[int, int],
    base_dims: tuple[int, int],
) -> list[np.ndarray]:
    """Scale level-0 (x, y) float polygons to integer level coordinates,
    matching the reference's ``int(x * scale_x)`` truncation
    (``src/main.py:400-403``)."""
    scale_x = level_dims[0] / base_dims[0]
    scale_y = level_dims[1] / base_dims[1]
    out = []
    for poly in polygons_level0:
        poly = np.asarray(poly, dtype=np.float64)
        scaled = np.empty_like(poly, dtype=np.int64)
        scaled[:, 0] = (poly[:, 0] * scale_x).astype(np.int64)
        scaled[:, 1] = (poly[:, 1] * scale_y).astype(np.int64)
        out.append(scaled)
    return out


def polygons_to_mask(
    polygons_level0: Sequence[np.ndarray],
    level_dims: tuple[int, int],
    base_dims: tuple[int, int],
) -> np.ndarray:
    """Rasterize filled polygons (with outline) into a (H, W) uint8 mask of
    0/255, reproducing the reference mask exactly (``src/main.py:392-410``).

    Args:
        polygons_level0: list of (K, 2) arrays of level-0 (x, y) vertices.
        level_dims: (width, height) of the target level.
        base_dims: (width, height) of level 0.
    """
    from PIL import Image, ImageDraw

    mask = Image.new("L", tuple(level_dims), 0)
    draw = ImageDraw.Draw(mask)
    for poly in scale_polygons(polygons_level0, level_dims, base_dims):
        if len(poly) == 0:
            continue
        coords = [(int(x), int(y)) for x, y in poly]
        if len(coords) < 2:
            # degenerate: single vertex -> single pixel via point
            draw.point(coords, fill=255)
            continue
        draw.polygon(coords, outline=255, fill=255)
    return np.asarray(mask, dtype=np.uint8)


def polygons_to_mask_band(
    polygons_level0: Sequence[np.ndarray],
    level_dims: tuple[int, int],
    base_dims: tuple[int, int],
    x0: int = 0,
    y0: int = 0,
    band_w: int | None = None,
    band_h: int | None = None,
) -> np.ndarray:
    """Rasterize only the window ``[x0, x0+band_w) x [y0, y0+band_h)`` of the
    full-level mask.

    For **y-only shifts** (``x0 == 0``) the result is byte-identical to
    ``polygons_to_mask(...)[y0:y0+band_h]`` (fuzz-asserted in tests): PIL's
    scanline fill evaluates x-intersections from y *differences*, which are
    exact in float64 under integer y translation. X shifts perturb the
    absolute x values PIL rounds, so ``x0 > 0`` windows can differ from the
    full-canvas crop by rare single boundary pixels — gigapixel extraction
    therefore labels via full-width y-slabs (``data/extract.py``) instead of
    materializing the ~level-sized mask (~21 GB at level 0 of a real slide).
    """
    from PIL import Image, ImageDraw

    W, H = int(level_dims[0]), int(level_dims[1])
    bw = min(band_w if band_w is not None else W - x0, W - x0)
    bh = min(band_h if band_h is not None else H - y0, H - y0)
    if bw <= 0 or bh <= 0:
        return np.zeros((max(bh, 0), max(bw, 0)), np.uint8)
    mask = Image.new("L", (bw, bh), 0)
    draw = ImageDraw.Draw(mask)
    for poly in scale_polygons(polygons_level0, level_dims, base_dims):
        if len(poly) == 0:
            continue
        # bbox cull (pure optimization; ±1 px safety for the 1px outline)
        xs, ys = poly[:, 0], poly[:, 1]
        if (
            xs.max() < x0 - 1
            or xs.min() > x0 + bw
            or ys.max() < y0 - 1
            or ys.min() > y0 + bh
        ):
            continue
        coords = [(int(x) - x0, int(y) - y0) for x, y in poly]
        if len(coords) < 2:
            draw.point(coords, fill=255)
            continue
        draw.polygon(coords, outline=255, fill=255)
    return np.asarray(mask, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Jittable device rasterizer
# ---------------------------------------------------------------------------


def pad_polygons(
    polygons: Sequence[np.ndarray], max_vertices: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length polygons into static-shape arrays for XLA.

    Returns:
        verts: (P, V, 2) float32, each polygon's vertices padded by repeating
            its last vertex (repeated vertices contribute zero-length edges).
        valid: (P,) bool, False for all-padding polygon slots.
    """
    polys = [np.asarray(p, dtype=np.float32).reshape(-1, 2) for p in polygons]
    polys = [p for p in polys if len(p) > 0]
    if not polys:
        return np.zeros((1, 3, 2), np.float32), np.zeros((1,), bool)
    V = max_vertices or max(len(p) for p in polys)
    V = max(V, 3)
    packed = np.zeros((len(polys), V, 2), np.float32)
    for i, p in enumerate(polys):
        n = min(len(p), V)
        packed[i, :n] = p[:n]
        packed[i, n:] = p[n - 1]
    return packed, np.ones((len(polys),), bool)


def polygons_to_mask_jax(
    verts,
    valid,
    level_dims: tuple[int, int],
    base_dims: tuple[int, int],
    tile: int = 512,
):
    """Jittable rasterizer: even-odd (crossing-number) fill plus edge
    dilation to approximate PIL's outline-inclusive polygons.

    Args:
        verts: (P, V, 2) float32 level-0 vertices (see :func:`pad_polygons`).
        valid: (P,) bool polygon validity.
        level_dims: static (width, height) of the output mask.
        base_dims: static (width, height) of level 0.
        tile: row-block size for the scan (memory/parallelism tradeoff).

    Returns:
        (H, W) uint8 mask of 0/255.
    """
    import jax
    import jax.numpy as jnp

    W, H = int(level_dims[0]), int(level_dims[1])
    scale = jnp.array(
        [level_dims[0] / base_dims[0], level_dims[1] / base_dims[1]], jnp.float32
    )
    # match reference int() truncation of scaled coordinates
    v = jnp.floor(verts * scale[None, None, :]).astype(jnp.float32)  # (P,V,2)
    # edges: (P, V, 2, 2) — vertex i to vertex i+1 (wrapping)
    v_next = jnp.roll(v, -1, axis=1)
    x0, y0 = v[..., 0], v[..., 1]  # (P, V)
    x1, y1 = v_next[..., 0], v_next[..., 1]

    xs = jnp.arange(W, dtype=jnp.float32)[None, :]  # (1, W)

    def row_block(y_start):
        ys = y_start + jnp.arange(tile, dtype=jnp.float32)  # (tile,)
        yc = ys[:, None, None]  # (tile, 1, 1) pixel-center rows (integer coords)
        # Crossing test per edge, evaluated at pixel centers (x+0.0, y+0.0):
        # edge crosses the horizontal line y=yc if min(y0,y1) <= yc < max(y0,y1)
        e_y0 = y0[None]  # (1, P, V)
        e_y1 = y1[None]
        crosses = ((e_y0 <= yc) & (e_y1 > yc)) | ((e_y1 <= yc) & (e_y0 > yc))
        denom = jnp.where(e_y1 - e_y0 == 0, 1.0, e_y1 - e_y0)
        x_at = x0[None] + (yc - e_y0) * (x1[None] - x0[None]) / denom  # (tile,P,V)
        # count crossings strictly left of or at each pixel x  → inside test
        # inside[y, x] for polygon p = parity of #edges with x_at <= x
        # Computed as cumulative: for each pixel x, count edges with x_at <= x.
        x_at = jnp.where(crosses, x_at, jnp.inf)  # (tile, P, V)
        # (tile, P, V, 1) vs (1, 1, 1, W) — bucket by comparing to xs
        cnt = jnp.sum(
            (x_at[..., None] <= xs[None, None, :, :]).astype(jnp.int32), axis=2
        )  # (tile, P, W)
        inside = (cnt % 2) == 1
        inside = inside & valid[None, :, None]
        filled = jnp.any(inside, axis=1)  # (tile, W)

        # Outline: mark pixels within 0.5px of any edge (cheap approximation
        # of PIL's 1px outline). A pixel row intersected by an edge at x_at
        # marks floor(x_at) and ceil(x_at).
        xi = jnp.where(jnp.isfinite(x_at), x_at, -10.0)  # (tile, P, V)
        lo = jnp.floor(xi)
        hi = jnp.ceil(xi)
        def mark(points):
            # points: (tile, P, V) x-positions to set
            onehot = (points[..., None] == xs[None, None, :, :]) & jnp.isfinite(
                x_at[..., None]
            )
            return jnp.any(onehot & valid[None, :, None, None], axis=(1, 2))

        outline = mark(lo) | mark(hi)
        return (filled | outline).astype(jnp.uint8) * jnp.uint8(255)

    n_blocks = -(-H // tile)
    blocks = jax.lax.map(
        lambda i: row_block(i.astype(jnp.float32) * tile),
        jnp.arange(n_blocks),
    )  # (n_blocks, tile, W)
    mask = blocks.reshape(n_blocks * tile, W)[:H]
    return mask
