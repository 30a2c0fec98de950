"""Grid math, rasterization, and labeling tests."""

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.grid import (
    PatchGrid,
    is_tissue,
    is_tissue_host,
    patch_labels_from_mask,
    patch_labels_from_mask_host,
    patch_size_for_level,
    padded_extent,
    polygons_to_mask,
    polygons_to_mask_jax,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
    pad_polygons,
)


def test_patch_sizes_match_reference():
    # reference src/main.py:614
    assert patch_size_for_level(0) == 1792
    assert patch_size_for_level(1) == 896
    assert patch_size_for_level(2) == 448
    assert patch_size_for_level(3) == 224
    assert patch_size_for_level(7) == 224  # .get default


def test_padded_extent():
    assert padded_extent(224, 224) == 224
    assert padded_extent(225, 224) == 448
    assert padded_extent(0, 224) == 0


def test_grid_coords_match_reference_loop():
    # replicate the reference double loop exactly (src/main.py:682-686)
    g = PatchGrid(level=3, width=500, height=300, downsample=8.0, patch_size=224, stride=224)
    expected = []
    for x in range(0, g.padded_width, 224):
        for y in range(0, g.padded_height, 224):
            if x >= 500 or y >= 300:
                continue
            expected.append((x, y))
    assert list(g.coords()) == expected
    assert g.num_patches == len(expected)
    assert g.coords_array().shape == (len(expected), 2)


def test_grid_level0_origin_and_extent():
    g = PatchGrid(level=2, width=448, height=448, downsample=4.0, patch_size=448, stride=448)
    assert g.level0_origin(448, 0) == (1792, 0)
    assert g.valid_patch_extent(0, 0) == (448, 448)
    g2 = PatchGrid(level=3, width=300, height=300, downsample=8.0, patch_size=224, stride=224)
    assert g2.valid_patch_extent(224, 224) == (76, 76)


def test_coverage_loss_matches_notebook_number():
    # 02_patch_extraction.ipynb cell 2: 97792x221184 WSI, 1792^2 patches → ~1.26%
    g = PatchGrid(
        level=0, width=97792, height=221184, downsample=1.0,
        patch_size=1792, stride=1792,
    )
    assert g.coverage_loss_without_padding() == pytest.approx(0.0126, abs=2e-3)


def test_polygon_mask_basic():
    poly = np.array([[10.0, 10.0], [50.0, 10.0], [50.0, 40.0], [10.0, 40.0]])
    mask = polygons_to_mask([poly], level_dims=(64, 64), base_dims=(64, 64))
    assert mask.shape == (64, 64)
    assert mask[25, 30] == 255
    assert mask[5, 5] == 0
    # boundary included (outline=255)
    assert mask[10, 10] == 255


def test_polygon_mask_scaling_truncates_like_reference():
    poly = np.array([[100.0, 100.0], [500.0, 100.0], [500.0, 400.0], [100.0, 400.0]])
    # downsample 8x: coords become int(x/8)
    mask = polygons_to_mask([poly], level_dims=(80, 60), base_dims=(640, 480))
    assert mask[int(200 / 8), int(300 / 8)] == 255
    assert mask[2, 2] == 0


def test_jax_rasterizer_label_parity_with_pil():
    rng = np.random.default_rng(3)
    # random-ish blobby polygon
    angles = np.sort(rng.uniform(0, 2 * np.pi, 12))
    radii = rng.uniform(60, 140, 12)
    cx, cy = 256, 192
    poly = np.stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1)

    level_dims, base_dims = (128, 96), (512, 384)  # 4x downsample
    mask_pil = polygons_to_mask([poly], level_dims, base_dims)

    verts, valid = pad_polygons([poly])
    mask_jax = np.asarray(
        polygons_to_mask_jax(verts, valid, level_dims, base_dims, tile=32)
    )
    assert mask_jax.shape == mask_pil.shape

    # parity at the consumer level: per-patch any>0 labels on a 32px grid
    ps = 32
    lp = patch_labels_from_mask_host(
        np.pad(mask_pil, ((0, 0), (0, 0))), _grid_coords(level_dims, ps), ps
    )
    lj = patch_labels_from_mask_host(
        mask_jax, _grid_coords(level_dims, ps), ps
    )
    assert np.array_equal(lp, lj)


def _grid_coords(level_dims, ps):
    w, h = level_dims
    return np.array([(x, y) for x in range(0, w, ps) for y in range(0, h, ps)], np.int32)


def test_tissue_filter_host_and_jax_agree():
    import jax.numpy as jnp

    white = np.full((4, 16, 16, 3), 255, np.uint8)
    tissue = np.full((4, 16, 16, 3), 180, np.uint8)
    batch = np.concatenate([white, tissue])
    keep = np.asarray(is_tissue(jnp.asarray(batch)))
    assert keep.tolist() == [False] * 4 + [True] * 4
    assert not is_tissue_host(white[0])
    assert is_tissue_host(tissue[0])


def test_patch_labels_from_mask_jax():
    import jax.numpy as jnp

    mask = np.zeros((64, 64), np.uint8)
    mask[40, 40] = 255  # single tumor pixel in tile (1,1) of a 32px grid
    grid = np.asarray(patch_labels_from_mask(jnp.asarray(mask), 32))
    assert grid.shape == (2, 2)
    assert grid[1, 1] == 1 and grid.sum() == 1

    host = patch_labels_from_mask_host(
        mask, np.array([(0, 0), (32, 0), (0, 32), (32, 32)]), 32
    )
    # host coords are (x, y); grid is [y_idx, x_idx]
    assert host.tolist() == [0, 0, 0, 1]


def test_labels_none_mask_all_normal():
    labels = patch_labels_from_mask_host(None, np.zeros((5, 2), np.int32), 224)
    assert labels.tolist() == [0] * 5


def test_band_rasterizer_yslab_byte_parity_fuzz():
    """Full-width y-slab rasterization must equal the full mask byte-for-byte
    (PIL y translation is exact) — this is what makes gigapixel band labeling
    identical to the whole-mask path."""
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
        polygons_to_mask,
        polygons_to_mask_band,
    )

    rng = np.random.default_rng(13)
    for _ in range(10):
        W, H = int(rng.integers(60, 300)), int(rng.integers(60, 300))
        base = (W * 4, H * 4)
        polys = []
        for _ in range(int(rng.integers(1, 4))):
            k = int(rng.integers(3, 10))
            cx = rng.uniform(-0.2, 1.2) * base[0]
            cy = rng.uniform(-0.2, 1.2) * base[1]
            r = rng.uniform(0.05, 0.5) * max(base)
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            polys.append(np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1))
        full = polygons_to_mask(polys, (W, H), base)
        for _ in range(6):
            y0 = int(rng.integers(0, H))
            bh = int(rng.integers(1, H - y0 + 1))
            band = polygons_to_mask_band(polys, (W, H), base, 0, y0, W, bh)
            np.testing.assert_array_equal(band, full[y0:y0 + bh])


def test_label_grid_matches_full_mask_labels():
    """_compute_label_grid (y-slab streaming) == any-pool over the full mask."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        _compute_label_grid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
        polygons_to_mask,
    )

    rng = np.random.default_rng(21)
    for _ in range(5):
        W, H, ps = 230, 190, 32
        base = (W * 2, H * 2)
        k = int(rng.integers(3, 9))
        cx, cy = rng.uniform(0, base[0]), rng.uniform(0, base[1])
        r = rng.uniform(0.1, 0.6) * max(base)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        polys = [np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1)]
        grid = PatchGrid(level=0, width=W, height=H, downsample=1.0,
                         patch_size=ps, stride=ps)
        lab = _compute_label_grid(polys, base, grid)
        full = polygons_to_mask(polys, (W, H), base)
        for gy in range(lab.shape[0]):
            for gx in range(lab.shape[1]):
                y, x = gy * ps, gx * ps
                expect = 1 if full[y:y + ps, x:x + ps].any() else 0
                assert lab[gy, gx] == expect, (gx, gy)
