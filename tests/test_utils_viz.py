"""Utilities and visualization."""

import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.utils import (
    check_good_files,
    count_tumor_patches,
    group_patches_by_slide,
    move_files_up,
)
from ss25_hierarchical_multiscale_image_classification_tpu.visualization import (
    visualize_and_save_wsi,
    visualize_attention_heatmap,
)


def _write_png(path, value=128, size=8):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((size, size, 3), value, np.uint8)).save(path)


def test_group_patches_by_slide(tmp_path):
    level = str(tmp_path / "level_3")
    _write_png(os.path.join(level, "normal", "normal_001_x0_y0_normal.png"))
    _write_png(os.path.join(level, "tumor", "tumor_002_x0_y0_tumor.png"))
    moved = group_patches_by_slide(level)
    assert moved == 2
    assert os.path.exists(
        os.path.join(level, "normal_001", "normal_001_x0_y0_normal.png")
    )
    assert os.path.exists(
        os.path.join(level, "tumor_002", "tumor_002_x0_y0_tumor.png")
    )


def test_move_files_up(tmp_path):
    level = str(tmp_path / "level_3")
    _write_png(os.path.join(level, "tumor_001", "tumor", "a_x0_y0_tumor.png"))
    moved = move_files_up(level)
    assert moved == 1
    assert os.path.exists(os.path.join(level, "tumor_001", "a_x0_y0_tumor.png"))


def test_check_good_files_finds_corrupt(tmp_path):
    patches = str(tmp_path / "patches")
    _write_png(os.path.join(patches, "level_3", "ok_slide", "ok_x0_y0_normal.png"))
    bad_dir = os.path.join(patches, "level_3", "bad_slide")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "bad_x0_y0_normal.png"), "wb") as f:
        f.write(b"not a png")
    manifest = str(tmp_path / "redownload.txt")
    bad = check_good_files(patches, manifest)
    assert bad == ["bad_slide"]
    assert os.path.exists(manifest)


def test_count_tumor_patches(synthetic_case):
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data import (
        extract_patches,
    )

    data = DataConfig(data_dir=synthetic_case)
    extract_patches(data, level=2, stride=112, store_format="packed")
    census = count_tumor_patches(data.patches_dir)
    assert 2 in census
    assert census[2]["total"] == census[2]["tumor"] + census[2]["normal"]
    assert census[2]["tumor"] > 0


def test_attention_heatmap(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    attn = np.random.default_rng(1).random((4, 4))
    out = visualize_attention_heatmap(
        img, attn, save_path=str(tmp_path / "attn.png")
    )
    assert out.shape == (32, 32, 3)
    assert os.path.exists(tmp_path / "attn.png")


def test_wsi_viz(synthetic_case, tmp_path):
    slide = os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    xml = os.path.join(synthetic_case, "annotations", "tumor_001.xml")
    artifacts = visualize_and_save_wsi(
        slide, xml, str(tmp_path / "viz"), level=3, patch_xy=(64, 64),
        patch_size=64,
    )
    for key in ("mask", "patch", "mask_crop", "figure"):
        assert key in artifacts and os.path.exists(artifacts[key])
