"""Slide readers, annotations, synthetic fixtures."""

import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.io import (
    ArraySlide,
    make_synthetic_slide,
    open_slide,
    parse_annotation_xml,
    write_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
    tumor_spec,
)


def test_array_slide_pyramid_geometry():
    slide, polys = make_synthetic_slide(tumor_spec(width=512, height=384))
    assert slide.level_count == 4
    assert slide.level_dimensions[0] == (512, 384)
    assert slide.level_dimensions[1] == (256, 192)
    assert slide.level_downsamples[0] == 1.0
    assert slide.level_downsamples[2] == 4.0
    assert len(polys) == 1


def test_read_region_openslide_convention():
    lv0 = np.zeros((64, 64, 3), np.uint8)
    lv0[:32, :32] = 100
    lv1 = lv0[::2, ::2]
    slide = ArraySlide([lv0, lv1])
    # location is level-0 coords even when reading level 1
    region = slide.read_region((30, 0), 1, (16, 16))
    assert region.shape == (16, 16, 3)
    assert region[0, 0, 0] == 100  # level-1 pixel (15,0) maps from level0 (30,0)
    assert region[0, 2, 0] == 0  # level-1 pixel (17,0) maps from level0 (34,0)
    # out-of-bounds reads come back white
    region = slide.read_region((1000, 1000), 0, (8, 8))
    assert (region == 255).all()


def test_annotation_xml_roundtrip(tmp_path):
    polys = [
        np.array([[10.5, 20.25], [100.0, 20.0], [50.0, 90.0]]),
        np.array([[200.0, 200.0], [250.0, 200.0], [250.0, 260.0], [200.0, 260.0]]),
    ]
    path = str(tmp_path / "tumor_001.xml")
    write_annotation_xml(path, polys)
    parsed = parse_annotation_xml(path)
    assert len(parsed) == 2
    np.testing.assert_allclose(parsed[0], polys[0], atol=1e-3)
    np.testing.assert_allclose(parsed[1], polys[1], atol=1e-3)


def test_parse_invalid_xml_returns_empty(tmp_path):
    path = str(tmp_path / "bad.xml")
    with open(path, "w") as f:
        f.write("<not-closed>")
    assert parse_annotation_xml(path) == []


def test_synthetic_case_layout(synthetic_case):
    assert os.path.exists(
        os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    )
    assert os.path.exists(
        os.path.join(synthetic_case, "train", "img", "normal_001.wsi.npz")
    )
    assert os.path.exists(
        os.path.join(synthetic_case, "annotations", "tumor_001.xml")
    )
    # normal slide has no annotation
    assert not os.path.exists(
        os.path.join(synthetic_case, "annotations", "normal_001.xml")
    )
    slide = open_slide(
        os.path.join(synthetic_case, "train", "img", "tumor_001.wsi.npz")
    )
    assert slide.level_count == 4
    # tissue blob exists: mean of center region well below white
    center = slide.read_region((512, 384), 0, (64, 64))
    assert center.mean() < 240


def test_synthetic_tumor_is_inside_tissue():
    slide, polys = make_synthetic_slide(tumor_spec(width=512, height=384))
    (poly,) = polys
    cx, cy = poly.mean(axis=0).astype(int)
    region = slide.read_region((int(cx), int(cy)), 0, (8, 8))
    # tumor tint is darker than plain tissue
    assert region.mean() < 200
