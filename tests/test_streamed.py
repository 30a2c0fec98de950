"""On-device extraction parity vs the host pipeline."""

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
    extract_patches_for_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.streamed import (
    extract_patches_on_device,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
    PatchGrid,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (
    parse_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    open_slide,
)


def test_on_device_extraction_matches_host(synthetic_case, tmp_path):
    import os

    level = 2
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    xml_path = os.path.join(synthetic_case, "annotations", "tumor_001.xml")

    # host pipeline (source of truth)
    host_recs = extract_patches_for_slide(
        slide_path, xml_path, level, str(tmp_path / "patches"),
        store_format="packed",
    )
    host = {(r.x, r.y): r.label for r in host_recs}

    # on-device pipeline
    slide = open_slide(slide_path)
    grid = PatchGrid.for_slide_level(
        level, slide.level_dimensions[level], slide.level_downsamples[level]
    )
    polygons = parse_annotation_xml(xml_path)
    patches, coords, labels = extract_patches_on_device(
        slide.level_array(level), grid, polygons, slide.level_dimensions[0]
    )
    device = {tuple(c): int(l) for c, l in zip(coords.tolist(), labels)}

    # same kept cells, same labels
    assert set(device) == set(host)
    assert device == host
    # patch pixels match a direct region read
    i = 0
    x, y = coords[i]
    ds = slide.level_downsamples[level]
    fresh = slide.read_region(
        (int(x * ds), int(y * ds)), level,
        (grid.patch_size, grid.patch_size),
    )
    np.testing.assert_array_equal(patches[i], fresh)
    slide.close()


def test_on_device_extraction_no_annotation(synthetic_case):
    import os

    level = 2
    slide_path = os.path.join(
        synthetic_case, "train", "img", "normal_001.wsi.npz"
    )
    slide = open_slide(slide_path)
    grid = PatchGrid.for_slide_level(
        level, slide.level_dimensions[level], slide.level_downsamples[level]
    )
    patches, coords, labels = extract_patches_on_device(
        slide.level_array(level), grid, [], slide.level_dimensions[0]
    )
    assert (labels == 0).all()
    assert len(patches) == len(coords) == len(labels)
    slide.close()
