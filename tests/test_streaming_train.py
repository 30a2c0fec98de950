"""Streaming --patch --train pipeline (train/streaming.py): extraction
overlaps the first epoch, the store it leaves behind is identical to the
sequential path's, and validation slides never enter the streamed epoch."""

import os
import queue
import shutil

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
    manifest_path,
)


@pytest.fixture()
def fresh_case(synthetic_case, tmp_path):
    root = str(tmp_path / "camelyon16")
    shutil.copytree(
        synthetic_case, root, ignore=shutil.ignore_patterns("patches")
    )
    patches = os.path.join(root, "patches")
    if os.path.isdir(patches):
        shutil.rmtree(patches)
    return root


def _rows(manifest):
    return sorted(
        (r.slide, r.x, r.y, r.label, r.level) for r in manifest
    )


def test_on_slide_hook_fires_per_slide(fresh_case):
    data = DataConfig(data_dir=fresh_case)
    seen = []
    extract_patches(
        data, level=2, stride=112, store_format="packed",
        on_slide=lambda name, recs: seen.append((name, len(recs))),
    )
    names = [n for n, _ in seen]
    assert sorted(names) == ["normal_001", "tumor_001"]
    assert all(n > 0 for _, n in seen)
    # already-extracted slides re-fire with their existing rows
    seen2 = []
    extract_patches(
        data, level=2, stride=112, store_format="packed",
        on_slide=lambda name, recs: seen2.append((name, len(recs))),
    )
    assert sorted(seen2) == sorted(seen)


def test_stream_batches_static_shapes(fresh_case):
    from ss25_hierarchical_multiscale_image_classification_tpu.train.streaming import (
        _stream_batches,
    )

    data = DataConfig(data_dir=fresh_case)
    manifest = extract_patches(
        data, level=2, stride=112, store_format="packed"
    )
    by_slide: dict = {}
    for r in manifest:
        by_slide.setdefault(r.slide, []).append(r)
    q: queue.Queue = queue.Queue()
    for recs in by_slide.values():
        q.put(recs)
    q.put(None)
    total = 0
    for imgs, labels, valid in _stream_batches(q, 4, 64):
        assert imgs.shape == (4, 64, 64, 3) and labels.shape == (4,)
        total += int(valid.sum())
    assert total == len(manifest)


def test_streaming_train_matches_store_and_holds_out_val(
    fresh_case, synthetic_case, tmp_path
):
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        slide_level_split,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.streaming import (
        train_resnet_classifier_streaming,
    )

    cfg = Config(
        data=DataConfig(data_dir=fresh_case),
        models_dir=str(tmp_path / "models"),
    )
    cfg.train.batch_size = 8
    result = train_resnet_classifier_streaming(
        cfg, level=2, epochs=2, stride=112, store_format="packed",
    )
    ep0 = result["streamed_epoch"]
    assert np.isfinite(ep0["loss"])

    # the streamed epoch saw exactly the train-split slides' patches
    manifest = PatchManifest.load(
        manifest_path(cfg.data.patches_dir, 2)
    )
    train_slides, val_slides = slide_level_split(
        sorted({r.slide for r in manifest}), cfg.data.val_fraction,
        cfg.data.split_seed,
    )
    n_train = sum(r.slide in set(train_slides) for r in manifest)
    assert ep0["patches"] == n_train
    assert len(val_slides) >= 1  # something was actually held out

    # the store left behind is ROW-IDENTICAL to the sequential --patch path
    seq_root = str(tmp_path / "seq")
    shutil.copytree(
        synthetic_case, seq_root, ignore=shutil.ignore_patterns("patches")
    )
    shutil.rmtree(os.path.join(seq_root, "patches"), ignore_errors=True)
    seq_manifest = extract_patches(
        DataConfig(data_dir=seq_root), level=2, stride=112,
        store_format="packed",
    )
    assert _rows(manifest) == _rows(seq_manifest)

    # epochs 1+ ran the standard trainer and saved the artifact
    assert len(result["history"]) == 1
    assert os.path.exists(
        os.path.join(cfg.models_dir, "resnet18_patch_classifier")
    )
