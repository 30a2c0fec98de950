"""MIL track: bag construction, trainer, prediction with uncertainty."""

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.mil import (
    Bag,
    MILBagIterator,
    build_bags,
    slide_from_patch_name,
)


def test_slide_from_patch_name():
    assert slide_from_patch_name("tumor_001_x224_y448_tumor.png") == "tumor_001"
    assert slide_from_patch_name("normal_012_x0_y0_normal.png") == "normal_012"


def _fake_features(seed=0):
    """Two slides: tumor bag has a separable cluster of tumor patches."""
    rng = np.random.default_rng(seed)
    names, feats, labels = [], [], []
    for i in range(12):
        names.append(f"normal_001_x{i * 224}_y0_normal.png")
        feats.append(rng.normal(0, 1, 16))
        labels.append(0)
    for i in range(12):
        is_tumor = i < 5
        lbl = "tumor" if is_tumor else "normal"
        names.append(f"tumor_001_x{i * 224}_y0_{lbl}.png")
        feats.append(rng.normal(3 if is_tumor else 0, 1, 16))
        labels.append(1 if is_tumor else 0)
    return np.array(feats, np.float32), np.array(labels), names


def test_build_bags_labels():
    feats, labels, names = _fake_features()
    bags = build_bags(feats, labels, names)
    assert [b.slide for b in bags] == ["normal_001", "tumor_001"]
    assert bags[0].label == 0  # all-normal slide
    assert bags[1].label == 1  # any tumor patch ⇒ tumor slide (mildataset.py:29-30)
    assert bags[0].features.shape == (12, 16)


def test_bag_iterator_static_shapes():
    feats, labels, names = _fake_features()
    bags = build_bags(feats, labels, names)
    it = MILBagIterator(bags, batch_size=4, max_bag_size=16, shuffle=False)
    batches = list(it)
    assert len(batches) == 1
    f, m, l, v = batches[0]
    assert f.shape == (4, 16, 16) and m.shape == (4, 16)
    assert v.tolist() == [1.0, 1.0, 0.0, 0.0]  # two real bags, two padding
    assert m[0].sum() == 12


def test_mil_trainer_end_to_end(tmp_path):
    from ss25_hierarchical_multiscale_image_classification_tpu.train.mil_trainer import (
        mil_predict,
        train_mil_classifier,
    )

    rng = np.random.default_rng(1)
    bags = []
    for i in range(8):
        tumor = i % 2 == 1
        center = 3.0 if tumor else 0.0
        feats = rng.normal(center, 1.0, (20, 16)).astype(np.float32)
        bags.append(Bag(slide=f"s{i}", features=feats, label=int(tumor)))

    cfg = Config(models_dir=str(tmp_path / "models"))
    cfg.mil.input_dim = 16
    cfg.mil.max_bag_size = 32
    cfg.mil.learning_rate = 1e-2  # toy problem, few steps
    result = train_mil_classifier(cfg, bags=bags, epochs=60)
    assert result["val_accuracy"] >= 0.0
    # training accuracy should be high on this separable toy problem
    assert result["history"][-1]["acc"] > 0.7

    pred = mil_predict(
        result["variables"], bags[1].features, cfg, mc_dropout=True
    )
    assert pred["probs"].shape == (2,)
    assert pred["attention"] is not None and len(pred["attention"]) == 20
    assert pred["mc_variance"].shape == (2,)
