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


def _toy_variables(d=16, k=40, seed=3):
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
        MILClassifier,
    )

    model = MILClassifier()
    rng = np.random.default_rng(seed)
    feats = rng.normal(0, 1, (k, d)).astype(np.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, k, d)), jnp.ones((1, k), bool)
    )
    return variables, feats


def test_mil_predict_streaming_matches_xla():
    """The streaming (Pallas) inference path — pooled bag, head logits,
    attention map — reproduces the XLA module exactly; the bag-size
    threshold routes automatically."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config as Cfg,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.mil_trainer import (
        mil_predict,
    )

    variables, feats = _toy_variables()
    cfg = Cfg()
    cfg.mil.max_bag_size = 64
    ref = mil_predict(variables, feats, cfg, streaming=False)
    got = mil_predict(variables, feats, cfg, streaming=True)
    np.testing.assert_allclose(got["probs"], ref["probs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["attention"], ref["attention"], rtol=1e-4, atol=1e-6
    )
    assert got["prediction"] == ref["prediction"]

    # auto-routing: bags at/above the threshold stream
    cfg.mil.streaming_bag_threshold = 16
    auto = mil_predict(variables, feats, cfg)
    np.testing.assert_allclose(auto["probs"], got["probs"], rtol=1e-6)


def test_mil_predict_mc_dropout_head_only_sampling():
    """MC-dropout over the once-pooled bag (head-only sampling) converges to
    the same predictive mean as full-model re-pooling — dropout sits
    entirely after the deterministic pooling."""
    import jax

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config as Cfg,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (
        MILClassifier,
        pad_bag,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.mil_trainer import (
        mil_predict,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.uncertainty import (
        monte_carlo_dropout,
    )
    import jax.numpy as jnp

    variables, feats_np = _toy_variables(seed=4)
    cfg = Cfg()
    cfg.mil.max_bag_size = 64
    cfg.uncertainty.monte_carlo_samples = 400

    pred = mil_predict(
        variables, feats_np, cfg, mc_dropout=True, rng=jax.random.key(1)
    )
    assert pred["mc_mean"].shape == (2,)
    assert float(pred["mc_variance"].max()) > 0.0  # dropout is stochastic

    # reference: full-model MC sampling (independent noise stream)
    model = MILClassifier(dropout_rate=cfg.mil.dropout_rate)
    feats, mask = pad_bag(feats_np, 40)
    mean_full, _ = monte_carlo_dropout(
        lambda v, x, **kw: model.apply(v, x, jnp.asarray(mask[None]),
                                       train=True, **kw),
        variables,
        jnp.asarray(feats[None]),
        jax.random.key(2),
        n_samples=400,
    )
    np.testing.assert_allclose(
        pred["mc_mean"], np.asarray(mean_full)[0], atol=0.06
    )
