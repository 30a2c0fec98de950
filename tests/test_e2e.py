"""End-to-end learning-signal tests on the synthetic dataset.

The SURVEY §6 golden numbers (89,598 patches, logreg 0.8661, …) are
full-dataset artifacts; the hermetic analogue asserts that each pipeline
learns the synthetic tumor/normal distinction (tumor patches are tinted —
linearly separable), mirroring the reference's sanity-check philosophy
(``src/main.py:1017-1070``).
"""

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    PatchDataset,
)


@pytest.fixture(scope="module")
def learnable_dataset(tmp_path_factory):
    # a PRIVATE data root, not the shared ``synthetic_case``: extraction
    # is idempotent per (root, level), so sharing the root would silently
    # inherit whatever stride another test extracted first — at stride 112
    # the fit runs 2 steps/epoch and this test measures augmentation luck
    # instead of learning
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path_factory.mktemp("e2e_learn"))
    write_synthetic_case(
        root, "tumor_001",
        tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45), seed=1),
    )
    write_synthetic_case(
        root, "normal_001",
        SyntheticSlideSpec(
            width=1792, height=1344, tissue_radii=(0.45, 0.45), seed=2
        ),
    )
    data = DataConfig(data_dir=root)
    # stride 56 (vs the 112 patch grid elsewhere): ~33 patches instead of
    # ~10 — the learning test needs enough steps per epoch that the fit
    # isn't dominated by the luck of per-step augmentation draws
    manifest = extract_patches(data, level=2, stride=56, store_format="packed")
    # per-class counts needed for learning: require both classes present
    counts = manifest.class_counts()
    assert counts.get(0, 0) > 0 and counts.get(1, 0) > 0
    return PatchDataset(manifest, resize_to=64)


def test_classifier_learns_synthetic_tumors(learnable_dataset):
    """The full train pipeline (augment → fwd → weighted CE → Adam) fits
    the linearly separable tumor tint.

    Runs in frozen-BN mode so the eval graph equals the train graph: with
    mutable BatchNorm the running statistics chase the color-jittered batch
    distribution and val accuracy lags the fit by many epochs on a fixture
    this small — the test would measure BN-stat convergence, not learning.
    The mutable-BN update path is covered by ``tests/test_train.py``."""
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train import (
        Trainer,
        class_weights_inv_min,
    )

    ds = learnable_dataset
    trainer = Trainer(
        ResNet18Classifier(dtype=jnp.float32, frozen_bn=True),
        ds,
        val_ds=ds,  # train-set eval: we assert the model can FIT the signal
        batch_size=8,
        learning_rate=3e-3,
        class_weights=class_weights_inv_min(ds.labels),
        seed=0,
        frozen_bn=True,
    )
    history = trainer.fit(num_epochs=20)
    best = max(h["val_acc"] for h in history)
    assert best >= 0.9, (
        f"classifier failed to fit synthetic tumors: {history[-3:]}"
    )


def test_feature_extraction_and_validation(learnable_dataset):
    """Feature extraction + ``--validate`` sanity-eval mechanics end-to-end."""
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation import (
        validate_features,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
        run_feature_extraction,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models import (
        ResNet18FeatureExtractor,
    )

    ds = learnable_dataset
    fx = ResNet18FeatureExtractor(dtype=jnp.float32)
    variables = fx.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    feats, labels, _names = run_feature_extraction(
        ds, dict(variables), batch_size=8, dtype=jnp.float32
    )
    assert feats.shape == (len(ds), 512)
    assert np.isfinite(feats).all()
    # validate_features runs end-to-end on real extracted features and
    # reports the full structure (PCA variance/means, logreg accuracy)
    result = validate_features(feats, labels, run_tsne=False)
    assert len(result["pca_explained_variance"]) == 2
    assert set(result["pca_class_means"]) == {0, 1}
    assert "logreg_accuracy" in result
