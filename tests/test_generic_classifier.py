"""Generic classification harness (the BaseModel replacement) + image bags."""

import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.train.generic_classifier import (
    ArrayDataset,
    GenericClassifierTrainer,
)


def _toy_dataset(n=120, size=16, seed=0):
    """Two classes separable by mean brightness."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n)
    base = np.where(labels[:, None, None, None] == 1, 180, 70)
    images = np.clip(
        base + rng.normal(0, 20, (n, size, size, 3)), 0, 255
    ).astype(np.uint8)
    return images, labels.astype(np.int32)


def test_split_70_15_15():
    images, labels = _toy_dataset()
    ds = ArrayDataset.from_arrays(images, labels)
    assert len(ds.train_x) == 84 and len(ds.val_x) == 18 and len(ds.test_x) == 18


def test_generic_trainer_learns():
    import flax.linen as nn
    import jax.numpy as jnp

    class TinyCNN(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(2)(x)

    images, labels = _toy_dataset()
    ds = ArrayDataset.from_arrays(images, labels)
    trainer = GenericClassifierTrainer(
        TinyCNN(), (1, 16, 16, 3), num_classes=2, learning_rate=1e-2
    )
    trainer.fit(ds, epochs=30, batch_size=32)
    test_acc = trainer.evaluate(ds.test_x, ds.test_y)
    assert test_acc >= 0.9


def test_stablehlo_export(tmp_path):
    import flax.linen as nn
    import jax.numpy as jnp

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    images, labels = _toy_dataset(n=40)
    ds = ArrayDataset.from_arrays(images, labels)
    trainer = GenericClassifierTrainer(Head(), (1, 16, 16, 3), 2)
    path = str(tmp_path / "model.stablehlo")
    trainer.export_stablehlo(path, (1, 16, 16, 3))
    assert os.path.getsize(path) > 0


def test_image_bags_from_manifest(synthetic_case):
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.mil import (
        image_bags_from_manifest,
    )

    data = DataConfig(data_dir=synthetic_case)
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    bags = image_bags_from_manifest(manifest, resize_to=64)
    assert {b.slide for b in bags} == {"tumor_001", "normal_001"}
    tumor_bag = next(b for b in bags if b.slide == "tumor_001")
    assert tumor_bag.label == 1
    assert tumor_bag.features.dtype == np.uint8
    assert tumor_bag.features.shape[1:] == (64, 64, 3)
    assert tumor_bag.coords.shape == (len(tumor_bag.features), 2)
