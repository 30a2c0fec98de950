"""On-device augmentation pipelines."""

import jax
import jax.numpy as jnp
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
    color_jitter,
    normalize,
    preprocess_batch,
    random_resized_crop,
    resize,
    simclr_two_views,
)


def test_normalize_matches_imagenet_stats():
    imgs = np.full((2, 4, 4, 3), 255, np.uint8)
    out = np.asarray(normalize(jnp.asarray(imgs)))
    expected = (1.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_preprocess_eval_is_deterministic_normalize():
    imgs = np.random.default_rng(0).integers(0, 256, (4, 224, 224, 3), np.uint8)
    out = np.asarray(preprocess_batch(jax.random.key(0), jnp.asarray(imgs), training=False))
    ref = np.asarray(normalize(jnp.asarray(imgs)))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_preprocess_train_shapes_and_randomness():
    imgs = np.random.default_rng(0).integers(0, 256, (4, 224, 224, 3), np.uint8)
    a = np.asarray(preprocess_batch(jax.random.key(0), jnp.asarray(imgs), training=True))
    b = np.asarray(preprocess_batch(jax.random.key(1), jnp.asarray(imgs), training=True))
    assert a.shape == (4, 224, 224, 3)
    assert not np.allclose(a, b)  # different keys → different augs
    c = np.asarray(preprocess_batch(jax.random.key(0), jnp.asarray(imgs), training=True))
    np.testing.assert_allclose(a, c)  # same key → reproducible


def test_color_jitter_identity_when_zero():
    img = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)), jnp.float32)
    out = color_jitter(jax.random.key(0), img, 0.0, 0.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_resize_identity():
    img = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)), jnp.float32)
    out = resize(img, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_resize_downsamples_constant():
    img = jnp.full((32, 32, 3), 0.5, jnp.float32)
    out = resize(img, 8)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_random_resized_crop_bounds():
    img = jnp.asarray(np.random.default_rng(0).random((64, 64, 3)), jnp.float32)
    out = random_resized_crop(jax.random.key(3), img, 32)
    assert out.shape == (32, 32, 3)
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5


def test_simclr_two_views_differ():
    imgs = np.random.default_rng(0).integers(0, 256, (2, 64, 64, 3), np.uint8)
    v1, v2 = simclr_two_views(jax.random.key(0), jnp.asarray(imgs), out_size=32)
    assert v1.shape == v2.shape == (2, 32, 32, 3)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
