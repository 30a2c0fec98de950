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


def test_fused_augment_matches_reference_chain():
    """The fused batched augment (D4 decomposition + composed color affine)
    must match the per-example op chain driven by the same parameters,
    within bf16 tolerance, across all 16 geometric combinations."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        _augment_one_with_params,
        augment_batch,
    )

    rng = np.random.default_rng(7)
    b = 16
    imgs = rng.integers(0, 256, (b, 32, 32, 3), np.uint8)
    params = {
        "h": jnp.asarray(([0, 1] * 8)[:b], bool),
        "v": jnp.asarray(([0, 0, 1, 1] * 4)[:b], bool),
        "k": jnp.asarray(list(range(4)) * 4)[:b],
        "fb": jnp.asarray(rng.uniform(0.8, 1.2, b), jnp.float32),
        "fc": jnp.asarray(rng.uniform(0.8, 1.2, b), jnp.float32),
        "fs": jnp.asarray(rng.uniform(0.8, 1.2, b), jnp.float32),
        "fh": jnp.asarray(rng.uniform(-0.1, 0.1, b), jnp.float32),
    }
    fused = np.asarray(augment_batch(params, jnp.asarray(imgs)))

    mean = np.asarray(IMAGENET_MEAN) * 255.0
    std = np.asarray(IMAGENET_STD) * 255.0
    for i in range(b):
        ref = _augment_one_with_params(
            jnp.asarray(imgs[i]), params["h"][i], params["v"][i],
            params["k"][i], params["fb"][i], params["fc"][i],
            params["fs"][i], params["fh"][i],
        )
        ref = (np.asarray(ref, np.float32) * 255.0 - mean) / std
        np.testing.assert_allclose(fused[i], ref, atol=0.15)


def test_preprocess_batch_distribution_sane():
    """Augmented output stays in the normalized range of [0,1] images."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )

    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), np.uint8))
    out = np.asarray(preprocess_batch(jax.random.key(5), imgs, training=True))
    lo = (0.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    hi = (1.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    assert np.isfinite(out).all()
    assert (out >= lo - 1e-2).all() and (out <= hi + 1e-2).all()


def test_fused_simclr_view_matches_reference_chain():
    """Fused batched SimCLR view == per-example chain (same crop rng and
    color params), post-normalization, within bf16 tolerance — including
    the jitter@0.8 / grayscale@0.2 stochastic branches."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        _simclr_view_one_with_params,
        simclr_view_batch,
    )

    rng = np.random.default_rng(11)
    b = 12
    imgs = rng.integers(0, 256, (b, 48, 48, 3), np.uint8)
    params = {
        "h": jnp.asarray(([0, 1] * 6)[:b], bool),
        "jp": jnp.asarray(([1, 1, 1, 0] * 3)[:b], bool),
        "gp": jnp.asarray(([0, 0, 1] * 4)[:b], bool),
        "fb": jnp.asarray(rng.uniform(0.6, 1.4, b), jnp.float32),
        "fc": jnp.asarray(rng.uniform(0.6, 1.4, b), jnp.float32),
        "fs": jnp.asarray(rng.uniform(0.6, 1.4, b), jnp.float32),
        "fh": jnp.asarray(rng.uniform(-0.1, 0.1, b), jnp.float32),
    }
    crop_rngs = jax.random.split(jax.random.key(2), b)
    fused = np.asarray(
        simclr_view_batch(crop_rngs, params, jnp.asarray(imgs), 32)
    )
    mean = np.asarray(IMAGENET_MEAN)
    std = np.asarray(IMAGENET_STD)
    for i in range(b):
        ref = _simclr_view_one_with_params(
            crop_rngs[i], jnp.asarray(imgs[i]), 32,
            params["h"][i], params["jp"][i], params["gp"][i],
            params["fb"][i], params["fc"][i], params["fs"][i],
            params["fh"][i],
        )
        ref = (np.asarray(ref, np.float32) - mean) / std
        np.testing.assert_allclose(fused[i], ref, atol=0.15)
