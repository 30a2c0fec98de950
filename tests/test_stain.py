"""Macenko stain normalization."""

import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.data.stain import (
    DEFAULT_MAX_CONC,
    DEFAULT_STAIN_REF,
    macenko_normalize,
    macenko_normalize_batch,
    macenko_stains,
)


def _synthetic_he(seed=0, h=64, w=64, stains=None, max_c=(1.2, 0.8)):
    """Fabricate an H&E-like image from known stain vectors + random
    concentrations (so ground truth is known)."""
    rng = np.random.default_rng(seed)
    stains = DEFAULT_STAIN_REF if stains is None else stains
    conc = np.stack(
        [
            rng.uniform(0.2, max_c[0], h * w),
            rng.uniform(0.1, max_c[1], h * w),
        ]
    )  # (2, N)
    od = (stains @ conc).T  # (N, 3)
    img = np.clip(240.0 * np.exp(-od) - 1.0, 0, 255).astype(np.uint8)
    return img.reshape(h, w, 3)


def test_stain_estimation_recovers_basis():
    img = _synthetic_he(seed=1)
    stains, max_c, tissue_frac = macenko_stains(jnp.asarray(img))
    stains = np.asarray(stains)
    assert float(tissue_frac) > 0.9
    # recovered columns span the true basis (up to sign/order): compare
    # absolute cosine similarity of best matching
    ref = DEFAULT_STAIN_REF
    sims = np.abs(stains.T @ ref)  # (2, 2)
    best = max(sims[0, 0] * sims[1, 1], sims[0, 1] * sims[1, 0])
    assert best > 0.9


def test_normalize_maps_perturbed_image_back():
    """Two images of the same tissue under different stain bases should end
    up close after normalization."""
    rng = np.random.default_rng(3)
    perturb = DEFAULT_STAIN_REF + rng.normal(0, 0.08, (3, 2)).astype(np.float32)
    perturb = np.abs(perturb)
    perturb /= np.linalg.norm(perturb, axis=0, keepdims=True)

    img_a = _synthetic_he(seed=5, stains=DEFAULT_STAIN_REF)
    img_b = _synthetic_he(seed=5, stains=perturb)
    raw_dist = np.abs(img_a.astype(float) - img_b.astype(float)).mean()

    norm_a = np.asarray(macenko_normalize(jnp.asarray(img_a)))
    norm_b = np.asarray(macenko_normalize(jnp.asarray(img_b)))
    norm_dist = np.abs(norm_a.astype(float) - norm_b.astype(float)).mean()
    assert norm_dist < raw_dist * 0.6, (raw_dist, norm_dist)


def test_normalize_white_passthrough():
    white = np.full((32, 32, 3), 250, np.uint8)
    out = np.asarray(macenko_normalize(jnp.asarray(white)))
    np.testing.assert_array_equal(out, white)


def test_normalize_batch_shapes():
    imgs = np.stack([_synthetic_he(seed=s) for s in range(3)])
    out = np.asarray(macenko_normalize_batch(jnp.asarray(imgs)))
    assert out.shape == imgs.shape and out.dtype == np.uint8


def test_normalize_roughly_idempotent():
    img = _synthetic_he(seed=7)
    once = np.asarray(macenko_normalize(jnp.asarray(img)))
    twice = np.asarray(macenko_normalize(jnp.asarray(once)))
    assert np.abs(once.astype(float) - twice.astype(float)).mean() < 6.0


def test_stain_norm_wired_into_extraction(tmp_path):
    """--stain_norm end-to-end: stored patches are normalized, labels and
    coords unchanged (VERDICT round-1 next #8)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches_for_slide,
        list_slides,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        PatchManifest,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PatchReader,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path / "case")
    write_synthetic_case(
        root, "tumor_001",
        tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45), seed=4),
    )
    (name, path), = list_slides(os.path.join(root, "train", "img"))
    xml = os.path.join(root, "annotations", f"{name}.xml")

    plain = extract_patches_for_slide(
        path, xml, level=2, patches_dir=str(tmp_path / "plain"))
    normed = extract_patches_for_slide(
        path, xml, level=2, patches_dir=str(tmp_path / "norm"),
        stain_norm=True)

    assert [(r.x, r.y, r.label) for r in plain] == [
        (r.x, r.y, r.label) for r in normed
    ]
    img_plain = PatchReader(PatchManifest(plain)).read(0)
    img_norm = PatchReader(PatchManifest(normed)).read(0)
    assert img_plain.shape == img_norm.shape
    assert not np.array_equal(img_plain, img_norm)  # normalization applied
    # tissue stays tissue: mean still under the filter threshold
    assert img_norm.mean() <= 240
