"""int8 (w8a8) post-training quantization: BN folding, calibration, and
logit/feature fidelity vs the float model (models/quantized.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
    QuantizedResNet18,
    fold_batchnorm,
    folded_forward,
    quant_forward,
    quantize_resnet18,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)


def _realistic_variables(rng_key, size=64):
    """Random-init variables with non-degenerate BN statistics (random
    means/vars and non-zero second-BN scales, as a trained net would have)."""
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        rng_key, jnp.zeros((1, size, size, 3), jnp.float32), train=False
    )
    rng = np.random.default_rng(0)

    def renoise(tree, is_stats):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = renoise(v, is_stats)
            elif is_stats and k == "mean":
                out[k] = jnp.asarray(
                    rng.normal(0.0, 0.3, v.shape), jnp.float32
                )
            elif is_stats and k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, v.shape), jnp.float32
                )
            elif k == "scale":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape), jnp.float32
                )
            elif k == "bias":
                out[k] = jnp.asarray(
                    rng.normal(0.0, 0.1, v.shape), jnp.float32
                )
            else:
                out[k] = v
        return out

    return model, {
        "params": renoise(variables["params"], False),
        "batch_stats": renoise(variables["batch_stats"], True),
    }


@pytest.fixture(scope="module")
def setup():
    model, variables = _realistic_variables(jax.random.key(0))
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    # tissue-like: mid-range pixels so activations are in a realistic band
    imgs = (imgs // 2 + 100).astype(np.uint8)
    return model, variables, imgs


def test_bn_folding_matches_float_model(setup):
    """Folded conv+bias forward == the flax model's eval forward (identity
    transform; f32 vs f32)."""
    model, variables, imgs = setup
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )

    ref = model.apply(
        variables,
        preprocess_batch(jax.random.key(0), jnp.asarray(imgs), training=False),
        train=False,
    )
    folded = fold_batchnorm(variables)
    got = folded_forward(folded, jnp.asarray(imgs), with_fc=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3
    )


def test_calibration_observes_all_points(setup):
    _, variables, imgs = setup
    q = quantize_resnet18(variables, [imgs[:4], imgs[4:]])
    # stem in/out + 8 blocks x (y1, o) points
    assert "in" in q.ascales and "p0" in q.ascales
    for i, blocks in ((1, 2), (2, 2), (3, 2), (4, 2)):
        for j in range(blocks):
            assert f"s{i}b{j}y1" in q.ascales
            assert f"s{i}b{j}o" in q.ascales
    for s in jax.tree_util.tree_leaves(q.ascales):
        assert float(s) > 0


def test_int8_conv_exact_on_representable_values():
    """When weights and activations are exact multiples of their scales the
    int8 conv path reproduces the float conv bit-meaningfully (machinery
    check: quant/dequant round trip introduces zero error)."""
    rng = np.random.default_rng(2)
    s_w, s_x = 0.5, 0.25
    k = (rng.integers(-3, 4, (3, 3, 8, 8)) * s_w).astype(np.float32)
    x = (rng.integers(0, 5, (2, 8, 8, 8)) * s_x).astype(np.float32)

    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    xq = jnp.asarray(np.rint(x / s_x).astype(np.int8))
    kq = jnp.asarray(np.rint(k / s_w).astype(np.int8))
    got = lax.conv_general_dilated(
        xq, kq, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (s_x * s_w)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_quant_logits_track_float(setup):
    """End-to-end w8a8 forward stays close to the float forward: high cosine
    similarity and small logit error relative to the logit scale."""
    model, variables, imgs = setup
    q = quantize_resnet18(variables, [imgs])
    ref = np.asarray(folded_forward(fold_batchnorm(variables),
                                    jnp.asarray(imgs), with_fc=True))
    got = np.asarray(jax.jit(q.forward)(jnp.asarray(imgs)))
    assert got.shape == ref.shape
    a, b = ref.ravel(), got.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(got - ref).max() / scale < 0.15


def test_quant_features_and_agreement(setup):
    """Feature path (no fc) shape + per-example prediction agreement."""
    model, variables, imgs = setup
    q = quantize_resnet18(variables, [imgs])
    feats = np.asarray(jax.jit(q.features)(jnp.asarray(imgs)))
    assert feats.shape == (imgs.shape[0], 512)
    assert np.isfinite(feats).all()

    ref = np.asarray(folded_forward(fold_batchnorm(variables),
                                    jnp.asarray(imgs), with_fc=True))
    got = np.asarray(q.forward(jnp.asarray(imgs)))
    # argmax agreement on every example whose float margin is non-trivial
    margin = np.abs(ref[:, 0] - ref[:, 1])
    confident = margin > 0.05 * np.abs(ref).max()
    if confident.any():
        assert (ref.argmax(1) == got.argmax(1))[confident].all()


def test_quant_tree_is_jit_stable(setup):
    """The qparams tree works as a jit argument (weights stay int8, no
    silent upcast) and the forward is deterministic."""
    _, variables, imgs = setup
    q = quantize_resnet18(variables, [imgs])
    for k, v in q.qkernels.items():
        assert v.dtype == jnp.int8, (k, v.dtype)
    f = jax.jit(lambda qp, x: quant_forward(qp, x, with_fc=True))
    o1 = np.asarray(f(q.tree(), jnp.asarray(imgs)))
    o2 = np.asarray(f(q.tree(), jnp.asarray(imgs)))
    np.testing.assert_array_equal(o1, o2)


def test_int8_feature_extraction_wiring(synthetic_case):
    """run_feature_extraction(int8=True): quantize-on-load, artifact shape."""
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
        run_feature_extraction,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18FeatureExtractor,
    )

    data = DataConfig(data_dir=synthetic_case)
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    ds = PatchDataset(manifest, resize_to=64)
    fx = ResNet18FeatureExtractor(dtype=jnp.float32)
    variables = fx.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    feats, labels, names = run_feature_extraction(
        ds, dict(variables), batch_size=8, int8=True
    )
    assert feats.shape == (len(ds), 512)
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_int8_predict_slide(synthetic_case, setup):
    """predict_slide(int8=True): valid probability grid on the synthetic
    tumor slide (lazy same-slide calibration)."""
    import os

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        predict_slide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )

    model, variables, _ = setup
    slide_path = os.path.join(
        synthetic_case, "train", "img", "tumor_001.wsi.npz"
    )
    probs, grid = predict_slide(
        slide_path, variables, level=3, batch_size=8,
        model=ResNet18Classifier(dtype=jnp.float32), input_size=64, int8=True,
    )
    assert probs.shape == (grid.ny, grid.nx)
    assert (probs >= 0).all() and (probs <= 1).all()
    assert np.isfinite(probs).all()


def test_stem_s2d_exact_equivalence(setup):
    """The space-to-depth stem reformulation is bit-exact vs the direct
    7x7/2 int8 conv (integer accumulation is order-independent)."""
    _, variables, imgs = setup
    q_ref = quantize_resnet18(variables, [imgs], stem_s2d=False)
    q_s2d = quantize_resnet18(variables, [imgs], stem_s2d=True)
    ref = np.asarray(q_ref.forward(jnp.asarray(imgs)))
    got = np.asarray(q_s2d.forward(jnp.asarray(imgs)))
    np.testing.assert_array_equal(got, ref)


def test_folded_bf16_inference_parity(setup):
    """The bf16 inference-folded forward (BN fold + normalize fold + s2d
    stem) matches the f32 folded reference within bf16 tolerance."""
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        fold_resnet18_inference,
        folded_forward_inference,
    )

    _, variables, imgs = setup
    fp = fold_resnet18_inference(variables, input_hw=imgs.shape[1:3])
    got = np.asarray(folded_forward_inference(fp, jnp.asarray(imgs)))
    ref = np.asarray(folded_forward(fold_batchnorm(variables), jnp.asarray(imgs)))
    assert got.shape == ref.shape
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.995, cos
    # magnitudes agree to bf16 precision at the batch level
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=-1), np.linalg.norm(ref, axis=-1), rtol=0.05
    )


def test_folded_bf16_features_match_flax_extractor(setup):
    """with_fc=False features line up with the flax bf16 extractor path
    (the pre-fold production forward)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        fold_resnet18_inference,
        folded_forward_inference,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18FeatureExtractor,
        strip_head,
    )

    _, variables, imgs = setup
    trunk = strip_head(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}
    )
    model = ResNet18FeatureExtractor(dtype=jnp.bfloat16)
    ref = np.asarray(
        model.apply(
            trunk,
            preprocess_batch(jax.random.key(0), jnp.asarray(imgs), training=False),
            train=False,
        ),
        np.float32,
    )
    fp = fold_resnet18_inference(trunk, input_hw=imgs.shape[1:3])
    got = np.asarray(
        folded_forward_inference(fp, jnp.asarray(imgs), with_fc=False)
    )
    assert got.shape == ref.shape == (imgs.shape[0], 512)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.995, cos


def test_int8_quantizes_fcless_trunk(setup):
    """The SimCLR/feature-extraction trunk (no fc head — reference
    ``src/main.py:897-932`` SimCLR variant) quantizes and runs: covers
    ``--extract_features --int8`` on encoder checkpoints."""
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        strip_head,
    )

    _, variables, imgs = setup
    trunk = strip_head(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}
    )
    assert "fc" not in trunk["params"]
    q = quantize_resnet18(trunk, [imgs])
    feats = np.asarray(q.features(jnp.asarray(imgs)))
    assert feats.shape == (imgs.shape[0], 512)
    ref = np.asarray(
        folded_forward(fold_batchnorm(trunk), jnp.asarray(imgs), with_fc=False)
    )
    cos = (feats * ref).sum(-1) / (
        np.linalg.norm(feats, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.98, cos


def test_quant_forward_pre_s2d_input_exact(setup):
    """Feeding the host-side space-to-depth batch gives bit-identical
    results to the raw (B,H,W,3) input with the on-device transpose."""
    from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
        space_to_depth_u8,
    )

    _, variables, imgs = setup
    q = quantize_resnet18(variables, [imgs], stem_s2d=True)
    ref = np.asarray(q.forward(jnp.asarray(imgs)))
    got = np.asarray(q.forward(jnp.asarray(space_to_depth_u8(imgs))))
    np.testing.assert_array_equal(got, ref)
