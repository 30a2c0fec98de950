"""Quantization-aware training (train/qat.py): the fake-quant graph is the
deployment graph, gradients flow through the STE, and the fine-tune ends in
a working persisted int8 artifact."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
    calibrate,
    fold_batchnorm,
    quant_forward,
    quantize_folded,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.qat import (
    fake_quant_act,
    fake_quant_weight,
    qat_forward,
)
from tests.test_quantized import _realistic_variables


def _folded_tree(variables):
    folded = fold_batchnorm(variables)
    return {
        name: {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        for name, (k, b) in folded.items()
    }, folded


def test_fake_quant_act_values_and_gradient():
    x = jnp.asarray([-3.0, -0.04, 0.0, 0.06, 2.0])
    scale = 0.1
    q = fake_quant_act(x, scale)
    np.testing.assert_allclose(
        np.asarray(q), [-3.0, -0.0, 0.0, 0.1, 2.0], atol=1e-7
    )  # values snap to the int8 lattice (with clipping at ±12.7)
    # STE: gradient is identity
    g = jax.grad(lambda v: jnp.sum(fake_quant_act(v, scale) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0 * np.ones(5), atol=1e-7)


def test_fake_quant_weight_matches_deployment_lattice():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 4, 8)), jnp.float32)
    q = np.asarray(fake_quant_weight(k))
    s = np.max(np.abs(np.asarray(k)), axis=(0, 1, 2)) / 127.0
    steps = q / s  # every entry lands on an integer multiple of its scale
    np.testing.assert_allclose(steps, np.round(steps), atol=1e-4)
    assert np.abs(steps).max() <= 127.0 + 1e-6


def test_qat_forward_tracks_int8_deployment():
    """The fake-quant float graph approximates the true int8 graph closely
    (same topology + same lattices; only requant rounding order differs)."""
    _model, variables = _realistic_variables(jax.random.key(0), size=64)
    fp, folded = _folded_tree(variables)
    rng = np.random.default_rng(1)
    cal = [rng.integers(0, 256, (8, 64, 64, 3)).astype(np.uint8)]
    ascales = calibrate(folded, cal)
    q = quantize_folded(folded, cal, fold_stem_normalize=False)

    x = rng.integers(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    fq = np.asarray(qat_forward(fp, ascales, x))
    i8 = np.asarray(quant_forward(q.tree(), x, with_fc=True))
    cos = float(
        (fq * i8).sum() / (np.linalg.norm(fq) * np.linalg.norm(i8) + 1e-12)
    )
    assert cos > 0.995
    rel = np.abs(fq - i8).max() / (np.abs(i8).max() + 1e-12)
    assert rel < 0.15


def test_qat_gradients_flow_through_every_conv():
    _model, variables = _realistic_variables(jax.random.key(1), size=64)
    fp, folded = _folded_tree(variables)
    rng = np.random.default_rng(2)
    cal = [rng.integers(0, 256, (4, 64, 64, 3)).astype(np.uint8)]
    ascales = calibrate(folded, cal)
    x = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    labels = jnp.asarray([0, 1])

    def loss(p):
        logits = qat_forward(p, ascales, x)
        return -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(2), labels]
        )

    grads = jax.grad(loss)(fp)
    for name, g in grads.items():
        norm = float(jnp.linalg.norm(g["kernel"]))
        assert np.isfinite(norm) and norm > 0, f"dead gradient at {name}"


@pytest.fixture(scope="module")
def qat_setup(synthetic_case, tmp_path_factory):
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches,
    )

    data = DataConfig(data_dir=synthetic_case)
    extract_patches(data, level=2, stride=112, store_format="packed")
    models_dir = str(tmp_path_factory.mktemp("models"))
    cfg = Config(data=data, models_dir=models_dir)
    _model, variables = _realistic_variables(jax.random.key(3), size=64)
    return cfg, variables


def test_qat_finetune_end_to_end(qat_setup):
    """Fine-tune runs, loss decreases or stays finite, the artifact loads
    and the resulting int8 model is at least as accurate as PTQ from the
    same starting point on the training patches."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        load_or_scan_manifest,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
        CLASSIFIER_ARTIFACT,
        load_quantized,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quantize_resnet18,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.qat import (
        qat_finetune,
    )

    cfg, variables = qat_setup
    result = qat_finetune(
        cfg, variables=variables, level=2, epochs=3, batch_size=8,
        learning_rate=1e-3, input_size=64, n_calib_batches=1,
    )
    assert len(result["history"]) == 3
    assert all(np.isfinite(h["loss"]) for h in result["history"])
    path = os.path.join(cfg.models_dir, CLASSIFIER_ARTIFACT)
    assert os.path.exists(path)
    qat_tree = load_quantized(path)

    # accuracy on the (training) patches: QAT-int8 vs PTQ-int8
    manifest = load_or_scan_manifest(cfg.data.patches_dir, 2)
    ds = PatchDataset(manifest, resize_to=64)
    idx = list(range(len(ds)))
    imgs, labels = ds.read_batch(idx)
    ptq_tree = quantize_resnet18(variables, [imgs]).tree()

    def acc(tree):
        logits = np.asarray(quant_forward(tree, imgs, with_fc=True))
        return float((logits.argmax(-1) == labels).mean())

    assert acc(qat_tree) >= acc(ptq_tree) - 1e-9
