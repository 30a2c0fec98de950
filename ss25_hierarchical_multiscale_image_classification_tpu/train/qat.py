"""Quantization-aware training (QAT) fine-tune for the int8 deployment path.

Post-training quantization (``models/quantized.py``) is the default; QAT is
the recovery tool when PTQ shows an accuracy gap. The scheme mirrors the
int8 inference graph EXACTLY — same BN-folded topology, same per-output-
channel symmetric weight quantization, same per-tensor activation
quantization points (``in``/``p0``/``s{i}b{j}y1``/``s{i}b{j}o`` — see
``quant_forward``) — as fake-quant ops with straight-through-estimator
gradients (Bengio et al. 2013; the standard int8 QAT recipe of Jacob et
al. 2018), so what the fine-tune optimizes is what deployment runs.

Activation scales are frozen from an initial max-abs calibration (scale-
frozen QAT); weights and biases of the folded graph train. The tuned
folded tree re-quantizes through :func:`~..models.quantized.quantize_folded`
into the same persisted artifact ``--int8`` consumes
(``models/quant_artifact.py``), so ``--qat`` upgrades deployment in place.

The reference has no quantization at all; this extends its training stack
(``src/main.py:472-534``) for the int8 serving path.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
    _STAGES,
    calibrate,
    fold_batchnorm,
    folded_forward,
    quantize_folded,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)

log = get_logger("train.qat")


def _ste(x, q):
    """Straight-through estimator: forward q, gradient of x."""
    return x + lax.stop_gradient(q - x)


def fake_quant_act(x, scale):
    """Per-tensor symmetric int8 fake-quant at a frozen scale."""
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0) * scale
    return _ste(x, q)


def fake_quant_weight(k):
    """Per-output-channel symmetric int8 fake-quant, scale recomputed from
    the live weights each step (matches ``_quantize_weights``)."""
    s = jnp.max(jnp.abs(k), axis=(0, 1, 2), keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(k / s), -127.0, 127.0) * s
    return _ste(k, q)


def _convf(x, kernel, bias, strides, pad):
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = lax.conv_general_dilated(
        x, kernel, (strides, strides), pad, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return y + bias


def qat_forward(fp: dict, ascales: dict, imgs_u8, with_fc: bool = True):
    """Differentiable twin of ``quant_forward``: float math with fake-quant
    at every int8 tensor of the deployment graph.

    ``fp`` is the trainable folded tree ``{name: {"kernel", "bias"}}``
    (plus ``"fc"``); ``ascales`` the frozen activation scales from
    :func:`~..models.quantized.calibrate`.
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        _normalize_f32,
    )

    x = fake_quant_act(_normalize_f32(imgs_u8), ascales["in"])
    k = fake_quant_weight(fp["stem"]["kernel"])
    x = _convf(x, k, fp["stem"]["bias"], 2, [(3, 3), (3, 3)])
    x = jax.nn.relu(x)
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    x = fake_quant_act(x, ascales["p0"])
    for i, blocks in _STAGES:
        for j in range(blocks):
            strides = 2 if i > 1 and j == 0 else 1
            res = x
            k1 = fake_quant_weight(fp[f"s{i}b{j}c1"]["kernel"])
            y = _convf(x, k1, fp[f"s{i}b{j}c1"]["bias"], strides,
                       [(1, 1), (1, 1)])
            y = fake_quant_act(jax.nn.relu(y), ascales[f"s{i}b{j}y1"])
            k2 = fake_quant_weight(fp[f"s{i}b{j}c2"]["kernel"])
            y = _convf(y, k2, fp[f"s{i}b{j}c2"]["bias"], 1, [(1, 1), (1, 1)])
            if f"s{i}b{j}down" in fp:
                kd = fake_quant_weight(fp[f"s{i}b{j}down"]["kernel"])
                res = _convf(res, kd, fp[f"s{i}b{j}down"]["bias"], strides,
                             [(0, 0), (0, 0)])
            x = fake_quant_act(
                jax.nn.relu(y + res), ascales[f"s{i}b{j}o"]
            )
    feats = jnp.mean(x, axis=(1, 2))
    if with_fc and "fc" in fp:
        return feats @ fp["fc"]["kernel"] + fp["fc"]["bias"]
    return feats


def qat_finetune(
    cfg: Config,
    variables: dict | None = None,
    level: int = 3,
    epochs: int | None = None,
    batch_size: int | None = None,
    learning_rate: float = 1e-5,
    n_calib_batches: int = 4,
    save: bool = True,
    input_size: int | None = None,
) -> dict:
    """Fine-tune the trained classifier under fake quantization and persist
    the resulting int8 artifact (``quantized_resnet18.npz``).

    Returns {"folded", "ascales", "history", "artifact_path", "quantized"}.
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        BatchIterator,
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        load_or_scan_manifest,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
        CLASSIFIER_ARTIFACT,
        save_quantized,
        training_calibration_batches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        load_model,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
        class_weights_inv_min,
        weighted_cross_entropy,
    )

    if variables is None:
        variables = load_model(
            os.path.join(cfg.models_dir, "resnet18_patch_classifier")
        )
    calib = training_calibration_batches(
        cfg, level, n_batches=n_calib_batches,
        batch_size=min(batch_size or 128, 128), input_size=input_size,
    )
    folded = fold_batchnorm(variables)
    ascales = calibrate(folded, calib)
    fp = {
        name: {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
        for name, (k, b) in folded.items()
    }

    manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
    dataset = (
        PatchDataset(manifest, resize_to=input_size)
        if input_size else PatchDataset(manifest)
    )
    weights = jnp.asarray(
        class_weights_inv_min(dataset.labels, cfg.model.num_classes)
    )
    mesh = make_mesh()
    fp = replicate(mesh, fp)
    ascales = replicate(mesh, ascales)
    tx = optax.adam(learning_rate)
    opt_state = replicate(mesh, tx.init(jax.device_get(fp)))

    @jax.jit
    def step(fp, opt_state, imgs, labels, valid):
        def loss_fn(p):
            logits = qat_forward(p, ascales, imgs)
            loss = weighted_cross_entropy(logits, labels, weights, valid)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(fp)
        updates, opt_state = tx.update(grads, opt_state, fp)
        fp = optax.apply_updates(fp, updates)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * valid)
        return fp, opt_state, loss, correct, jnp.sum(valid)

    epochs = epochs or cfg.train.strategy_epochs
    batch_size = batch_size or cfg.train.batch_size
    history = []
    for epoch in range(epochs):
        t0 = time.perf_counter()
        outs = []
        for imgs, labels, valid in BatchIterator(
            dataset, batch_size, shuffle=True, seed=cfg.train.seed + epoch
        ):
            imgs_d, labels_d, valid_d = shard_batch(
                mesh, (imgs, labels.astype(np.int32), valid)
            )
            fp, opt_state, loss, c, n = step(
                fp, opt_state, imgs_d, labels_d, valid_d
            )
            outs.append((loss, c, n))
        fetched = jax.device_get(outs)
        loss = float(sum(v[0] for v in fetched))
        acc = float(sum(v[1] for v in fetched)) / max(
            float(sum(v[2] for v in fetched)), 1.0
        )
        history.append({"epoch": epoch, "loss": loss, "acc": acc})
        log.info("QAT epoch %d/%d: loss %.4f acc %.4f (%.1fs)",
                 epoch + 1, epochs, loss, acc, time.perf_counter() - t0)

    fp_host = jax.device_get(fp)
    folded_tuned = {
        name: (np.asarray(v["kernel"]), np.asarray(v["bias"]))
        for name, v in fp_host.items()
    }
    # re-quantize the tuned weights; activation scales recalibrate on the
    # tuned network (its distributions shifted during the fine-tune)
    q = quantize_folded(folded_tuned, calib)
    path = None
    if save:
        path = save_quantized(
            os.path.join(cfg.models_dir, CLASSIFIER_ARTIFACT), q.tree()
        )
        log.info("QAT int8 artifact saved: %s", path)
    return {
        "folded": folded_tuned,
        "ascales": jax.device_get(ascales),
        "history": history,
        "artifact_path": path,
        "quantized": q,
    }
