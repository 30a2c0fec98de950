"""Patch-classifier evaluation on the validation split.

Rebuild of ``evaluate_resnet_classifier`` (``src/main.py:974-1015``). The
reference version is broken as written — it calls ``get_dataloaders`` with a
positional ``transform`` argument the function doesn't accept
(``src/main.py:992-994``, SURVEY.md C17); the intended behavior (evaluate the
saved model on the balanced validation loader and report accuracy) is what's
built here, extended with the full scratch-metric report.
"""

from __future__ import annotations

import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    BatchIterator,
    make_train_val_datasets,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    load_model,
)

log = get_logger("evaluation.classifier")


def evaluate_resnet_classifier(
    cfg: Config,
    level: int = 3,
    model_path: str | None = None,
    batch_size: int | None = None,
) -> dict:
    """Evaluate the saved classifier on the balanced validation split;
    returns the scratch-metric report (accuracy/precision/recall/F1/CM)."""
    import jax

    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.metrics import (
        classification_report,
    )

    manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
    if len(manifest) == 0:
        raise FileNotFoundError(f"no patches at level {level}")
    _, val_ds = make_train_val_datasets(
        manifest,
        val_fraction=cfg.data.val_fraction,
        split_seed=cfg.data.split_seed,
        balance_val_seed=cfg.data.balance_val_seed,
    )

    model_path = model_path or os.path.join(
        cfg.models_dir, "resnet18_patch_classifier"
    )
    if not os.path.exists(model_path):
        raise FileNotFoundError(f"model not found: {model_path}")
    variables = load_model(model_path)
    model = ResNet18Classifier(num_classes=cfg.model.num_classes)

    @jax.jit
    def logits_fn(imgs_u8):
        imgs = preprocess_batch(jax.random.key(0), imgs_u8, training=False)
        return model.apply(
            {
                "params": variables["params"],
                "batch_stats": variables.get("batch_stats", {}),
            },
            imgs,
            train=False,
        )

    preds_all, labels_all = [], []
    for imgs, labels, valid in BatchIterator(
        val_ds, batch_size or cfg.train.batch_size, shuffle=False
    ):
        logits = np.asarray(logits_fn(imgs))
        n = int(valid.sum())
        preds_all.append(np.argmax(logits[:n], axis=-1))
        labels_all.append(labels[:n])
    preds = np.concatenate(preds_all) if preds_all else np.zeros((0,), np.int64)
    labels = np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int64)

    report = classification_report(labels, preds, cfg.model.num_classes)
    log.info("Validation accuracy: %.4f", report["accuracy"])
    return report
