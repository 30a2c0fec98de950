"""Hierarchical multiscale classifier training.

Trains ``models.hierarchical.HierarchicalPatchClassifier`` on co-located
cross-level patches — the fusion capability beyond the reference's per-level
training (SURVEY.md §5: the reference's "long-context" analogue is the
level pyramid, which it never fuses).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
    normalize,
    preprocess_multiscale_batch,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.multiscale import (
    MultiscaleDataset,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
    HierarchicalPatchClassifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    load_model,
    model_artifact_path,
    save_model,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
    class_weights_inv_min,
    weighted_cross_entropy,
)

log = get_logger("train.multiscale")


def deep_supervision_loss(aux, labels, weights, valid, *,
                          xent=weighted_cross_entropy):
    """Per-scale auxiliary CE over (B, S, C) logits.

    The flatten is sample-major (row r ↔ sample r // S, scale r % S), so
    labels/valid must be ``repeat``ed S times — ``tile`` would pair row r
    with sample r % B, i.e. almost every row with the wrong label
    (regression-pinned in tests/test_multiscale.py).
    """
    s = aux.shape[1]
    aux_flat = aux.reshape(-1, aux.shape[-1])
    return xent(aux_flat, jnp.repeat(labels, s), weights,
                jnp.repeat(valid, s))


def warm_start_from_classifier(
    params: dict, batch_stats: dict, clf_variables: dict
) -> tuple[dict, dict]:
    """Seed the fusion model from a trained single-level classifier.

    The shared trunk takes the classifier's trunk (the fc-strip merge
    semantics of the reference, ``src/models/resnet.py:27-31``); the
    per-scale aux head takes the classifier's ``fc`` so the per-level
    ensemble starts at the single-level model's quality. Fusion head and
    scale embeddings stay at their fresh init."""
    params = dict(params)
    batch_stats = dict(batch_stats)
    params["trunk"] = {
        k: clf_variables["params"][k] for k in params["trunk"]
    }
    batch_stats["trunk"] = {
        k: clf_variables["batch_stats"][k] for k in batch_stats["trunk"]
    }
    fc = clf_variables["params"].get("fc")
    if (
        fc is not None
        and "aux_head" in params
        and fc["kernel"].shape == params["aux_head"]["kernel"].shape
    ):
        params["aux_head"] = {k: np.asarray(v) for k, v in fc.items()}
    return params, batch_stats


def train_multiscale_classifier(
    cfg: Config,
    levels=(2, 3),
    epochs: int | None = None,
    dataset: MultiscaleDataset | None = None,
    fusion: str = "concat",
    batch_size: int | None = None,
    aux_weight: float = 0.5,
    init_from: str | None = "auto",
    input_mode: str = "resize",
) -> dict:
    """Train the fusion classifier; writes the ``hierarchical_classifier``
    artifact and returns {"variables", "history", "calibration"}.

    Beyond the fusion head, per-scale auxiliary heads are deeply supervised
    (``aux_weight`` × mean per-scale CE). Training augmentation matches the
    single-level trainer's (flips + k·90° + jitter, reference
    ``src/main.py:417-425``) applied scale-consistently per cell. After
    training, a slide-level val split calibrates detection-grade scores:
    per-head temperature by NLL and a fusion-vs-per-scale-ensemble weight
    by ROC-AUC (``evaluation/calibration.py``); both ship inside the
    artifact so the FROC producer ranks calibrated log-odds.

    ``init_from`` warm-starts the shared trunk (and the per-scale aux head,
    from the stripped ``fc``) from a trained single-level classifier
    artifact — the reference's encoder-reuse semantics
    (``src/models/resnet.py:27-31``, ``src/main.py:851-859``) applied to
    fusion training. ``"auto"`` uses ``resnet18_patch_classifier`` when it
    exists; a path uses that artifact; ``None`` trains from scratch.
    """
    if dataset is None:
        dataset = MultiscaleDataset.from_patches_dir(
            cfg.data.patches_dir, levels=levels, input_mode=input_mode
        )
    if len(dataset) == 0:
        raise FileNotFoundError(
            f"no aligned multiscale cells at levels {levels}; extract "
            "patches at every requested level first"
        )
    levels = tuple(dataset.levels)
    batch_size = batch_size or cfg.train.batch_size
    mesh = make_mesh()
    train_idx, val_idx = dataset.split_by_slide(
        cfg.data.val_fraction, cfg.data.split_seed
    )
    log.info("multiscale split: %d train / %d val cells",
             len(train_idx), len(val_idx))

    model = HierarchicalPatchClassifier(
        levels=levels, num_classes=cfg.model.num_classes, fusion=fusion
    )
    s = dataset.resize_to
    init_batch = {
        lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in levels
    }
    # with_aux=True so the per-scale aux head's params are created at init
    # (linen materializes Dense params on first call)
    variables = model.init(jax.random.key(cfg.train.seed), init_batch,
                           train=False, with_aux=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if init_from == "auto":
        candidate = model_artifact_path(
            cfg.models_dir, "resnet18_patch_classifier"
        )
        init_from = candidate if os.path.exists(candidate) else None
    if init_from:
        params, batch_stats = warm_start_from_classifier(
            params, batch_stats, load_model(init_from)
        )
        log.info("warm-started trunk + aux head from %s", init_from)

    tx = optax.adam(cfg.train.learning_rate)
    opt_state = tx.init(params)
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    weights = jnp.asarray(
        class_weights_inv_min(
            dataset.labels[train_idx], cfg.model.num_classes
        )
    )

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng, batch_u8, labels,
                   valid):
        batch = preprocess_multiscale_batch(rng, batch_u8, training=True)

        def loss_fn(p):
            (logits, aux), upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, with_aux=True, mutable=["batch_stats"],
            )
            loss = weighted_cross_entropy(logits, labels, weights, valid)
            # deep supervision: each scale's head must classify alone
            loss = loss + aux_weight * deep_supervision_loss(
                aux, labels, weights, valid
            )
            return loss, (logits, upd)

        (loss, (logits, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * valid)
        return (params, upd["batch_stats"], opt_state, loss, correct,
                jnp.sum(valid))

    @jax.jit
    def eval_step(params, batch_stats, batch_u8):
        batch = {lvl: normalize(x) for lvl, x in batch_u8.items()}
        logits, aux = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False, with_aux=True,
        )
        return logits, aux

    epochs = epochs or cfg.train.strategy_epochs
    history = []
    aug_key = jax.random.key(cfg.train.seed + 7919)
    for epoch in range(epochs):
        t0 = time.perf_counter()
        step_out = []  # device scalars; fetched once per epoch
        for imgs, labels, valid in dataset.batches(
            batch_size, shuffle=True, seed=cfg.train.seed + epoch,
            indices=train_idx,
        ):
            aug_key, step_key = jax.random.split(aug_key)
            batch = shard_batch(mesh, imgs)
            labels_d, valid_d = shard_batch(mesh, (labels, valid))
            params, batch_stats, opt_state, loss, c, n = train_step(
                params, batch_stats, opt_state, step_key, batch, labels_d,
                valid_d
            )
            step_out.append((loss, c, n))
        fetched = jax.device_get(step_out)
        total = float(sum(v[0] for v in fetched))
        correct = float(sum(v[1] for v in fetched))
        count = float(sum(v[2] for v in fetched))
        acc = correct / max(count, 1.0)
        history.append({"epoch": epoch, "loss": total, "acc": acc})
        log.info(
            "multiscale epoch %d/%d: loss %.4f acc %.4f (%.1fs)",
            epoch + 1, epochs, total, acc, time.perf_counter() - t0,
        )

    # ---- post-hoc calibration on the held-out slides -----------------
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        fit_temperature,
        pick_combine_mode,
    )

    val_logits, val_aux, val_labels = [], [], []
    for imgs, labels, valid in dataset.batches(
        batch_size, shuffle=False, indices=val_idx
    ):
        batch = shard_batch(mesh, imgs)
        logits, aux = eval_step(params, batch_stats, batch)
        keep = valid > 0
        val_logits.append(np.asarray(logits)[keep])
        val_aux.append(np.asarray(aux)[keep])
        val_labels.append(labels[keep])
    input_mode = getattr(dataset, "input_mode", input_mode)
    calibration = {"temperature": 1.0, "aux_temperature": 1.0,
                   "ensemble_weight": 1.0, "ensemble_base_weight": 0.5,
                   "combine": "fusion",
                   # serving must rebuild the same fine-stream semantics
                   # (0=resize, 1=crop — Orbax trees don't carry strings)
                   "input_mode": 1 if input_mode == "crop" else 0}
    if val_logits:
        logits = np.concatenate(val_logits)
        aux = np.concatenate(val_aux)
        labels_np = np.concatenate(val_labels)
        # shuffle=False iterates val_idx in order and `keep` masks the
        # wrap-pad, so kept rows align 1:1 with val_idx
        slides_np = np.array(
            [dataset.samples[int(i)].slide for i in val_idx]
        )[: len(labels_np)]
        cells_np = np.array(
            [dataset.samples[int(i)].cell for i in val_idx], np.float64
        )[: len(labels_np)]
        s = aux.shape[1]
        t_fusion = fit_temperature(logits, labels_np)
        t_aux = fit_temperature(
            # sample-major flatten (B, S, C) → repeat, not tile
            aux.reshape(-1, aux.shape[-1]), np.repeat(labels_np, s)
        )

        # mix in calibrated LOG-ODDS space — the exact space the producer
        # ranks detections in (``infer/multiscale._combine_scores``);
        # probability-space mixing saturates confident cells to exact-1.0
        # float ties, which collapses the FROC consumer's ranking.
        # The shipped default surface is selected by a detection-grade
        # criterion (sensitivity at fixed FP-per-slide rates), NOT pooled
        # AUC — see ``evaluation.calibration.patch_froc_proxy``.
        m_fusion = (logits[:, 1] - logits[:, 0]) / t_fusion
        m_per_level = (aux[:, :, 1] - aux[:, :, 0]) / t_aux
        m_aux = m_per_level.mean(axis=1)
        # base (detection-grid) level = last: sorted level order, max
        # level number = most downsampled, matching the model's aux
        # stacking and infer/multiscale._combine_scores
        m_aux_base = m_per_level[:, -1]
        mode, weights, proxies = pick_combine_mode(
            m_fusion, m_aux, labels_np, slides_np, m_aux_base=m_aux_base
        )
        calibration = {
            "temperature": float(t_fusion),
            "aux_temperature": float(t_aux),
            "ensemble_weight": float(weights["ensemble_weight"]),
            "ensemble_base_weight": float(
                weights["ensemble_base_weight"]
            ),
            "combine": mode,
            "input_mode": 1 if input_mode == "crop" else 0,
        }
        # cascade operating point (evaluation.calibration.fit_cascade_margin):
        # the screen floor that kept every val tumor cell, or None when the
        # base-level screen is uninformative on val — then NO margin ships
        # and ``--cascade`` auto falls back to the full fused pass
        # (infer/multiscale.predict_slide_multiscale).
        from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
            fit_cascade_margin,
        )

        margin = fit_cascade_margin(
            m_aux_base, labels_np, slides=slides_np, cells=cells_np
        )
        if margin is not None:
            calibration["cascade_margin"] = margin
            # observability: the val screening rate the floor achieved
            # (fit_cascade_margin refuses to ship floors below its
            # min_screen_rate, so this is always meaningfully > 0)
            calibration["cascade_val_screen_rate"] = float(
                (m_aux_base[labels_np == 0] < margin).mean()
            )
        log.info("calibration: %s (proxies %s)", calibration, proxies)

    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.calibration import (
        encode_combine,
    )

    out = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
        # Orbax trees can't carry strings — the mode ships as its score
        # column index (decode_combine restores it at load)
        "calibration": {
            **calibration, "combine": encode_combine(calibration["combine"])
        },
    }
    save_model(
        model_artifact_path(cfg.models_dir, "hierarchical_classifier"), out
    )
    return {"variables": out, "history": history, "levels": levels,
            "calibration": calibration}
