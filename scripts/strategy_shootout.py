#!/usr/bin/env python
"""Three-strategy QUALITY shootout on a label-scarce split.

The reference's entire point for strategy training (C12,
``src/main.py:536-606``) and SimCLR pretraining (C13,
``src/models/simclr.py:68-123``) is that self-supervision on unlabeled
patches should help when labels are scarce. Rounds 1-4 proved the rebuilt
SimCLR path's THROUGHPUT (3.97k patches/s/chip) and loss/grad parity; this
script proves (or refutes) the QUALITY claim on a fixture that is not
saturated:

- Fixture: hard-texture slides (zero-mean checkerboard lesions readable at
  level 2, ``io/synthetic.py tumor_style='texture'``) — the same geometry
  as ``froc_hard_proof.py`` but train-split only.
- Label scarcity: patch LABELS are kept for 1 tumor + 1 normal slide;
  6 held-out slides form the patch-level eval set; the remaining slides
  are unlabeled (available to SimCLR pretraining only — eval slides are
  excluded from pretraining, no transduction).
- Arms:
    random_probe      frozen He-init trunk  → logistic probe on few labels
    simclr_probe      frozen SimCLR encoder → logistic probe on few labels
    weighted_loss     random init + weighted-CE fine-tune on few labels
    balanced          random init + balanced-sampler fine-tune
    self_supervised   SimCLR init + fine-tune (the reference C12 path)
- Metric: balanced accuracy (mean per-class recall) + AUC on the held-out
  slides' patches. Probes isolate representation quality; fine-tunes
  measure the end-to-end strategies.

Writes docs/proofs/strategy_report.json (resumable per phase). The CI gate
distilled from this proof lives in tests/test_strategies.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W0, H0 = 7168, 5376
NUM_LEVELS = 6
N_TUMOR, N_NORMAL = 8, 8
LEVEL = 2
LABELED = ("tumor_001", "normal_001")
EVAL = ("tumor_006", "tumor_007", "tumor_008",
        "normal_006", "normal_007", "normal_008")


def _tumor_poly(rng):
    cx = rng.uniform(0.38, 0.62)
    cy = rng.uniform(0.38, 0.62)
    r = rng.uniform(0.10, 0.17)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 7))
    return tuple(
        (cx + r * rng.uniform(0.75, 1.0) * np.cos(a),
         cy + r * rng.uniform(0.75, 1.0) * np.sin(a))
        for a in angles
    )


def fabricate(root: str) -> None:
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        write_synthetic_case,
    )

    rng = np.random.default_rng(7)  # same stream as froc_hard_proof
    t0 = time.time()

    def spec(seed, polys=()):
        return SyntheticSlideSpec(
            width=W0, height=H0, num_levels=NUM_LEVELS,
            tissue_radii=(0.45, 0.45), tumor_polygons=polys, seed=seed,
            tumor_style="texture",
        )

    def _exists(name):
        return os.path.exists(
            os.path.join(root, "train", "img", f"{name}.wsi.npz")
        )

    for i in range(N_TUMOR):
        poly = _tumor_poly(rng)
        if not _exists(f"tumor_{i + 1:03d}"):
            write_synthetic_case(root, f"tumor_{i + 1:03d}",
                                 spec(500 + i, (poly,)), split="train")
    for i in range(N_NORMAL):
        if not _exists(f"normal_{i + 1:03d}"):
            write_synthetic_case(root, f"normal_{i + 1:03d}",
                                 spec(600 + i), split="train")
    print(f"[fabricate] {time.time() - t0:.1f}s", flush=True)


def balanced_accuracy(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    recalls = [
        float((y_pred[y_true == c] == c).mean())
        for c in np.unique(y_true)
    ]
    return float(np.mean(recalls))


def probe_metrics(f_tr, y_tr, f_ev, y_ev) -> dict:
    """Logistic probe (the reference's feature sanity eval classifier,
    ``src/main.py:1036-1070``) trained on the few-label features."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score

    clf = LogisticRegression(max_iter=1000, class_weight="balanced")
    clf.fit(f_tr, y_tr)
    pred = clf.predict(f_ev)
    scores = clf.decision_function(f_ev)
    return {
        "balanced_acc": round(balanced_accuracy(y_ev, pred), 4),
        "auc": round(float(roc_auc_score(y_ev, scores)), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hipac_strategy")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--simclr_epochs", type=int, default=60)
    ap.add_argument("--finetune_epochs", type=int, default=15)
    ap.add_argument("--batch_size", type=int, default=64)
    a = ap.parse_args()

    os.makedirs(a.root, exist_ok=True)
    models = os.path.join(a.root, "models")
    fabricate(a.root)

    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        BatchIterator,
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        load_or_scan_manifest,
    )

    out_path = a.out or os.path.join(
        REPO, "docs", "proofs", "strategy_report.json"
    )
    report: dict = {}
    if a.resume and os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)
        print(f"[resume] recovered: {sorted(report)}", flush=True)

    def checkpoint():
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report), flush=True)

    cfg = Config(models_dir=models)
    cfg = cfg.replace(data=DataConfig(data_dir=a.root))
    cfg.data.patch_store_format = "packed"
    cfg.train.batch_size = a.batch_size
    cfg.simclr.batch_size = a.batch_size
    cfg.simclr.epochs = a.simclr_epochs

    manifest_path = os.path.join(
        cfg.data.patches_dir, f"level_{LEVEL}", "manifest.parquet"
    )
    if not os.path.exists(manifest_path):
        t0 = time.time()
        extract_patches(cfg.data, level=LEVEL, stride=224,
                        store_format="packed")
        report["seconds_patch"] = round(time.time() - t0, 1)
    manifest = load_or_scan_manifest(cfg.data.patches_dir, LEVEL)

    labeled_m = manifest.for_slides(LABELED)
    eval_m = manifest.for_slides(EVAL)
    unlabeled_slides = [s for s in manifest.slides() if s not in EVAL]
    unlabeled_m = manifest.for_slides(unlabeled_slides)
    report["split"] = {
        "level": LEVEL,
        "labeled_slides": list(LABELED),
        "labeled_patches": len(labeled_m),
        "labeled_tumor_patches": int(labeled_m.labels().sum()),
        "eval_slides": list(EVAL),
        "eval_patches": len(eval_m),
        "eval_tumor_patches": int(eval_m.labels().sum()),
        "pretrain_slides": unlabeled_slides,
        "pretrain_patches": len(unlabeled_m),
        "note": "eval slides are excluded from SimCLR pretraining "
                "(no transduction); labels outside labeled_slides are "
                "never used for training",
    }

    labeled_ds = PatchDataset(labeled_m)
    eval_ds = PatchDataset(eval_m)

    # ------------------------------------------------------------------
    # Phase A: SimCLR pretraining on the unlabeled pool
    # ------------------------------------------------------------------
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        load_model,
        model_artifact_path,
    )

    encoder_path = model_artifact_path(models, "simclr_encoder")
    if "simclr_pretrain" not in report or not os.path.exists(encoder_path):
        from ss25_hierarchical_multiscale_image_classification_tpu.train.simclr_trainer import (
            pretrain_simclr,
        )

        t0 = time.time()
        pretrain_simclr(cfg, level=LEVEL, dataset=PatchDataset(unlabeled_m))
        report["simclr_pretrain"] = {
            "epochs": a.simclr_epochs,
            "seconds": round(time.time() - t0, 1),
        }
        checkpoint()
    encoder_vars = load_model(encoder_path)
    simclr_trunk = {
        "params": encoder_vars["params"].get("encoder", {}),
        "batch_stats": encoder_vars.get("batch_stats", {}).get("encoder", {}),
    }

    # ------------------------------------------------------------------
    # Phase B: linear probes (frozen features, few-label logreg)
    # ------------------------------------------------------------------
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
        run_feature_extraction,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18FeatureExtractor,
    )

    def trunk_features(trunk, ds):
        feats, labels, _ = run_feature_extraction(
            ds, trunk, batch_size=a.batch_size, dtype=jnp.float32
        )
        return feats, labels

    if "random_probe" not in report or "simclr_probe" not in report:
        fx = ResNet18FeatureExtractor(dtype=jnp.float32)
        rv = fx.init(jax.random.key(0),
                     jnp.zeros((1, 224, 224, 3)), train=False)
        random_trunk = {
            "params": rv["params"], "batch_stats": rv["batch_stats"]
        }
        for name, trunk in (("random_probe", random_trunk),
                            ("simclr_probe", simclr_trunk)):
            t0 = time.time()
            f_tr, y_tr = trunk_features(trunk, labeled_ds)
            f_ev, y_ev = trunk_features(trunk, eval_ds)
            report[name] = {
                **probe_metrics(f_tr, y_tr, f_ev, y_ev),
                "seconds": round(time.time() - t0, 1),
            }
            print(f"[{name}] → {report[name]}", flush=True)
        checkpoint()

    # ------------------------------------------------------------------
    # Phase C: fine-tune arms on the few-label set
    # ------------------------------------------------------------------
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        BalancedSampler,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
        class_weights_total_over_count,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
        Trainer,
        eval_step,
    )

    def eval_balanced(trainer) -> dict:
        params = jax.device_get(trainer.state.params)
        bstats = jax.device_get(trainer.state.batch_stats)
        y_true, y_pred, y_margin = [], [], []
        for imgs, labels, valid in BatchIterator(
            eval_ds, a.batch_size, shuffle=False
        ):
            from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
                preprocess_batch,
            )

            logits = trainer.model.apply(
                {"params": params, "batch_stats": bstats},
                preprocess_batch(jax.random.key(0), jnp.asarray(imgs),
                                 training=False),
                train=False,
            )
            logits = np.asarray(logits, np.float32)
            n = int(valid.sum())
            y_true.extend(labels[:n].tolist())
            y_pred.extend(np.argmax(logits[:n], -1).tolist())
            y_margin.extend((logits[:n, 1] - logits[:n, 0]).tolist())
        from sklearn.metrics import roc_auc_score

        return {
            "balanced_acc": round(balanced_accuracy(y_true, y_pred), 4),
            "auc": round(float(roc_auc_score(y_true, y_margin)), 4),
        }

    def finetune(name: str, weights=None, sampler=None, pretrained=None):
        if name in report:
            return
        t0 = time.time()
        trainer = Trainer(
            ResNet18Classifier(),
            labeled_ds,
            None,  # no val loop: eval below is the measurement
            batch_size=min(a.batch_size, len(labeled_ds)),
            learning_rate=cfg.train.learning_rate,
            class_weights=weights,
            sampler=sampler,
            seed=cfg.train.seed,
            pretrained_variables=pretrained,
        )
        trainer.fit(a.finetune_epochs)
        report[name] = {
            **eval_balanced(trainer),
            "seconds": round(time.time() - t0, 1),
        }
        print(f"[{name}] → {report[name]}", flush=True)
        checkpoint()

    labels = labeled_ds.labels
    finetune(
        "weighted_loss",
        weights=class_weights_total_over_count(labels, 2),
    )
    finetune(
        "balanced",
        sampler=BalancedSampler(labels, seed=cfg.train.seed),
    )
    # The reference computes total/count weights BEFORE the strategy branch
    # and its self_supervised criterion uses them
    # (src/main.py:549-552, 558-560) — without them the 5:1-imbalanced
    # few-label set collapses the fine-tune to the majority class.
    finetune(
        "self_supervised",
        weights=class_weights_total_over_count(labels, 2),
        pretrained=simclr_trunk,
    )

    report["gate_simclr_probe_beats_random"] = bool(
        report["simclr_probe"]["balanced_acc"]
        > report["random_probe"]["balanced_acc"]
    )
    report["backend"] = jax.default_backend()
    checkpoint()


if __name__ == "__main__":
    main()
