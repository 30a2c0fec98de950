#!/usr/bin/env python
"""End-to-end --extract_features benchmark (VERDICT round-1 next #4).

Fabricates a packed patch store of N synthetic 224² patches (the level-3
production format), then runs the REAL ``extract_features`` path — packed
store → native OpenMP gather → host→device transfer → bf16 ResNet18
forward → incremental feature spool → artifact triplet — and reports the
measured end-to-end patches/s plus artifact shape/golden checks mirroring
``/root/reference/src/main.py:805-894``.

Usage: python scripts/e2e_features_bench.py [--n 100000] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_store(patches_dir: str, n: int, level: int = 3,
                    patch: int = 224, n_slides: int = 10) -> None:
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        PatchManifest,
        manifest_path,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PackedPatchWriter,
    )

    rng = np.random.default_rng(0)
    manifest = PatchManifest()
    per_slide = -(-n // n_slides)
    made = 0
    for s in range(n_slides):
        name = f"synth_{s:03d}"
        writer = PackedPatchWriter(patches_dir, level, name, patch)
        count = min(per_slide, n - made)
        chunk = 256
        for start in range(0, count, chunk):
            m = min(chunk, count - start)
            # tissue-like patches (mean < 240) with cheap tiled noise
            base = rng.integers(120, 220, (m, 1, 1, 3), np.uint8)
            noise = rng.integers(0, 30, (m, patch, patch, 3), np.uint8)
            # reference-like composition (src/main.py:49-50: ~11:1
            # normal:tumor): tumor patches only on the first half of the
            # slides, so MIL gets both positive and negative bags
            labels = (
                (rng.random(m) < 0.18).astype(np.int32)
                if s < n_slides // 2 else np.zeros(m, np.int32)
            )
            # class-correlated appearance (the synthetic slides' pink
            # tissue vs darker-purple tumor) so downstream feature
            # evaluation (--validate logreg/PCA) has real signal to find
            tumor_base = np.array([150, 90, 160], np.int16).reshape(1, 1, 1, 3)
            base = np.where(
                labels.reshape(-1, 1, 1, 1) == 1,
                tumor_base + rng.integers(-15, 16, (m, 1, 1, 3), np.int16),
                base.astype(np.int16),
            )
            imgs = np.clip(base + noise, 0, 255).astype(np.uint8)
            coords = np.stack(
                [np.arange(start, start + m, dtype=np.int64) * patch,
                 np.full(m, s * patch, np.int64)], axis=1)
            manifest.extend(writer.write_batch(imgs, coords, labels))
        writer.close()
        made += count
    manifest.save(manifest_path(patches_dir, level))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--out", default="/tmp/hipac_e2e_features")
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--skip_fabricate", action="store_true")
    args = p.parse_args()

    import jax

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        get_config,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
        extract_features,
        load_feature_artifacts,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        save_model,
    )

    cfg = get_config()
    cfg.data.data_dir = args.out
    cfg.models_dir = os.path.join(args.out, "models")
    level = 3

    patches_dir = cfg.data.patches_dir
    if not args.skip_fabricate or not os.path.isdir(patches_dir):
        t0 = time.perf_counter()
        fabricate_store(patches_dir, args.n, level)
        print(f"[fabricate] {args.n} patches in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    # a real (randomly initialized) classifier checkpoint for the fc-strip path
    import jax.numpy as jnp
    model = ResNet18Classifier()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    save_model(os.path.join(cfg.models_dir, "resnet18_patch_classifier"),
               {"params": variables["params"],
                "batch_stats": variables["batch_stats"]})

    t0 = time.perf_counter()
    feats = extract_features(cfg, level=level, batch_size=args.batch_size)
    elapsed = time.perf_counter() - t0
    n = feats.shape[0]

    # artifact checks (reference main.py:885-894 triplet)
    f2, labels, names = load_feature_artifacts(cfg.data.features_dir, level)
    assert f2.shape == (args.n, 512), f2.shape
    assert labels.shape == (args.n,) and len(names) == args.n
    assert np.isfinite(f2).all()
    assert np.abs(f2).sum() > 0

    report = {
        "metric": "e2e_extract_features_patches_per_sec",
        "n_patches": n,
        "seconds": round(elapsed, 1),
        "value": round(n / elapsed, 1),
        "batch_size": args.batch_size,
        "note": "store->gather->H2D->forward->spool->artifacts, single chip",
    }
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
