"""Batched feature extraction over a patch level.

Rebuild of ``extract_features`` / ``extract_features_with_simclr``
(``src/main.py:805-932``): runs the fc-stripped ResNet18 over every patch of
a level and writes the reference's artifact triplet —

    features/patch_features_{L}.npy   (N, 512) float32
    features/patch_labels_{L}.npy     (N,) int
    features/patch_paths_{L}.txt      N patch names

so the downstream feature-eval and MIL stages (and any tooling written
against the reference) interoperate.

This is the throughput-benchmark path (BASELINE.json: ≥20k 224² patches/s/
chip): one jitted normalize+forward step, static batch shape, async dispatch
so host batch gathering overlaps device compute.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    BatchIterator,
    PatchDataset,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18FeatureExtractor,
    strip_head,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    load_model,
)

log = get_logger("infer.features")


def make_feature_step(model):
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )

    @jax.jit
    def feature_step(params, batch_stats, imgs_u8):
        imgs = preprocess_batch(jax.random.key(0), imgs_u8, training=False)
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=False
        )

    return feature_step


def _calibration_batches(dataset: PatchDataset, batch_size: int,
                         n_batches: int = 2) -> list[np.ndarray]:
    """First few dataset batches, for int8 activation-scale calibration."""
    out = []
    for imgs, _labels, _valid in BatchIterator(
        dataset, min(batch_size, 256), shuffle=False
    ):
        out.append(np.asarray(imgs))
        if len(out) >= n_batches:
            break
    return out


def run_feature_extraction(
    dataset: PatchDataset,
    variables: dict,
    batch_size: int = 512,
    mesh=None,
    dtype=jnp.bfloat16,
    out: np.ndarray | None = None,
    feature_dim: int = 512,
    int8: bool = False,
    qtree: dict | None = None,
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Forward every patch through the extractor; returns
    (features (N, 512), labels (N,), patch names).

    Pipelined end to end: host batch gathering runs on the prefetcher
    thread, device steps dispatch asynchronously, and each step's features
    are fetched with a ONE-BATCH LAG so the device→host transfer of batch
    k-1 overlaps batch k's compute instead of serializing the stream.
    With ``out`` (e.g. a ``.npy`` memmap) features spool incrementally —
    no end-of-run concatenation or double buffering of the full (N, 512)
    matrix in RAM.

    ``int8=True`` post-training-quantizes the trunk (w8a8, calibrated on
    the first dataset batches — ``models/quantized.py``) and runs the int8
    MXU path; features stay float32.
    """
    mesh = mesh or make_mesh()
    if int8:
        from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
            quant_forward,
            quantize_resnet18,
        )

        if qtree is None:
            # no persisted artifact: calibrate on the first dataset batches
            qtree = quantize_resnet18(
                variables, _calibration_batches(dataset, batch_size)
            ).tree()
        qtree = replicate(mesh, qtree)
        qstep = jax.jit(lambda qp, imgs: quant_forward(qp, imgs, with_fc=False))

        def step_fn(imgs):
            return qstep(qtree, imgs)

        if int(qtree["qkernels"]["stem"].shape[0]) == 4:
            # s2d stem: have the host gather emit the space-to-depth batch
            # layout directly (same bytes moved), skipping the on-device
            # transpose — measured 44.5k → 46.6k patches/s/chip.
            import dataclasses as _dc

            dataset = _dc.replace(dataset, s2d=True)

    else:
        # inference-folded bf16 path: BN + ImageNet-normalize folded into
        # the convs (models/quantized.py), so the jitted step consumes the
        # raw uint8 batch with no separate normalize pass. Math-equivalent
        # to the flax eval forward (parity tests in tests/test_quantized.py).
        from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
            fold_resnet18_inference,
            folded_forward_inference,
        )

        hw = int(getattr(dataset, "resize_to", 224) or 224)
        fp = replicate(
            mesh,
            fold_resnet18_inference(
                {
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                },
                input_hw=(hw, hw),
                dtype=dtype,
            ),
        )
        fstep = jax.jit(
            lambda fp, imgs: folded_forward_inference(fp, imgs, with_fc=False)
        )

        def step_fn(imgs):
            return fstep(fp, imgs)

    from ss25_hierarchical_multiscale_image_classification_tpu.data.prefetch import (
        Prefetcher,
    )

    batches = Prefetcher(BatchIterator(dataset, batch_size, shuffle=False))
    n_total = len(dataset)
    if out is None:
        out = np.empty((n_total, feature_dim), np.float32)

    def spool(pending):
        feats_dev, n_valid, pos = pending
        out[pos : pos + n_valid] = np.asarray(
            feats_dev[:n_valid], dtype=np.float32
        )

    pos = 0
    pending = None
    with Timer(f"feature_extraction[{n_total} patches]", log):
        for imgs, _labels, valid in batches:
            imgs = shard_batch(mesh, imgs)
            feats = step_fn(imgs)
            if pending is not None:
                spool(pending)
            n_valid = int(valid.sum())
            pending = (feats, n_valid, pos)
            pos += n_valid
        if pending is not None:
            spool(pending)

    labels = dataset.labels
    names = [rec.patch_name for rec in dataset.manifest]
    return out[:pos], labels, names


def _features_memmap(features_dir: str, level: int, n: int,
                     feature_dim: int = 512) -> np.ndarray:
    """Preallocate ``patch_features_{L}.npy`` as a writable memmap so the
    extraction loop spools features straight into the artifact."""
    os.makedirs(features_dir, exist_ok=True)
    path = os.path.join(features_dir, f"patch_features_{level}.npy")
    return np.lib.format.open_memmap(
        path, mode="w+", dtype=np.float32, shape=(n, feature_dim)
    )


def _save_artifacts(
    features_dir: str, level: int, feats: np.ndarray, labels: np.ndarray,
    names: list[str],
) -> None:
    os.makedirs(features_dir, exist_ok=True)
    if isinstance(feats, np.memmap):
        feats.flush()  # spooled incrementally during extraction
    else:
        np.save(
            os.path.join(features_dir, f"patch_features_{level}.npy"), feats
        )
    np.save(os.path.join(features_dir, f"patch_labels_{level}.npy"), labels)
    with open(os.path.join(features_dir, f"patch_paths_{level}.txt"), "w") as f:
        f.write("\n".join(names))
    log.info(
        "Saved features %s (shape %s) to %s", level, feats.shape, features_dir
    )


def extract_features(
    cfg: Config, level: int = 3, model_path: str | None = None,
    batch_size: int | None = None, int8: bool = False,
) -> np.ndarray:
    """Classifier-trunk feature extraction (``src/main.py:805-894``):
    loads the trained classifier, strips the fc head into the extractor."""
    manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
    if len(manifest) == 0:
        raise FileNotFoundError(f"no patches at level {level}")
    dataset = PatchDataset(manifest)

    model_path = model_path or os.path.join(
        cfg.models_dir, "resnet18_patch_classifier"
    )
    variables = load_model(model_path)
    trunk = strip_head(
        {
            "params": dict(variables["params"]),
            "batch_stats": dict(variables.get("batch_stats", {})),
        }
    )
    qtree = None
    if int8:
        from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
            CLASSIFIER_ARTIFACT,
            maybe_load_artifact,
        )

        qtree = maybe_load_artifact(cfg.models_dir, CLASSIFIER_ARTIFACT)
    out = _features_memmap(cfg.data.features_dir, level, len(dataset))
    feats, labels, names = run_feature_extraction(
        dataset, trunk, batch_size or cfg.train.batch_size, out=out,
        int8=int8, qtree=qtree,
    )
    _save_artifacts(cfg.data.features_dir, level, feats, labels, names)
    return feats


def extract_features_with_simclr(
    cfg: Config, level: int = 3, encoder_path: str | None = None,
    batch_size: int | None = None, int8: bool = False,
) -> np.ndarray:
    """SimCLR-encoder feature extraction (``src/main.py:897-932``)."""
    manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
    if len(manifest) == 0:
        raise FileNotFoundError(f"no patches at level {level}")
    dataset = PatchDataset(manifest)

    encoder_path = encoder_path or os.path.join(cfg.models_dir, "simclr_encoder")
    variables = load_model(encoder_path)
    trunk = {
        "params": variables["params"].get("encoder", variables["params"]),
        "batch_stats": variables.get("batch_stats", {}).get(
            "encoder", variables.get("batch_stats", {})
        ),
    }
    out = _features_memmap(cfg.data.features_dir, level, len(dataset))
    feats, labels, names = run_feature_extraction(
        dataset, trunk, batch_size or cfg.train.batch_size, out=out, int8=int8
    )
    _save_artifacts(cfg.data.features_dir, level, feats, labels, names)
    return feats


def load_feature_artifacts(
    features_dir: str, level: int
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    feats = np.load(os.path.join(features_dir, f"patch_features_{level}.npy"))
    labels = np.load(os.path.join(features_dir, f"patch_labels_{level}.npy"))
    with open(os.path.join(features_dir, f"patch_paths_{level}.txt")) as f:
        names = [line.strip() for line in f if line.strip()]
    return feats, labels, names
