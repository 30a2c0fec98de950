"""Slides → trained model in one command: extraction streams into training.

``--patch --train`` previously materialized the full patch store before the
first training step. Here the two stages PIPELINE: a producer thread runs
the bounded-memory band extraction (``data/extract.py``) and hands each
finished slide's patch records to the trainer, which runs its FIRST epoch
on slides as they land (only one slide's patches are resident at a time —
RSS stays band-bounded). Once extraction completes, the remaining epochs
run the standard store-based weighted-loss trainer over the full manifest,
warm-started from the streamed epoch's state — so from epoch 1 the
semantics (slide-level split seed 42, class weights, balanced val) are
EXACTLY the store-based path's.

Divergences from the store-based run, by design and documented:
- epoch 0 visits patches in extraction order (no global shuffle exists
  before the data does) and uses unweighted CE (class counts are unknown
  until extraction finishes);
- the val-split slides are known up front from the slide LIST, so epoch 0
  never trains on a future validation slide.

The reference has no analogue (its stages are strictly sequential CLI
invocations, ``src/main.py:1116-1143``).
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    PatchDataset,
    slide_level_split,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
    extract_patches,
    list_slides,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    Timer,
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
)

log = get_logger("train.streaming")


def _stream_batches(rec_queue, batch_size: int, resize_to: int):
    """Yield (imgs, labels, valid) static-shape batches from per-slide
    record lists as they arrive; the tail wrap-pads with a validity mask.

    Only the current slide's reader is open and only up to one batch of
    images is buffered — memory stays O(batch + one slide's records).
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PatchReader,
    )

    buf_imgs: list[np.ndarray] = []
    buf_labels: list[int] = []

    def drain(final: bool = False):
        while len(buf_imgs) >= batch_size:
            imgs = np.stack(buf_imgs[:batch_size])
            labels = np.asarray(buf_labels[:batch_size], np.int32)
            del buf_imgs[:batch_size], buf_labels[:batch_size]
            yield imgs, labels, np.ones((batch_size,), np.float32)
        if final and buf_imgs:
            n = len(buf_imgs)
            valid = np.zeros((batch_size,), np.float32)
            valid[:n] = 1.0
            while len(buf_imgs) < batch_size:  # wrap-pad (BatchIterator's rule)
                buf_imgs.append(buf_imgs[len(buf_imgs) % n])
                buf_labels.append(buf_labels[len(buf_labels) % n])
            yield (np.stack(buf_imgs), np.asarray(buf_labels, np.int32),
                   valid)
            buf_imgs.clear()
            buf_labels.clear()

    while True:
        item = rec_queue.get()
        if item is None:
            break
        if isinstance(item, BaseException):
            raise item
        recs = item
        if not recs:
            continue
        m = PatchManifest()
        for r in recs:
            m.append(r)
        reader = PatchReader(m)
        imgs = reader.read_batch(list(range(len(m))), resize_to=resize_to)
        labels = m.labels()
        for img, lab in zip(imgs, labels):
            buf_imgs.append(img)
            buf_labels.append(int(lab))
        yield from drain()
    yield from drain(final=True)


def train_resnet_classifier_streaming(
    cfg: Config,
    level: int = 3,
    epochs: int | None = None,
    stride: int | None = None,
    batch_size: int | None = None,
    store_format: str | None = None,
    extract_impl: str = "host",
    stain_norm: bool = False,
) -> dict:
    """The combined ``--patch --train`` pipeline (see module docstring).

    Returns the standard trainer result dict plus ``streamed_epoch``
    metrics.
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
        Trainer,
        make_train_step,
        train_resnet_classifier,
    )

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        INPUT_SIZE,
    )

    epochs = epochs or cfg.train.epochs
    batch_size = batch_size or cfg.train.batch_size
    resize_to = INPUT_SIZE

    # the val split depends only on slide NAMES, which exist before any
    # pixel is decoded — epoch 0 must not train on validation slides
    slide_names = [n for n, _p in list_slides(cfg.data.train_img_dir)]
    train_slides, val_slides = slide_level_split(
        slide_names, cfg.data.val_fraction, cfg.data.split_seed
    )
    val_set = set(val_slides)
    log.info(
        "streaming train: %d slides (%d train / %d val held out of the "
        "streamed epoch)", len(slide_names), len(train_slides), len(val_set),
    )

    rec_q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        try:
            extract_patches(
                cfg.data, level=level, stride=stride,
                store_format=store_format or cfg.data.patch_store_format,
                impl=extract_impl, stain_norm=stain_norm,
                on_slide=lambda name, recs: rec_q.put(
                    [] if name in val_set else recs
                ),
            )
            rec_q.put(None)
        except BaseException as e:
            rec_q.put(e)

    mesh = make_mesh()
    # must match the store-based epochs' model exactly — epoch 1 warm-starts
    # from these variables (a bare ResNet18Classifier() would silently drop
    # cfg.model.num_classes and train mutable BN despite --freeze_bn)
    model = ResNet18Classifier(num_classes=cfg.model.num_classes,
                               frozen_bn=cfg.train.freeze_bn)
    # epoch 0: unweighted CE over the extraction stream
    import optax

    from ss25_hierarchical_multiscale_image_classification_tpu.train.state import (
        create_train_state,
    )

    state = create_train_state(
        model, jax.random.key(cfg.train.seed),
        (1, resize_to, resize_to, 3), optax.adam(cfg.train.learning_rate),
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        replicate,
    )

    state = replicate(mesh, state)
    step = make_train_step(None, frozen_bn=cfg.train.freeze_bn)
    rng = jax.random.key(cfg.train.seed + 1)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    n_seen = 0
    metrics_dev = []
    with Timer("streamed epoch 0 (extraction-overlapped)", log):
        for imgs, labels, valid in _stream_batches(
            rec_q, batch_size, resize_to
        ):
            rng, sub = jax.random.split(rng)
            imgs_d, labels_d, valid_d = shard_batch(
                mesh, (imgs, labels, valid)
            )
            state, m = step(state, sub, imgs_d, labels_d, valid_d)
            metrics_dev.append(m)
            n_seen += int(valid.sum())
    thread.join()
    fetched = jax.device_get(metrics_dev)
    ep0 = {
        "epoch": 0,
        "loss": float(sum(m["loss"] for m in fetched)),
        "acc": float(sum(m["correct"] for m in fetched))
        / max(float(sum(m["count"] for m in fetched)), 1.0),
        "patches": n_seen,
    }
    log.info("streamed epoch 0: loss %.4f acc %.4f over %d patches",
             ep0["loss"], ep0["acc"], ep0["patches"])

    # epochs 1+: the exact store-based weighted-loss path, warm-started
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    result: dict = {"streamed_epoch": ep0, "variables": variables}
    if epochs > 1:
        trainer = train_resnet_classifier(
            cfg, level=level, epochs=epochs - 1,
            pretrained_variables=variables,
        )
        result["history"] = trainer.history
        result["variables"] = trainer.variables()
    else:
        from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
            model_artifact_path,
            save_model,
        )

        save_model(
            model_artifact_path(cfg.models_dir, "resnet18_patch_classifier"),
            variables,
        )
        result["history"] = []
    return result
