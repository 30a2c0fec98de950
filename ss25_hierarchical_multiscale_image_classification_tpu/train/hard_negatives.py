"""Hard-negative mining.

The classic CAMELYON16 recipe for FROC gains (absent from the reference,
which trains once on the static patch set): run the trained classifier over
normal training slides with the sliding-window producer, harvest the
highest-probability FALSE-POSITIVE patches, append them to the patch store
as extra normal examples, and retrain. The mined patches flow through the
standard manifest/packed-store machinery, so every downstream stage (
dataloaders, balancing, feature extraction) sees them transparently.
"""

from __future__ import annotations

import os

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
    annotation_path_for,
    list_slides,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    PatchManifest,
    manifest_path,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
    PackedPatchWriter,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (
    LABEL_NORMAL,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
    predict_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("train.hard_negatives")


def mine_hard_negatives(
    cfg: Config,
    variables: dict,
    level: int = 3,
    prob_threshold: float = 0.5,
    max_per_slide: int = 256,
    model=None,
    batch_size: int = 512,
    input_size: int = 224,
) -> PatchManifest:
    """Harvest false-positive patches from **annotation-free** training
    slides (every detection on a normal slide is a false positive).

    Mined patches are appended to ``patches/level_{L}`` as packed stores
    under the slide name ``{slide}__hardneg`` with normal labels, and the
    level manifest is updated. Returns the manifest of mined records.
    """
    mpath = manifest_path(cfg.data.patches_dir, level)
    manifest = (
        PatchManifest.load(mpath) if os.path.exists(mpath) else PatchManifest()
    )
    already = {s for s in manifest.slides() if s.endswith("__hardneg")}

    mined = PatchManifest()
    for name, path in list_slides(cfg.data.train_img_dir):
        if os.path.exists(annotation_path_for(cfg.data, name)):
            continue  # only annotation-free (normal) slides yield sure FPs
        store_name = f"{name}__hardneg"
        if store_name in already:
            log.info("hard negatives for %s already mined, skipping", name)
            continue

        slide = open_slide(path)
        try:
            if level >= slide.level_count:
                continue
            prob_grid, grid = predict_slide(
                slide, variables, level=level, batch_size=batch_size,
                model=model, input_size=input_size,
            )
            ps = grid.patch_size
            flat = prob_grid.reshape(-1)
            order = np.argsort(flat)[::-1]
            order = order[flat[order] >= prob_threshold][:max_per_slide]
            if len(order) == 0:
                log.info("%s: no false positives above %.2f", name, prob_threshold)
                continue

            writer = PackedPatchWriter(
                cfg.data.patches_dir, level, store_name, ps
            )
            ny, nx = prob_grid.shape
            for idx in order:
                gy, gx = divmod(int(idx), nx)
                x, y = gx * grid.stride, gy * grid.stride
                w, h = grid.valid_patch_extent(x, y)
                region = slide.read_region(
                    grid.level0_origin(x, y), level, (w, h)
                )
                if w < ps or h < ps:
                    full = np.full((ps, ps, 3), 255, np.uint8)
                    full[:h, :w] = region
                    region = full
                mined.append(writer.write(region, x, y, LABEL_NORMAL))
            writer.close()
            log.info(
                "%s: mined %d hard negatives (max prob %.3f)",
                name, len(order), float(flat[order[0]]),
            )
        finally:
            slide.close()

    if len(mined):
        manifest.extend(mined.records)
        manifest.save(mpath)
        log.info("appended %d hard negatives to %s", len(mined), mpath)
    return mined
