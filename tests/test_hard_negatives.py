"""Hard-negative mining loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models import (
    ResNet18Classifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.hard_negatives import (
    mine_hard_negatives,
)


def test_mine_hard_negatives(synthetic_case):
    cfg = Config(data=DataConfig(data_dir=synthetic_case))
    level = 2
    base = extract_patches(cfg.data, level=level, stride=112)
    n_before = len(load_or_scan_manifest(cfg.data.patches_dir, level))

    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    mined = mine_hard_negatives(
        cfg, dict(variables), level=level, prob_threshold=0.0,
        max_per_slide=4, model=model, batch_size=8, input_size=64,
    )
    # only normal_001 is annotation-free; with threshold 0 every tissue cell
    # is a candidate
    assert len(mined) >= 1
    assert all(r.slide == "normal_001__hardneg" for r in mined)
    assert all(r.label == 0 for r in mined)

    after = load_or_scan_manifest(cfg.data.patches_dir, level)
    assert len(after) == n_before + len(mined)
    # pack file exists and is readable through the standard reader
    from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (
        PatchReader,
    )

    reader = PatchReader(after)
    idx = next(
        i for i, r in enumerate(after) if r.slide.endswith("__hardneg")
    )
    patch = reader.read(idx)
    assert patch.shape == (448, 448, 3)

    # idempotent: second run skips the already-mined slide
    again = mine_hard_negatives(
        cfg, dict(variables), level=level, prob_threshold=0.0,
        max_per_slide=4, model=model, batch_size=8, input_size=64,
    )
    assert len(again) == 0
