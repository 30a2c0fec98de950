#!/usr/bin/env python
"""Patch-extraction analytics (notebook-track replacement).

Mirrors ``02_patch_extraction.ipynb``: grid coverage/padding arithmetic for
the level-0 1792² grid (the notebook's 97792×221184 example → ≈1.26% loss
without padding) and a real extraction run with a per-level census.
"""

import argparse

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid import PatchGrid
from ss25_hierarchical_multiscale_image_classification_tpu.utils import (
    count_tumor_patches,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="data/camelyon16")
    p.add_argument("--level", type=int, default=3)
    args = p.parse_args()

    # The notebook's coverage arithmetic on the canonical giant slide:
    g = PatchGrid(level=0, width=97792, height=221184, downsample=1.0,
                  patch_size=1792, stride=1792)
    print(f"level-0 grid: {g.nx} x {g.ny} patches "
          f"(padded {g.padded_width}x{g.padded_height})")
    print(f"coverage loss without padding: "
          f"{g.coverage_loss_without_padding():.4%}")

    data = DataConfig(data_dir=args.data_dir)
    manifest = extract_patches(data, level=args.level)
    print(f"extracted manifest: {len(manifest)} patches, "
          f"counts {manifest.class_counts()}")
    count_tumor_patches(data.patches_dir)


if __name__ == "__main__":
    main()
