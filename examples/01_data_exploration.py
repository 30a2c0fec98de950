#!/usr/bin/env python
"""Data exploration & annotation QA (notebook-track replacement).

Mirrors ``01_02_data_explor_patch_extraction.ipynb``: obtain a slide (here a
synthetic one — pass ``--slide/--xml`` for real CAMELYON16 data), render its
tumor mask, a thumbnail, and the mask/patch side-by-side QA figures.
"""

import argparse
import os

from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
    tumor_spec,
    write_synthetic_case,
)
from ss25_hierarchical_multiscale_image_classification_tpu.visualization import (
    visualize_and_save_wsi,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--slide", default=None, help="slide path (.tif/.wsi.npz)")
    p.add_argument("--xml", default=None, help="annotation XML path")
    p.add_argument("--out", default="examples_out/explore")
    p.add_argument("--level", type=int, default=2)
    args = p.parse_args()

    slide, xml = args.slide, args.xml
    if slide is None:
        root = os.path.join(args.out, "synthetic")
        slide = write_synthetic_case(
            root, "tumor_076",
            tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45)),
        )
        xml = os.path.join(root, "annotations", "tumor_076.xml")
        print(f"fabricated synthetic slide at {slide}")

    artifacts = visualize_and_save_wsi(
        slide, xml, args.out, level=args.level, patch_xy=(64, 64),
        patch_size=224,
    )
    for k, v in artifacts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
