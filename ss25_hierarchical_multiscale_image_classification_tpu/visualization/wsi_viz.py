"""WSI mask visualizer.

Rebuild of the standalone visualizer (``src/export_eval.py:62-140``): renders
the XML tumor mask at a level, saves the mask PNG, a patch crop at (x, y), the
corresponding mask crop, and a side-by-side QA figure.
"""

from __future__ import annotations

import os


from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
    polygons_to_mask,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.annotations import (
    parse_annotation_xml,
)
from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
    open_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("visualization.wsi")


def visualize_and_save_wsi(
    slide_path: str,
    xml_path: str,
    out_dir: str,
    level: int = 3,
    patch_xy: tuple[int, int] | None = None,
    patch_size: int = 224,
) -> dict:
    """Render the annotation mask and optional patch/mask crops.

    Returns the dict of written artifact paths.
    """
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    artifacts: dict[str, str] = {}
    slide = open_slide(slide_path)
    try:
        level_dims = slide.level_dimensions[level]
        base_dims = slide.level_dimensions[0]
        polygons = parse_annotation_xml(xml_path) if os.path.exists(xml_path) else []
        mask = polygons_to_mask(polygons, level_dims, base_dims)

        mask_path = os.path.join(out_dir, f"mask_level{level}.png")
        Image.fromarray(mask).save(mask_path)
        artifacts["mask"] = mask_path

        if patch_xy is not None:
            x, y = patch_xy
            ds = slide.level_downsamples[level]
            patch = slide.read_region(
                (int(x * ds), int(y * ds)), level, (patch_size, patch_size)
            )
            patch_path = os.path.join(out_dir, f"patch_x{x}_y{y}.png")
            Image.fromarray(patch).save(patch_path)
            artifacts["patch"] = patch_path

            mask_crop = mask[y : y + patch_size, x : x + patch_size]
            crop_path = os.path.join(out_dir, f"mask_crop_x{x}_y{y}.png")
            Image.fromarray(mask_crop).save(crop_path)
            artifacts["mask_crop"] = crop_path

            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 2, figsize=(8, 4))
            axes[0].imshow(patch)
            axes[0].set_title(f"patch ({x},{y}) L{level}")
            axes[0].axis("off")
            axes[1].imshow(mask_crop, cmap="gray", vmin=0, vmax=255)
            axes[1].set_title("mask crop")
            axes[1].axis("off")
            fig_path = os.path.join(out_dir, f"side_by_side_x{x}_y{y}.png")
            fig.savefig(fig_path, dpi=120, bbox_inches="tight")
            plt.close(fig)
            artifacts["figure"] = fig_path

        log.info("WSI visualization artifacts: %s", sorted(artifacts))
        return artifacts
    finally:
        slide.close()
