"""Misc utilities: directory restructure, data-integrity tooling."""

from ss25_hierarchical_multiscale_image_classification_tpu.utils.structure import (  # noqa: F401
    check_good_files,
    count_tumor_patches,
    group_patches_by_slide,
    move_files_up,
)
