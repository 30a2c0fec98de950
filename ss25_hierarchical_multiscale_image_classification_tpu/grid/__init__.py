"""Pyramid grid math, polygon rasterization, and patch labeling.

The semantic core of hierarchical multiscale patch extraction: everything the
reference does with per-level patch sizes, pad-to-grid, tumor masks, and
tissue filtering (reference ``src/main.py:372-410,609-732``) expressed as pure
functions — host (numpy/PIL) versions for exact artifact parity and jittable
JAX versions for the streamed on-device pipeline.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (  # noqa: F401
    PatchGrid,
    patch_size_for_level,
    padded_extent,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (  # noqa: F401
    polygons_to_mask,
    polygons_to_mask_jax,
)
from ss25_hierarchical_multiscale_image_classification_tpu.grid.labeling import (  # noqa: F401
    is_tissue,
    is_tissue_host,
    patch_labels_from_mask,
    patch_labels_from_mask_host,
)
