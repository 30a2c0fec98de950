"""Data layer: manifests, patch stores, extraction, datasets, sampling.

TPU rebuild of the reference's L1 (``src/main.py:83-410,609-761``,
``src/datasets/``): patch extraction writes either the reference-compatible
PNG-per-patch layout or a packed memmap store addressed by a parquet
manifest; training consumes manifest-indexed batches with on-device
augmentation instead of PIL transform stacks on loader workers.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (  # noqa: F401
    PatchManifest,
    PatchRecord,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.patch_store import (  # noqa: F401
    PatchReader,
    PackedPatchWriter,
    PngPatchWriter,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (  # noqa: F401
    extract_patches,
    extract_patches_for_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (  # noqa: F401
    PatchDataset,
    slide_level_split,
)
