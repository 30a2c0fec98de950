"""Visualization: attention heatmaps and WSI mask QA renders.

Rebuild of ``src/visualization/attention_heatmap.py`` and the standalone WSI
mask visualizer (``src/export_eval.py:62-140``).
"""

from ss25_hierarchical_multiscale_image_classification_tpu.visualization.attention_heatmap import (  # noqa: F401
    visualize_attention_heatmap,
)
from ss25_hierarchical_multiscale_image_classification_tpu.visualization.wsi_viz import (  # noqa: F401
    visualize_and_save_wsi,
)
