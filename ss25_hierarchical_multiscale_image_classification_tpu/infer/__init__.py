"""Inference: batched feature extraction and full-slide heatmaps.

Rebuild of the reference's L3/L4 inference paths: ``extract_features``
(``src/main.py:805-932``) plus the **missing producer** of the FROC pipeline
— full-slide sliding-window inference emitting probability heatmaps, level-6
tumor overlays, and ``prob,x,y`` detection CSVs (the reference only ships the
consumer, ``src/utils/evaluation_FROC.py``; SURVEY.md §3.5).
"""

from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (  # noqa: F401
    extract_features,
    extract_features_with_simclr,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (  # noqa: F401
    predict_slide,
    write_detection_csv,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.overlay import (  # noqa: F401
    render_overlay,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.fleet import (  # noqa: F401
    predict_slide_fleet,
)
