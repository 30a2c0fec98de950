"""Evaluation: FROC, feature sanity checks, metrics, uncertainty.

Rebuild of the reference's L4 (``src/utils/evaluation_FROC.py``,
``src/main.py:974-1070``, ``src/utils/metrics.py``,
``src/utils/uncertainty.py``, ``src/utils/export_eval.py``).
"""

from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (  # noqa: F401
    compute_evaluation_mask,
    compute_fp_tp_probs,
    compute_froc,
    compute_itc_list,
    read_csv_content,
)
from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.features_eval import (  # noqa: F401
    validate_features,
)
from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.metrics import (  # noqa: F401
    accuracy_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
)
from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.uncertainty import (  # noqa: F401
    monte_carlo_dropout,
    softmax_thresholding,
)
