"""Training: SPMD data-parallel trainers, losses, checkpoints.

TPU rebuild of the reference's L3 (``src/main.py:472-606``,
``src/models/simclr.py:68-123``): the weighted-loss default trainer, the
three-strategy trainer (balanced / weighted_loss / self_supervised), and
SimCLR pretraining — jitted train steps over a device mesh with bf16 compute
(the AMP equivalent) and Orbax checkpointing.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.train.state import (  # noqa: F401
    TrainState,
    create_train_state,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (  # noqa: F401
    class_weights_inv_min,
    class_weights_total_over_count,
    weighted_cross_entropy,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (  # noqa: F401
    Trainer,
    train_resnet_classifier,
    train_resnet_classifier_strategic,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.simclr_trainer import (  # noqa: F401
    pretrain_simclr,
)
