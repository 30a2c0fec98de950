"""Model layer: ResNet family, SimCLR, MIL, CNN encoder, UNet (flax.linen).

TPU rebuild of the reference's ``src/models/`` — NHWC layouts, bfloat16
compute with float32 params, cross-device BatchNorm via ``axis_name``, and
shape-static masked MIL bags.
"""

from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (  # noqa: F401
    ResNet,
    ResNet18Classifier,
    ResNet18FeatureExtractor,
    ResNet50,
    UnifiedResNet,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (  # noqa: F401
    SimCLRModel,
    nt_xent_loss,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.mil import (  # noqa: F401
    MILAttentionPooling,
    MILClassifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.cnn_encoder import (  # noqa: F401
    CNNEncoder,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.unet import (  # noqa: F401
    UNet,
    UNetClassifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (  # noqa: F401
    QuantizedResNet18,
    quantize_resnet18,
)
