"""Unified, live configuration system.

The reference keeps three disconnected config layers (argparse flags, ad-hoc
module constants at ``src/main.py:46-56``, and two *dead* declarative configs:
``src/config.py`` and ``experiments/experiment_configs.yaml`` which nothing
imports). Here there is ONE dataclass hierarchy that the CLI, trainers, and
pipelines all actually consume, while preserving every constant the reference
hardcodes (citations inline).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Mapping

# ---------------------------------------------------------------------------
# Reference-pinned constants
# ---------------------------------------------------------------------------

#: Per-pyramid-level patch edge length in pixels (reference ``src/main.py:614``).
#: All four levels cover the same physical field of view at 4 magnifications.
PATCH_SIZES: dict[int, int] = {0: 1792, 1: 896, 2: 448, 3: 224}

#: Patches are skipped as background when mean RGB exceeds this
#: (reference ``src/main.py:718-719``).
TISSUE_MEAN_RGB_THRESHOLD: float = 240.0

#: Pad-to-grid fill value -- white (reference ``src/main.py:701``).
PAD_FILL_VALUE: int = 255

#: Default emission floor (probability space) for the detection producers.
#: The official FROC consumer (``src/utils/evaluation_FROC.py:156-183``)
#: ranks detections by score and sweeps thresholds itself, so emitting
#: liberally only ADDS operating points at the high-FP end of the curve --
#: it can raise but never lower the score. 0.05 keeps weak true lesions on
#: the curve that a 0.5 floor would silently drop.
DETECTION_PROB_THRESHOLD: float = 0.05

#: Model input resolution (reference ``src/main.py:417-425`` resize target).
INPUT_SIZE: int = 224

#: ImageNet normalization used by every transform pipeline in the reference
#: (``src/main.py:423-425``).
IMAGENET_MEAN: tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: tuple[float, float, float] = (0.229, 0.224, 0.225)

#: Global batch size, sized in the reference as "4 GPUS - 128 per GPU"
#: (``src/main.py:46``). Here: global batch sharded over the TPU mesh.
BATCH_SIZE: int = 512

#: FROC evaluation constants (reference ``src/main.py:1183-1184`` and
#: ``src/utils/evaluation_FROC.py:31,47,60``).
EVALUATION_MASK_LEVEL: int = 5
L0_RESOLUTION_UM_PER_PX: float = 0.243
FROC_ANNOTATION_EXPANSION_UM: float = 75.0
FROC_ITC_THRESHOLD_UM: float = 275.0

#: CAMELYON16 download source (reference ``src/main.py:53``).
CAMELYON16_BASE_URL: str = (
    "https://s3.ap-northeast-1.wasabisys.com/gigadb-datasets/live/pub/"
    "10.5524/100001_101000/100439/"
)

#: Subset download limits (reference ``src/main.py:138-149``).
SUBSET_LIMITS: dict[str, int] = {
    "train_normal": 50,
    "train_tumor": 110,
    "test_images": 30,
}


# ---------------------------------------------------------------------------
# Dataclass config tree
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DataConfig:
    """Paths and dataset layout."""

    data_dir: str = "data"
    #: subdirectories mirroring the reference layout so artifacts interoperate
    train_img_subdir: str = os.path.join("train", "img")
    test_img_subdir: str = os.path.join("test", "img")
    annotations_subdir: str = "annotations"
    patches_subdir: str = "patches"
    features_subdir: str = "features"
    #: "png" = reference-compatible one-PNG-per-patch layout;
    #: "packed" = TPU-friendly memmapped uint8 store + parquet manifest.
    patch_store_format: str = "packed"
    #: Macenko stain normalization applied to stored patches at extraction
    #: (--stain_norm; data/stain.py). The reference has no stain handling.
    stain_norm: bool = False
    val_fraction: float = 0.2  # main.py:414 train_test_split(test_size=0.2)
    split_seed: int = 42  # main.py:414 random_state=42
    balance_val_seed: int = 42  # main.py:448-465 RNG(42) val balancing
    max_samples_per_class: int = 7480  # main.py:49-50 SAMPLES_PER_CLASS

    @property
    def train_img_dir(self) -> str:
        return os.path.join(self.data_dir, self.train_img_subdir)

    @property
    def test_img_dir(self) -> str:
        return os.path.join(self.data_dir, self.test_img_subdir)

    @property
    def annotations_dir(self) -> str:
        return os.path.join(self.data_dir, self.annotations_subdir)

    @property
    def patches_dir(self) -> str:
        return os.path.join(self.data_dir, self.patches_subdir)

    @property
    def features_dir(self) -> str:
        return os.path.join(self.data_dir, self.features_subdir)

    def patch_level_dir(self, level: int) -> str:
        return os.path.join(self.patches_dir, f"level_{level}")


@dataclasses.dataclass
class ModelConfig:
    """ResNet18 patch classifier family."""

    num_classes: int = 2
    feature_dim: int = 512
    #: parameter dtype; compute runs in ``compute_dtype``
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    #: load ImageNet-pretrained torchvision weights when available
    #: (reference ``src/models/resnet.py:63-65``); falls back to He init
    #: in hermetic environments.
    pretrained: bool = True


@dataclasses.dataclass
class TrainConfig:
    """Default weighted-loss trainer (reference ``src/main.py:472-534``)."""

    epochs: int = 30  # main.py:496
    learning_rate: float = 1e-4  # main.py:492
    batch_size: int = BATCH_SIZE
    checkpoint_every_epochs: int = 10  # main.py:528-531
    strategy_epochs: int = 5  # strategy trainer, main.py:575
    log_every_steps: int = 50
    seed: int = 0
    #: Fine-tune with frozen BatchNorm statistics (gamma/beta still train).
    #: Standard regime for ImageNet warm starts; every norm becomes a
    #: fusable conv epilogue instead of two extra HBM passes, worth ~1.4x
    #: on the train step (docs/PERFORMANCE.md). CLI: ``--freeze_bn``.
    freeze_bn: bool = False


@dataclasses.dataclass
class SimCLRConfig:
    """SimCLR pretraining (reference ``src/models/simclr.py``)."""

    epochs: int = 200  # simclr.py:85
    batch_size: int = BATCH_SIZE  # simclr.py:72
    learning_rate: float = 1e-3  # simclr.py:80
    temperature: float = 0.5  # simclr.py:37
    projection_dim: int = 128  # simclr.py:17-24 (512 -> 512 -> 128)
    projection_hidden_dim: int = 512
    early_stop_patience: int = 20  # simclr.py:100-114
    early_stop_check_every: int = 20
    checkpoint_every_epochs: int = 50  # simclr.py:117
    seed: int = 0
    #: "xla" (global-view SPMD friendly, default) or "pallas" (the streaming
    #: flash-style kernel, single-chip hot path)
    loss_impl: str = "xla"


@dataclasses.dataclass
class MILConfig:
    """Attention-MIL bag classifier (reference ``src/models/mil_classifier.py``)."""

    input_dim: int = 512
    attention_hidden_dim: int = 128
    head_hidden_dim: int = 128
    num_classes: int = 2
    pooling: str = "attention"  # attention | mean | max (mil_classifier.py:24-31)
    #: head dropout (mil_classifier.py:40); also the MC-dropout noise rate
    dropout_rate: float = 0.25
    #: static bag-size bucket for XLA (bags padded with mask to this size)
    max_bag_size: int = 4096
    #: bags with >= this many instances pool through the streaming Pallas
    #: kernel at inference (ops/pallas/mil_pool.py): no (K, H) tanh / (K,)
    #: attention intermediates in HBM. Smaller bags stay on the XLA module
    #: (kernel grid/dispatch overhead dominates below this size).
    streaming_bag_threshold: int = 4096
    #: reference Config.LEARNING_RATE (config.py:29); measured: 1e-4 is
    #: visibly undertrained on few-bag datasets (steps/epoch = bags/8)
    learning_rate: float = 1e-3
    epochs: int = 20


@dataclasses.dataclass
class UncertaintyConfig:
    """Uncertainty estimation knobs (reference ``src/config.py:33-34``)."""

    softmax_threshold: float = 0.7
    monte_carlo_samples: int = 100


@dataclasses.dataclass
class MeshConfig:
    """TPU mesh / parallelism layout."""

    #: data-parallel axis name
    data_axis: str = "data"
    #: number of devices; None = all visible
    num_devices: int | None = None


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    simclr: SimCLRConfig = dataclasses.field(default_factory=SimCLRConfig)
    mil: MILConfig = dataclasses.field(default_factory=MILConfig)
    uncertainty: UncertaintyConfig = dataclasses.field(
        default_factory=UncertaintyConfig
    )
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    models_dir: str = "models_out"
    log_dir: str = "logs"

    # ------------------------------------------------------------------
    def replace(self, **updates: Any) -> "Config":
        return dataclasses.replace(self, **updates)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Config":
        def _build(dc_type, values):
            if not dataclasses.is_dataclass(dc_type):
                return values
            fields = {f.name: f for f in dataclasses.fields(dc_type)}
            kwargs = {}
            for key, val in values.items():
                if key not in fields:
                    continue
                ft = fields[key].type
                sub = _FIELD_TYPES.get((dc_type.__name__, key))
                kwargs[key] = _build(sub, val) if sub else val
            return dc_type(**kwargs)

        return _build(cls, dict(d))

    def print_config(self) -> None:
        """Parity with reference ``Config.print_config()`` (config.py:44-58)."""
        print(self.to_json())


_FIELD_TYPES = {
    ("Config", "data"): DataConfig,
    ("Config", "model"): ModelConfig,
    ("Config", "train"): TrainConfig,
    ("Config", "simclr"): SimCLRConfig,
    ("Config", "mil"): MILConfig,
    ("Config", "uncertainty"): UncertaintyConfig,
    ("Config", "mesh"): MeshConfig,
}

_default_config: Config | None = None


def get_config() -> Config:
    global _default_config
    if _default_config is None:
        _default_config = Config()
    return _default_config
