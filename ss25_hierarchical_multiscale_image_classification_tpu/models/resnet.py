"""ResNet family in flax.linen, TPU-first.

Rebuilds the reference's torchvision-backed models
(``src/models/resnet.py:22-91``): the ResNet18 patch classifier (fc →
Dense(2)), the fc-stripped 512-d feature extractor, and ``UnifiedResNet``
(identity or classification head). Design choices for TPU:

- NHWC layout end-to-end (XLA's native conv layout on TPU);
- bfloat16 activations/compute with float32 parameters and batch stats —
  the rebuild's equivalent of the reference's AMP autocast
  (``src/main.py:499-508``);
- BatchNorm accepts an ``axis_name`` so running statistics aggregate across
  the data-parallel mesh axis instead of per-replica (the DataParallel
  replicate/gather of the reference has no TPU analogue);
- a generic ``ResNet`` covers both BasicBlock (18/34) and Bottleneck (50)
  so the MIL track's ResNet50 encoder (``src/models/cnn_encoder.py:6``)
  shares the implementation.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet18/34)."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        # explicit (1,1) padding: identical to SAME at stride 1, but at
        # stride 2 it reproduces torch's symmetric padding (SAME would pad
        # (0,1)) so converted torchvision weights match at the logit level
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)])(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides),
                name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_norm")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 block (ResNet50+), expansion 4."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    @nn.compact
    def __call__(self, x):
        residual = x
        y = self.conv(self.filters, (1, 1))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)])(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1))(y)
        y = self.norm(scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * 4, (1, 1), (self.strides, self.strides),
                name="downsample_conv",
            )(residual)
            residual = self.norm(name="downsample_norm")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Generic ResNet trunk + optional classification head.

    ``num_classes=None`` yields the fc-stripped feature extractor of the
    reference (``nn.Sequential(*children[:-1])``, ``src/models/resnet.py:36``):
    output (B, feature_dim) pooled features.
    """

    stage_sizes: Sequence[int]
    block_cls: type[nn.Module] = BasicBlock
    num_classes: int | None = 2
    num_filters: int = 64
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    axis_name: str | None = None
    # Frozen-BN fine-tune mode: BatchNorm always normalizes with the stored
    # running statistics, even under train=True (gamma/beta still train).
    # Training-mode BN must materialize every conv output to HBM twice
    # (batch-stat reduction, then normalize); with fixed stats the
    # scale/shift is a pure elementwise epilogue XLA fuses into the conv.
    # Standard fine-tune regime for ImageNet warm starts (the reference
    # always trains FROM torchvision weights, ``src/models/resnet.py:63-65``)
    # and worth ~1.4x on the training step — see docs/PERFORMANCE.md.
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, from_stem: bool = False):
        """Forward pass.

        Args:
            from_stem: when True, ``x`` is the already-pooled stem output
                (B, H/4, W/4, 64) — e.g. from the fused Pallas stem kernel
                (``ops/pallas/fused_stem.py``) — and the stem layers are
                skipped. Stem parameters stay in the variable tree; flax
                simply does not visit them.
        """
        conv = partial(
            nn.Conv,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )
        bn_train = train and not self.frozen_bn
        norm = partial(
            nn.BatchNorm,
            use_running_average=not bn_train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.axis_name if bn_train else None,
        )

        x = x.astype(self.dtype)
        if not from_stem:
            x = conv(self.num_filters, (7, 7), (2, 2),
                     padding=[(3, 3), (3, 3)], name="stem_conv")(x)
            x = norm(name="stem_norm")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])

        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"stage{i + 1}_block{j}",
                )(x)

        x = jnp.mean(x, axis=(1, 2))  # global average pool → (B, C)
        features = x.astype(jnp.float32)
        if self.num_classes is None:
            return features
        logits = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc",
        )(x)
        return logits.astype(jnp.float32)


def ResNet18Classifier(num_classes: int = 2, **kw) -> ResNet:
    """ResNet18 with a ``Dense(512→num_classes)`` head
    (reference ``src/models/resnet.py:57-77``)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                  num_classes=num_classes, **kw)


def ResNet18FeatureExtractor(**kw) -> ResNet:
    """fc-stripped ResNet18 → (B, 512) features
    (reference ``src/models/resnet.py:22-40``)."""
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock,
                  num_classes=None, **kw)


def UnifiedResNet(mode: str = "features", num_classes: int = 2, **kw) -> ResNet:
    """Feature or classifier head behind one flag
    (reference ``src/models/resnet.py:42-55``)."""
    if mode == "features":
        return ResNet18FeatureExtractor(**kw)
    if mode == "classifier":
        return ResNet18Classifier(num_classes=num_classes, **kw)
    raise ValueError(f"unknown mode {mode!r}")


def ResNet50(num_classes: int | None = 2, **kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck,
                  num_classes=num_classes, **kw)


# ---------------------------------------------------------------------------
# Head-stripping / encoder-reuse semantics
# ---------------------------------------------------------------------------


def strip_head(variables: dict) -> dict:
    """Drop the ``fc`` head from a classifier's variables so the trunk can be
    loaded into a feature extractor — the reference's fc-key-strip merge
    (``src/models/resnet.py:27-31``, ``src/main.py:851-859``)."""
    out = {}
    for col, tree in variables.items():
        out[col] = {k: v for k, v in tree.items() if k != "fc"}
    return out


def merge_trunk(target: dict, source: dict) -> dict:
    """Copy every non-head entry of ``source`` over ``target`` (same trunk
    topology), keeping target-only entries (e.g. a fresh head)."""
    merged = {}
    for col, tree in target.items():
        src_tree = source.get(col, {})
        merged[col] = {
            k: src_tree.get(k, v) if k != "fc" else v for k, v in tree.items()
        }
    return merged
