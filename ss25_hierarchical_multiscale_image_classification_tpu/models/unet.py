"""UNet (segmentation trunk + classification variant).

Rebuild of the reference's legacy UNet track (``src/models/unet/UNet.py:9-221``):
a classic valid-convolution UNet with center-crop skip concatenation, plus the
repurposed classification head (global-average-pool → Dense) the reference
bolted on for CIFAR10/Tiny-ImageNet (``UNet.py:70-73,114-117``).

TPU notes: SAME padding is used instead of the reference's valid convolutions
so skip shapes align without crops at power-of-two sizes; a ``center_crop``
path is kept for exact valid-conv semantics when requested.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def center_crop(x, target_h: int, target_w: int):
    """Center-crop NHWC to (target_h, target_w) — the reference's skip-concat
    crop (``UNet.py`` crop-and-concat)."""
    h, w = x.shape[1], x.shape[2]
    dy = (h - target_h) // 2
    dx = (w - target_w) // 2
    return x[:, dy : dy + target_h, dx : dx + target_w, :]


class _DoubleConv(nn.Module):
    filters: int
    padding: str
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.filters, (3, 3), padding=self.padding,
                        dtype=self.dtype, param_dtype=self.param_dtype)(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Encoder/decoder UNet. ``__call__`` returns per-pixel logits
    (B, H', W', out_channels)."""

    out_channels: int = 2
    features: Sequence[int] = (64, 128, 256, 512)
    bottleneck_features: int = 1024
    padding: str = "SAME"  # "VALID" reproduces the reference's crop topology
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = _DoubleConv(f, self.padding, self.dtype, self.param_dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = _DoubleConv(self.bottleneck_features, self.padding,
                        self.dtype, self.param_dtype)(x)

        for f, skip in zip(reversed(self.features), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
            skip = center_crop(skip, x.shape[1], x.shape[2])
            x = jnp.concatenate([skip, x], axis=-1)
            x = _DoubleConv(f, self.padding, self.dtype, self.param_dtype)(x)

        logits = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        return logits.astype(jnp.float32)


class UNetClassifier(nn.Module):
    """UNet trunk + GAP + Dense head (reference ``UNet.py:70-73,114-117``,
    Linear(64→num_classes) on the last decoder feature map)."""

    num_classes: int = 200
    features: Sequence[int] = (64, 128, 256, 512)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        for f in self.features:
            x = _DoubleConv(f, "SAME", self.dtype, self.param_dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _DoubleConv(self.features[-1] * 2, "SAME", self.dtype, self.param_dtype)(x)
        for f, skip in zip(reversed(self.features), reversed(skips)):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, param_dtype=self.param_dtype)(x)
            skip = center_crop(skip, x.shape[1], x.shape[2])
            x = jnp.concatenate([skip, x], axis=-1)
            x = _DoubleConv(f, "SAME", self.dtype, self.param_dtype)(x)
        x = jnp.mean(x, axis=(1, 2))  # GAP over the 64-ch decoder output
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=self.param_dtype)(x)
        return logits.astype(jnp.float32)
