"""ResNet50-based instance encoder for the MIL track.

Rebuild of ``src/models/cnn_encoder.py:6-22``: a (frozen-by-convention)
ResNet50 trunk projected 2048→512. Freezing is enforced by the caller via
``jax.lax.stop_gradient`` / optimizer masking rather than mutable flags.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet50,
)


class CNNEncoder(nn.Module):
    feature_dim: int = 512
    freeze_trunk: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        self.trunk = ResNet50(
            num_classes=None, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.projection = nn.Dense(
            self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype
        )

    def __call__(self, x, train: bool = False):
        import jax

        h = self.trunk(x, train=train and not self.freeze_trunk)
        if self.freeze_trunk:
            h = jax.lax.stop_gradient(h)
        return self.projection(h.astype(self.dtype)).astype(jnp.float32)

    def get_feature_dimension(self) -> int:
        return self.feature_dim
