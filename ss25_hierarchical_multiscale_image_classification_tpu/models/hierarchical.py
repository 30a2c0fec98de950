"""Hierarchical multiscale patch classifier.

The capability the reference is NAMED for but never built: fuse all
magnifications of one location (levels 0-3 cover the same field of view at
patch sizes 1792/896/448/224, ``src/main.py:614``) into one prediction.

Design (TPU-first): a **shared** ResNet18 trunk applied to every scale by
folding the scale axis into the batch — one big conv batch on the MXU
instead of S small ones — followed by scale-embedding-aware fusion
(concat → MLP head, or attention over scales).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18FeatureExtractor,
)


class HierarchicalPatchClassifier(nn.Module):
    """Multiscale fusion classifier.

    Input: dict[level → (B, S, S, 3)] co-located patches (all resized to the
    same spatial size). Output: (B, num_classes) logits.
    """

    levels: Sequence[int] = (2, 3)
    num_classes: int = 2
    fusion: str = "concat"  # "concat" | "attention"
    fusion_hidden_dim: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    axis_name: str | None = None

    def setup(self):
        self.trunk = ResNet18FeatureExtractor(
            dtype=self.dtype, param_dtype=self.param_dtype,
            axis_name=self.axis_name,
        )
        # learned per-scale embedding added to the pooled features
        self.scale_embed = self.param(
            "scale_embed",
            nn.initializers.normal(0.02),
            (len(self.levels), 512),
            self.param_dtype,
        )
        if self.fusion == "attention":
            self.attn_v = nn.Dense(self.fusion_hidden_dim, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
            self.attn_w = nn.Dense(1, use_bias=False, dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        self.head_hidden = nn.Dense(self.fusion_hidden_dim, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        self.head_out = nn.Dense(self.num_classes, dtype=self.dtype,
                                 param_dtype=self.param_dtype)
        # per-scale auxiliary classifier, shared across scales (the scale
        # embedding already distinguishes them): deep supervision during
        # training AND the per-level-probability ensemble at inference
        self.aux_head = nn.Dense(self.num_classes, dtype=self.dtype,
                                 param_dtype=self.param_dtype)

    def __call__(self, patches_by_level: dict, train: bool = False,
                 with_aux: bool = False):
        levels = sorted(patches_by_level)
        if list(levels) != sorted(self.levels):
            raise ValueError(
                f"expected levels {sorted(self.levels)}, got {levels}"
            )
        b = patches_by_level[levels[0]].shape[0]
        s = len(levels)
        # fold scales into the batch: ONE trunk invocation on (B*S, H, W, 3)
        stacked = jnp.concatenate(
            [patches_by_level[lvl] for lvl in levels], axis=0
        )
        feats = self.trunk(stacked, train=train)  # (S*B, 512)
        feats = feats.reshape(s, b, 512).transpose(1, 0, 2)  # (B, S, 512)
        if with_aux:
            return self.fuse(feats), self.aux_logits(feats)
        return self.fuse(feats)

    def aux_logits(self, feats):
        """(B, S, 512) pooled per-scale features → (B, S, num_classes)
        per-scale logits (the single-magnification opinions the ensemble
        averages with the fusion head)."""
        e = feats + self.scale_embed[None, :, :].astype(feats.dtype)
        return self.aux_head(e.astype(self.dtype)).astype(jnp.float32)

    def fuse(self, feats):
        """(B, S, 512) pooled per-scale features → (B, num_classes) logits.

        Everything after the shared trunk; exposed so the int8 inference
        path can run the trunk quantized (``models/quantized.py``) and
        apply the scale-embedding + fusion head here in float
        (``model.apply(vars, feats, method=HierarchicalPatchClassifier.fuse)``).
        """
        b, s = feats.shape[0], feats.shape[1]
        feats = feats + self.scale_embed[None, :, :].astype(feats.dtype)

        if self.fusion == "attention":
            a = self.attn_w(jnp.tanh(self.attn_v(feats.astype(self.dtype))))
            attn = nn.softmax(a[..., 0].astype(jnp.float32), axis=-1)
            fused = jnp.einsum("bs,bsd->bd", attn.astype(feats.dtype), feats)
        else:
            fused = feats.reshape(b, s * 512)

        x = nn.relu(self.head_hidden(fused.astype(self.dtype)))
        return self.head_out(x).astype(jnp.float32)
