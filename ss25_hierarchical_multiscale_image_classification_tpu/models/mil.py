"""Attention-MIL bag classifier with masked, shape-static bags.

The reference designed (but never wired) an ABMIL track: attention pooling
``softmax(U·tanh(V·x))`` over patch instances plus a 2-layer MLP head
(``src/models/mil_classifier.py:5-58``), alternative mean/attention poolings
(``src/models/mil_pooling.py``), a broken numpy/torch ``predict`` and a TODO
uncertainty stub. Here the track is fully wired and TPU-shaped:

- bags are padded to a static ``max_bag_size`` with a boolean mask (XLA wants
  static shapes; MIL bags are variable-length sets of up to ~10^4 patches);
- attention logits of padded slots are masked to −inf before softmax;
- ``predict`` is jittable softmax (fixing ``mil_classifier.py:47-54``);
- MC-dropout uncertainty is implemented (see ``evaluation/uncertainty.py``)
  rather than stubbed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_NEG_INF = -1e9


class MILAttentionPooling(nn.Module):
    """Gated-less attention pooling (``mil_classifier.py:12-18``):
    a = softmax(w · tanh(V h^T)), bag = Σ a_k h_k."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, mask=None):
        """h: (..., K, D) instances; mask: (..., K) bool, True = real.

        Returns (bag (..., D), attention (..., K))."""
        a = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="V")(h)
        a = jnp.tanh(a)
        a = nn.Dense(1, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="w")(a)[..., 0]  # (..., K)
        if mask is not None:
            a = jnp.where(mask, a, _NEG_INF)
        attn = nn.softmax(a.astype(jnp.float32), axis=-1)
        bag = jnp.einsum("...k,...kd->...d", attn.astype(h.dtype), h)
        return bag, attn


def mean_pool(h, mask=None):
    """Masked mean pooling (``mil_pooling.py:7-20``, ``mil_classifier.py:27``)."""
    if mask is None:
        return jnp.mean(h, axis=-2)
    m = mask.astype(h.dtype)[..., None]
    return jnp.sum(h * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)


def max_pool(h, mask=None):
    """Masked max pooling (``mil_classifier.py:29``)."""
    if mask is not None:
        h = jnp.where(mask[..., None], h, _NEG_INF)
    return jnp.max(h, axis=-2)


class MILClassifier(nn.Module):
    """Bag classifier: pooling ∈ {attention, mean, max} + MLP 512→128→2
    (``mil_classifier.py:20-45``)."""

    num_classes: int = 2
    attention_hidden_dim: int = 128
    head_hidden_dim: int = 128
    pooling: str = "attention"
    dropout_rate: float = 0.25
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bags, mask=None, train: bool = False):
        """bags: (B, K, D) padded instance features; mask: (B, K) bool.

        Returns (logits (B, num_classes), attention (B, K) or None)."""
        attn = None
        if self.pooling == "attention":
            pooled, attn = MILAttentionPooling(
                hidden_dim=self.attention_hidden_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(bags, mask)
        elif self.pooling == "mean":
            pooled = mean_pool(bags, mask)
        elif self.pooling == "max":
            pooled = max_pool(bags, mask)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")

        x = nn.Dense(self.head_hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype)(pooled)
        x = nn.relu(x)
        # dropout enables MC-dropout uncertainty at inference (uncertainty.py)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=self.param_dtype)(x)
        return logits.astype(jnp.float32), attn


def attention_params(params: dict) -> tuple:
    """Extract the attention-pooling parameters (V kernel, V bias, w) from a
    ``MILClassifier`` params tree — the handoff point to the streaming
    Pallas pool (``ops/pallas/mil_pool.py``) and the sharded collective pool
    below, both of which take raw arrays rather than a flax module."""
    p = params["MILAttentionPooling_0"]
    return p["V"]["kernel"], p["V"]["bias"], p["w"]["kernel"][:, 0]


def attention_weights(params: dict, h, mask=None):
    """Per-instance attention weights of a ``MILClassifier`` params tree:
    ``softmax(w · tanh(h V + b))`` over the bag axis (masked). Used by the
    streaming-inference path when the caller wants the attention map for
    visualization — the pooled bag itself comes from the Pallas kernel
    without materializing these intermediates."""
    v, vb, w = attention_params(params)
    a = jnp.tanh(h.astype(jnp.float32) @ v.astype(jnp.float32)
                 + vb.astype(jnp.float32)) @ w.astype(jnp.float32)
    if mask is not None:
        a = jnp.where(mask, a, _NEG_INF)
    return jax.nn.softmax(a, axis=-1)


def apply_head(params: dict, pooled, dropout_rate: float = 0.0, rng=None):
    """MLP head of ``MILClassifier`` (Dense→ReLU→[dropout]→Dense) applied to
    an externally-pooled bag. ``rng`` enables stochastic dropout (the
    MC-dropout sampling path: pooling is deterministic, so uncertainty
    sampling only needs to re-run the head, not re-pool the bag)."""
    d0, d1 = params["Dense_0"], params["Dense_1"]
    x = pooled.astype(jnp.float32) @ d0["kernel"].astype(jnp.float32) + d0["bias"]
    x = jax.nn.relu(x)
    if rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0)
    logits = x @ d1["kernel"].astype(jnp.float32) + d1["bias"]
    return logits.astype(jnp.float32)


def streaming_attention_pool(params: dict, h, mask, block_k: int = 512):
    """Attention-pool padded bags through the streaming Pallas kernel.

    Production inference path for huge bags (a slide contributes ~10^4+
    instances; SURVEY.md §5 "long-context"): the XLA module materializes
    (B, K, H) tanh activations plus (B, K) attention in HBM, the kernel
    streams instance blocks through VMEM with an online softmax. Bags are
    zero-padded (mask False) up to a ``block_k`` multiple; numerically
    identical to :class:`MILAttentionPooling` on the unpadded bag.
    """
    from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.mil_pool import (
        mil_attention_pool_pallas,
    )

    b, k, d = h.shape
    block_k = min(block_k, k)
    pad = (-k) % block_k
    if pad:
        h = jnp.concatenate([h, jnp.zeros((b, pad, d), h.dtype)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.zeros((b, pad), mask.dtype)], axis=1
        )
    v, vb, w = attention_params(params)
    return mil_attention_pool_pallas(h, mask, v, w, v_bias=vb,
                                     block_k=block_k)


def sharded_attention_pool(h_local, mask_local, v, w, v_bias=None,
                           axis_name: str = "data"):
    """Attention pooling over a bag whose instances are SHARDED across a
    mesh axis — the spatial-data-parallel MIL reduction SURVEY.md §5 calls
    for on bags too large for one chip (~10^4+ instances/slide).

    Numerically identical to pooling the gathered bag: the softmax runs as a
    two-phase collective (pmax for the global max, psum for the normalizer
    and the weighted feature sum), so no device ever materializes the full
    bag.

    Args:
        h_local: (K_local, D) this shard's instances.
        mask_local: (K_local,) bool validity of this shard's instances.
        v: (D, H) attention projection kernel; v_bias: optional (H,).
        w: (H,) scoring vector.
        axis_name: mesh axis the bag is sharded over.

    Returns:
        (D,) pooled bag (replicated across the axis).
    """
    import jax

    a = jnp.tanh(
        jnp.dot(h_local.astype(jnp.float32), v.astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + (0.0 if v_bias is None else v_bias.astype(jnp.float32))
    ) @ w.astype(jnp.float32)  # (K_local,)
    a = jnp.where(mask_local, a, _NEG_INF)

    m = jax.lax.pmax(jnp.max(a), axis_name)  # global max
    p = jnp.exp(a - m) * mask_local.astype(jnp.float32)
    denom = jax.lax.psum(jnp.sum(p), axis_name)
    weighted = jax.lax.psum(p @ h_local.astype(jnp.float32), axis_name)
    return weighted / jnp.maximum(denom, 1e-30)


def pad_bag(features, max_bag_size: int):
    """Pad (K, D) instance features to (max_bag_size, D) + mask.

    Oversized bags are truncated (uniformly strided so spatial coverage is
    preserved rather than dropping the tail).
    """
    import numpy as np

    k, d = features.shape
    if k > max_bag_size:
        idx = np.linspace(0, k - 1, max_bag_size).astype(np.int64)
        features = features[idx]
        k = max_bag_size
    out = np.zeros((max_bag_size, d), features.dtype)
    out[:k] = features
    mask = np.zeros((max_bag_size,), bool)
    mask[:k] = True
    return out, mask
