"""Fused inference preprocessing kernel.

One HBM pass over a uint8 patch batch producing ImageNet-normalized
activations (optionally bf16) and the per-patch mean-intensity tissue
statistic (``src/main.py:718``) — the on-device half of the streamed
extraction/inference pipeline. XLA fuses convert+scale on its own; the win
here is emitting the auxiliary reduction from the same pass instead of
re-reading 150 KB/patch from HBM.

TPU layout note: NHWC with C=3 is hostile to Pallas tiling (the 3-wide lane
dim pads to 128, a 42× VMEM blowup), so each image travels through the
kernel as one flat (H·W·3)-wide row — 150528 = 128·1176 for 224² patches —
and the per-channel affine is selected by lane-index mod 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(imgs_ref, out_ref, means_ref, *, out_dtype):
    # Mosaic has no direct u8→f32 cast; hop through int32
    x = imgs_ref[...].astype(jnp.int32).astype(jnp.float32)  # (BB, HW3)
    n = x.shape[1]
    means_ref[...] = jnp.sum(x, axis=1, keepdims=True) / float(n)

    chan = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 3
    y = x
    out = jnp.zeros_like(x)
    for c in range(3):
        m = float(IMAGENET_MEAN[c]) * 255.0
        s = float(IMAGENET_STD[c]) * 255.0
        out = jnp.where(chan == c, (y - m) / s, out)
    out_ref[...] = out.astype(out_dtype)


def fused_normalize(
    imgs_u8,
    dtype=jnp.bfloat16,
    block_b: int = 8,
):
    """(B, H, W, 3) uint8 → (normalized (B, H, W, 3) ``dtype``,
    per-patch means (B,) float32) in one fused pass.

    B must be a multiple of ``block_b`` (≥8: TPU sublane tiling). The f32
    intermediates push the scoped VMEM budget past the 16 MB default, so the
    kernel requests a larger limit explicitly.
    """
    b, h, w, c = imgs_u8.shape
    block_b = min(block_b, b)
    if b % block_b:
        raise ValueError(f"batch {b} not a multiple of block {block_b}")
    flat = imgs_u8.reshape(b, h * w * c)
    kernel = functools.partial(_kernel, out_dtype=dtype)
    out, means = pl.pallas_call(
        kernel,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, h * w * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, h * w * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * w * c), dtype),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(flat)
    return out.reshape(b, h, w, c), means[:, 0]
