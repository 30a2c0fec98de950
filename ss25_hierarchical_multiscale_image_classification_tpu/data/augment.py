"""On-device augmentation and normalization (jittable, batched).

The reference runs its augmentations on CPU loader workers via torchvision
(``src/main.py:417-425``; SimCLR views at ``src/models/simclr.py:57-66``).
On TPU the host is the bottleneck, so augmentation moves on-device: every op
here is shape-static, vmapped over the batch, and fuses into the training
step under jit.

Op inventory vs the reference:
- train transform: HFlip + VFlip + Rotation + ColorJitter(0.2,0.2,0.2,0.1)
  + resize(224) + ImageNet normalize. TPU-first departure: the continuous
  ±90° rotation becomes a uniform choice of k·90° rotations (shape-preserving,
  no resampling gathers); jitter ops apply in fixed order with random factors.
- SimCLR views: RandomResizedCrop(224) + HFlip + ColorJitter(0.4,0.4,0.4,0.1)
  @p=0.8 + Grayscale @p=0.2 + normalize — all on device, two independent
  views per example (``src/datasets/simclr_dataset.py:11-13``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)

# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def normalize(imgs, dtype=jnp.float32):
    """uint8 (B,H,W,3) → ImageNet-normalized float (B,H,W,3).

    The affine runs on a (B, H, W*3) view: with C=3 in the vector lane
    dimension the TPU VPU uses 3 of 128 lanes (measured 2.5 ms per
    512x224x224 batch); merging W and C fills the lanes (~8x faster), with
    the per-channel constants tiled at period 3 over W*3 columns.
    """
    shape = imgs.shape
    w3 = shape[-2] * 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, dtype) * 255.0, shape[-2])
    std = jnp.tile(jnp.asarray(IMAGENET_STD, dtype) * 255.0, shape[-2])
    x = imgs.reshape(*shape[:-2], w3).astype(dtype)
    return ((x - mean) / std).reshape(shape)


# ---------------------------------------------------------------------------
# Color ops (inputs in [0,1] float)
# ---------------------------------------------------------------------------


def _adjust_brightness(img, factor):
    return img * factor


def _adjust_contrast(img, factor):
    # reduce in f32: a bf16 accumulation over ~150k pixels loses the mean
    mean = jnp.mean(
        img.astype(jnp.float32), axis=(-3, -2, -1), keepdims=True
    ).astype(img.dtype)
    return (img - mean) * factor + mean


def _adjust_saturation(img, factor):
    gray = jnp.mean(img, axis=-1, keepdims=True)
    return (img - gray) * factor + gray


import numpy as _np

_YIQ_FROM_RGB_64 = _np.array(
    [[0.299, 0.587, 0.114],
     [0.596, -0.274, -0.322],
     [0.211, -0.523, 0.312]], dtype=_np.float64,
)
_RGB_FROM_YIQ_64 = _np.linalg.inv(_YIQ_FROM_RGB_64)


def _apply_3x3(img, m):
    """Per-pixel 3x3 color transform as explicit elementwise ops (the VPU
    path; avoids MXU bf16-default precision on a 3-channel contraction)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    chans = [
        m[i][0] * r + m[i][1] * g + m[i][2] * b for i in range(3)
    ]
    return jnp.stack(chans, axis=-1)


def _adjust_hue(img, delta_turns):
    """Hue rotation by ``delta_turns`` (±0.5 = ±180°) via chroma-plane
    rotation in YIQ space (elementwise-only, TPU-friendly)."""
    theta = jnp.asarray(delta_turns, jnp.float32) * 2.0 * jnp.pi
    cos = jnp.cos(theta).astype(img.dtype)
    sin = jnp.sin(theta).astype(img.dtype)
    yiq = _apply_3x3(img, _YIQ_FROM_RGB_64.tolist())
    y = yiq[..., 0]
    i = yiq[..., 1] * cos - yiq[..., 2] * sin
    q = yiq[..., 1] * sin + yiq[..., 2] * cos
    return _apply_3x3(jnp.stack([y, i, q], axis=-1), _RGB_FROM_YIQ_64.tolist())


def color_jitter(rng, img, brightness, contrast, saturation, hue):
    """torchvision-style ColorJitter with factors drawn uniformly from
    [max(0, 1−s), 1+s] (and hue from [−h, h]); fixed op order."""
    kb, kc, ks, kh = jax.random.split(rng, 4)
    # cast factors to the image dtype: a strong f32 scalar would promote a
    # bf16 pipeline back to f32 (type-promotion rules), doubling its HBM cost
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness).astype(img.dtype)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast).astype(img.dtype)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation).astype(img.dtype)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    img = _adjust_brightness(img, fb)
    img = _adjust_contrast(img, fc)
    img = _adjust_saturation(img, fs)
    img = _adjust_hue(img, fh)
    return jnp.clip(img, 0.0, 1.0)


def _grayscale(img):
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    gray = jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.broadcast_to(gray, img.shape)


# ---------------------------------------------------------------------------
# Geometric ops
# ---------------------------------------------------------------------------


def _rot90_k(img, k):
    """Rotate a square (H,W,3) image by k·90° with a static 4-way branch."""
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
        ],
        img,
    )


def _bilinear_resample(img, y0, x0, h_span, w_span, out_size: int):
    """Sample an axis-aligned box [y0, y0+h_span)×[x0, x0+w_span) from (H,W,3)
    ``img`` into (out, out, 3) with bilinear interpolation. All args traced.

    Coordinate math is always f32 — at bf16, positions near 224 quantize
    to ~1.75 px — only the pixel blend runs in the image dtype."""
    H, W = img.shape[0], img.shape[1]
    f32 = jnp.float32
    oy = (jnp.arange(out_size, dtype=f32) + 0.5) / out_size
    ox = (jnp.arange(out_size, dtype=f32) + 0.5) / out_size
    sy = y0.astype(f32) + oy * h_span.astype(f32) - 0.5
    sx = x0.astype(f32) + ox * w_span.astype(f32) - 0.5
    y_lo = jnp.clip(jnp.floor(sy), 0, H - 1)
    x_lo = jnp.clip(jnp.floor(sx), 0, W - 1)
    y_hi = jnp.clip(y_lo + 1, 0, H - 1)
    x_hi = jnp.clip(x_lo + 1, 0, W - 1)
    wy = jnp.clip(sy - y_lo, 0.0, 1.0)[:, None, None].astype(img.dtype)
    wx = jnp.clip(sx - x_lo, 0.0, 1.0)[None, :, None].astype(img.dtype)
    y_lo, y_hi = y_lo.astype(jnp.int32), y_hi.astype(jnp.int32)
    x_lo, x_hi = x_lo.astype(jnp.int32), x_hi.astype(jnp.int32)

    def gather(ys, xs):
        rows = jnp.take(img, ys, axis=0)  # (out, W, 3)
        return jnp.take(rows, xs, axis=1)  # (out, out, 3)

    top = gather(y_lo, x_lo) * (1 - wx) + gather(y_lo, x_hi) * wx
    bot = gather(y_hi, x_lo) * (1 - wx) + gather(y_hi, x_hi) * wx
    return top * (1 - wy) + bot * wy


def random_resized_crop(rng, img, out_size: int, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics with a single rejection-free
    draw: sample area & aspect, clamp the box to the image."""
    H, W = img.shape[0], img.shape[1]
    k_area, k_ratio, k_y, k_x = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1]) * H * W
    log_r = jax.random.uniform(
        k_ratio, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    w = jnp.clip(jnp.sqrt(area * r), 1.0, W)
    h = jnp.clip(jnp.sqrt(area / r), 1.0, H)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (H - h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (W - w)
    return _bilinear_resample(img, y0, x0, h, w, out_size)


def resize(img, out_size: int):
    """Plain bilinear resize to (out, out, 3)."""
    return _bilinear_resample(
        img, jnp.asarray(0.0, img.dtype), jnp.asarray(0.0, img.dtype),
        jnp.asarray(img.shape[0], img.dtype), jnp.asarray(img.shape[1], img.dtype),
        out_size,
    )


# ---------------------------------------------------------------------------
# Full pipelines
# ---------------------------------------------------------------------------


def _train_augment_one(rng, img_u8):
    """One training example: flips + k·90° rotation + jitter(0.2,0.2,0.2,0.1).

    Computes in bfloat16: the pipeline is ~20 elementwise passes over the
    image (hue's YIQ round-trip alone is 12 channel combines) and purely
    HBM-bound, so halving the element width nearly halves its cost
    (measured 43 → ~24 ms per 512×224² batch); an 8-bit source doesn't
    carry more precision than bf16 anyway, and reductions stay f32
    (``_adjust_contrast``)."""
    k_h, k_v, k_r, k_j = jax.random.split(rng, 4)
    img = img_u8.astype(jnp.bfloat16) / 255.0
    img = jnp.where(jax.random.bernoulli(k_h), img[:, ::-1], img)
    img = jnp.where(jax.random.bernoulli(k_v), img[::-1], img)
    img = _rot90_k(img, jax.random.randint(k_r, (), 0, 4))
    img = color_jitter(k_j, img, 0.2, 0.2, 0.2, 0.1)
    return img


@functools.partial(jax.jit, static_argnames=("training",))
def preprocess_batch(rng, imgs_u8, training: bool = True):
    """uint8 (B,224,224,3) → normalized float32 (B,224,224,3).

    Training: random augmentation per example; eval: normalize only
    (``src/main.py:417-431``)."""
    if training:
        rngs = jax.random.split(rng, imgs_u8.shape[0])
        imgs = jax.vmap(_train_augment_one)(rngs, imgs_u8)
        imgs = imgs * 255.0
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
        return (imgs - mean) / std
    return normalize(imgs_u8)


@functools.partial(jax.jit, static_argnames=("training",))
def preprocess_multiscale_batch(rng, imgs_by_level: dict,
                                training: bool = True) -> dict:
    """dict {level: uint8 (B,S,S,3)} → dict of normalized float32 batches.

    Training augmentation is CONSISTENT across the scales of a cell: the
    co-located patches of one cell cover the identical level-0 field of
    view (per-level patch sizes 1792/896/448/224, reference
    ``src/main.py:614``), so the same flip / k·90° rotation keeps them
    geometrically aligned, and sharing the color-jitter draw keeps the
    stain appearance coherent across magnifications. Implemented by
    reusing the SAME per-example rng for every level —
    ``_train_augment_one``'s draws are independent of the image contents
    and shape, so equal keys yield equal transforms."""
    levels = sorted(imgs_by_level)
    if not training:
        return {lvl: normalize(imgs_by_level[lvl]) for lvl in levels}
    b = imgs_by_level[levels[0]].shape[0]
    rngs = jax.random.split(rng, b)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    out = {}
    for lvl in levels:
        imgs = jax.vmap(_train_augment_one)(rngs, imgs_by_level[lvl])
        out[lvl] = (imgs * 255.0 - mean) / std
    return out


def _simclr_view_one(rng, img_u8, out_size: int):
    """One SimCLR view (``src/models/simclr.py:57-66``).

    bf16 pipeline (reductions/coordinates stay f32) — same HBM-bound
    rationale as ``_train_augment_one``."""
    k_crop, k_h, k_jp, k_j, k_gp = jax.random.split(rng, 5)
    img = img_u8.astype(jnp.bfloat16) / 255.0
    img = random_resized_crop(k_crop, img, out_size)
    img = jnp.where(jax.random.bernoulli(k_h), img[:, ::-1], img)
    jittered = color_jitter(k_j, img, 0.4, 0.4, 0.4, 0.1)
    img = jnp.where(jax.random.bernoulli(k_jp, 0.8), jittered, img)
    img = jnp.where(jax.random.bernoulli(k_gp, 0.2), _grayscale(img), img)
    return img


@functools.partial(jax.jit, static_argnames=("out_size",))
def simclr_two_views(rng, imgs_u8, out_size: int = 224):
    """uint8 (B,H,W,3) → two independently augmented normalized views
    ((B,out,out,3) float32 each) of every example."""
    B = imgs_u8.shape[0]
    rngs = jax.random.split(rng, 2 * B).reshape(2, B)
    view = jax.vmap(_simclr_view_one, in_axes=(0, 0, None))
    v1 = view(rngs[0], imgs_u8, out_size)
    v2 = view(rngs[1], imgs_u8, out_size)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (v1 - mean) / std, (v2 - mean) / std
