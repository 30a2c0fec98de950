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


def _interp_matrix(p0, span, in_size: int, out_size: int):
    """(out, in) bilinear interpolation matrix for an axis-aligned box
    [p0, p0+span) of an ``in_size`` axis — two nonzeros per row.

    Coordinate math is always f32 — at bf16, positions near 224 quantize
    to ~1.75 px."""
    f32 = jnp.float32
    o = (jnp.arange(out_size, dtype=f32) + 0.5) / out_size
    s = p0.astype(f32) + o * span.astype(f32) - 0.5
    lo = jnp.clip(jnp.floor(s), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = jnp.clip(s - lo, 0.0, 1.0)
    # lo == hi at clipped borders: the one-hot sum still totals 1
    return (
        jax.nn.one_hot(lo.astype(jnp.int32), in_size, dtype=f32) * (1 - w[:, None])
        + jax.nn.one_hot(hi.astype(jnp.int32), in_size, dtype=f32) * w[:, None]
    )


def _bilinear_resample(img, y0, x0, h_span, w_span, out_size: int):
    """Sample an axis-aligned box [y0, y0+h_span)×[x0, x0+w_span) from (H,W,3)
    ``img`` into (out, out, 3) with bilinear interpolation. All args traced.

    Implemented as two separable interpolation MATMULS (one-hot weight
    matrices with two nonzeros per row) instead of 4 gathers + blends:
    gathers are VPU/HBM-bound and slow under vmap, while batched (224,H)
    x (H,W*3) contractions ride the MXU — the round-4 two-view augment
    went 50 → ~7 ms at B=512 on v5e (docs/PERFORMANCE.md)."""
    H, W = img.shape[0], img.shape[1]
    wy = _interp_matrix(y0, h_span, H, out_size).astype(img.dtype)
    wx = _interp_matrix(x0, w_span, W, out_size).astype(img.dtype)
    # (out,H) @ (H,W,3) → (out,W,3), then contract W with (out,W)
    tmp = jnp.einsum("oh,hwc->owc", wy, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,owc->opc", wx, tmp.astype(img.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(img.dtype)


def _sample_crop_box(rng, H: int, W: int, scale=(0.08, 1.0),
                     ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop box with a single rejection-free
    draw: sample area & aspect, clamp the box to the image. Returns
    (y0, x0, h, w) scalars."""
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
    return y0, x0, h, w


def random_resized_crop(rng, img, out_size: int, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics (box via
    :func:`_sample_crop_box`, resample via the separable-matmul path)."""
    H, W = img.shape[0], img.shape[1]
    y0, x0, h, w = _sample_crop_box(rng, H, W, scale, ratio)
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


# ---------------------------------------------------------------------------
# Fused batched training augmentation
#
# The per-example reference pipeline (``_augment_one_with_params``) is ~25
# HBM-bound elementwise passes per image (hue's YIQ round trip alone is
# 12 channel combines), and under vmap its ``lax.switch`` rotation
# materializes all four branches. At B=512x224² that measured ~24 ms —
# about half the whole train step. The fused path exploits two algebraic
# facts to collapse it to ~4 passes:
#
# 1. flips + k·90° rotations generate the dihedral group D4, every element
#    of which is (transpose?) ∘ (x-reverse?) ∘ (y-reverse?) — so the
#    data-dependent geometric transform is ONE batched transpose plus two
#    fused selects over reversed views, not a 4-way materialized switch;
# 2. brightness/contrast/saturation/hue are jointly affine per pixel:
#    out = a·(R_hue @ M_sat) @ rgb + c·1 with a = fb·fc and
#    c = (1−fc)·fb·mean(img) (each 3x3 maps 1→1, so the contrast offset
#    stays scalar). One f32 mean reduction + one fused affine/clip/
#    normalize pass replaces the whole jitter chain.
#
# ``_augment_one_with_params`` keeps the reference op chain for the parity
# test (``tests/test_augment.py``); both paths consume the same sampled
# parameter set.
# ---------------------------------------------------------------------------


def _d4_tables():
    """Brute-force the (hflip, vflip, rot_k) → (transpose, xrev, yrev)
    composition table with numpy at import time."""
    probe = _np.arange(16.0).reshape(4, 4)

    def old(h, v, k):
        x = probe[:, ::-1] if h else probe
        x = x[::-1] if v else x
        return _np.rot90(x, k)

    def rep(t, fx, fy):
        x = probe.T if t else probe
        x = x[:, ::-1] if fx else x
        return x[::-1] if fy else x

    t_tab = _np.zeros((2, 2, 4), _np.int32)
    fx_tab = _np.zeros((2, 2, 4), _np.int32)
    fy_tab = _np.zeros((2, 2, 4), _np.int32)
    for h in range(2):
        for v in range(2):
            for k in range(4):
                want = old(h, v, k)
                matches = [
                    (t, fx, fy)
                    for t in range(2)
                    for fx in range(2)
                    for fy in range(2)
                    if _np.array_equal(rep(t, fx, fy), want)
                ]
                if not matches:
                    raise AssertionError("D4 decomposition failed")
                t_tab[h, v, k], fx_tab[h, v, k], fy_tab[h, v, k] = matches[0]
    return t_tab, fx_tab, fy_tab


_D4_T, _D4_FX, _D4_FY = _d4_tables()


def sample_augment_params(
    rng, b: int, brightness: float = 0.2, contrast: float = 0.2,
    saturation: float = 0.2, hue: float = 0.1,
) -> dict:
    """Per-example augmentation draws for a batch of ``b`` images."""
    kh, kv, kr, kb, kc, ks, khue = jax.random.split(rng, 7)
    return {
        "h": jax.random.bernoulli(kh, shape=(b,)),
        "v": jax.random.bernoulli(kv, shape=(b,)),
        "k": jax.random.randint(kr, (b,), 0, 4),
        "fb": jax.random.uniform(
            kb, (b,), minval=max(0.0, 1 - brightness), maxval=1 + brightness
        ),
        "fc": jax.random.uniform(
            kc, (b,), minval=max(0.0, 1 - contrast), maxval=1 + contrast
        ),
        "fs": jax.random.uniform(
            ks, (b,), minval=max(0.0, 1 - saturation), maxval=1 + saturation
        ),
        "fh": jax.random.uniform(khue, (b,), minval=-hue, maxval=hue),
    }


def _jitter_affine(params, m0):
    """Compose the per-example color maps: (B,3,3) matrix + (B,) bias, f32.

    ``m0`` is the per-image mean of the [0,1] input. Derivation: after
    brightness x1 = fb·x (mean m1 = fb·m0), contrast gives
    x2 = fc·x1 + (1−fc)·m1·1; saturation multiplies by
    M_s = fs·I + (1−fs)·G (G = ones/3, channel mean) and hue by
    R = RGB←YIQ · rot(2π·fh) · YIQ←RGB. Both fix the all-ones vector, so
    out = (fb·fc)·(R@M_s)@x + (1−fc)·fb·m0·1."""
    fb = params["fb"].astype(jnp.float32)
    fc = params["fc"].astype(jnp.float32)
    fs = params["fs"].astype(jnp.float32)
    theta = params["fh"].astype(jnp.float32) * 2.0 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    eye = jnp.eye(3, dtype=jnp.float32)
    g = jnp.full((3, 3), 1.0 / 3.0, jnp.float32)
    m_sat = fs[:, None, None] * eye + (1.0 - fs)[:, None, None] * g
    zero = jnp.zeros_like(cos)
    one = jnp.ones_like(cos)
    rot = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cos, -sin], -1),
            jnp.stack([zero, sin, cos], -1),
        ],
        -2,
    )  # (B,3,3) chroma-plane rotation in YIQ
    to_yiq = jnp.asarray(_YIQ_FROM_RGB_64, jnp.float32)
    from_yiq = jnp.asarray(_RGB_FROM_YIQ_64, jnp.float32)
    r_hue = jnp.einsum("ij,bjk,kl->bil", from_yiq, rot, to_yiq)
    m = jnp.einsum("bij,bjk->bik", r_hue, m_sat) * (fb * fc)[:, None, None]
    bias = (1.0 - fc) * fb * m0.astype(jnp.float32)
    return m, bias


def augment_batch(params: dict, imgs_u8, dtype=jnp.bfloat16):
    """Fused batched train augmentation: uint8 (B,H,W,3), H==W →
    ImageNet-normalized float32. Numerically matches the reference chain
    (``_augment_one_with_params``) within ``dtype`` tolerance."""
    h = params["h"].astype(jnp.int32)
    v = params["v"].astype(jnp.int32)
    k = params["k"]
    t = jnp.asarray(_D4_T)[h, v, k].astype(bool)
    fx = jnp.asarray(_D4_FX)[h, v, k].astype(bool)
    fy = jnp.asarray(_D4_FY)[h, v, k].astype(bool)
    x = imgs_u8
    xt = jnp.swapaxes(x, 1, 2)
    x = jnp.where(t[:, None, None, None], xt, x)
    x = jnp.where(fx[:, None, None, None], x[:, :, ::-1], x)
    x = jnp.where(fy[:, None, None, None], x[:, ::-1], x)

    # per-image mean of the [0,1] image, reduced in f32
    m0 = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3)) / 255.0
    m, bias = _jitter_affine(params, m0)
    md = m.astype(dtype)
    biasd = bias.astype(dtype)
    xd = x.astype(dtype) * jnp.asarray(1.0 / 255.0, dtype)
    r, g, b3 = xd[..., 0], xd[..., 1], xd[..., 2]

    def chan(d):
        c = (
            md[:, d, 0, None, None] * r
            + md[:, d, 1, None, None] * g
            + md[:, d, 2, None, None] * b3
            + biasd[:, None, None]
        )
        c = jnp.clip(c, 0.0, 1.0).astype(jnp.float32)
        return (c * 255.0 - IMAGENET_MEAN[d] * 255.0) / (
            IMAGENET_STD[d] * 255.0
        )

    return jnp.stack([chan(0), chan(1), chan(2)], axis=-1)


def _augment_one_with_params(img_u8, h, v, k, fb, fc, fs, fh):
    """Reference per-example chain (flips → rot90 → jitter), driven by an
    explicit parameter set — the parity oracle for ``augment_batch``."""
    img = img_u8.astype(jnp.bfloat16) / 255.0
    img = jnp.where(h, img[:, ::-1], img)
    img = jnp.where(v, img[::-1], img)
    img = _rot90_k(img, k)
    img = _adjust_brightness(img, fb.astype(img.dtype))
    img = _adjust_contrast(img, fc.astype(img.dtype))
    img = _adjust_saturation(img, fs.astype(img.dtype))
    img = _adjust_hue(img, fh)
    return jnp.clip(img, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("training",))
def preprocess_batch(rng, imgs_u8, training: bool = True):
    """uint8 (B,224,224,3) → normalized float32 (B,224,224,3).

    Training: random augmentation per example via the fused batched path;
    eval: normalize only (``src/main.py:417-431``)."""
    if training:
        params = sample_augment_params(rng, imgs_u8.shape[0])
        return augment_batch(params, imgs_u8)
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
    sampling ONE parameter set and applying it to every level's batch
    (``augment_batch`` is deterministic given the params)."""
    levels = sorted(imgs_by_level)
    if not training:
        return {lvl: normalize(imgs_by_level[lvl]) for lvl in levels}
    b = imgs_by_level[levels[0]].shape[0]
    params = sample_augment_params(rng, b)
    return {lvl: augment_batch(params, imgs_by_level[lvl]) for lvl in levels}


def _simclr_view_one_with_params(crop_rng, img_u8, out_size: int,
                                 h, jp, gp, fb, fc, fs, fh):
    """Reference per-example SimCLR view chain
    (``src/models/simclr.py:57-66``) driven by explicit color/flip
    parameters — the parity oracle for the fused batched view path.
    Returns the UNNORMALIZED [0,1] view."""
    img = img_u8.astype(jnp.bfloat16) / 255.0
    img = random_resized_crop(crop_rng, img, out_size)
    img = jnp.where(h, img[:, ::-1], img)
    j = _adjust_brightness(img, fb.astype(img.dtype))
    j = _adjust_contrast(j, fc.astype(img.dtype))
    j = _adjust_saturation(j, fs.astype(img.dtype))
    j = _adjust_hue(j, fh)
    j = jnp.clip(j, 0.0, 1.0)
    img = jnp.where(jp, j, img)
    img = jnp.where(gp, _grayscale(img), img)
    return img


def sample_simclr_view_params(rng, b: int) -> dict:
    """Per-example draws for one SimCLR view batch: hflip@0.5, jitter@0.8
    with ColorJitter(0.4,0.4,0.4,0.1) factors, grayscale@0.2."""
    kh, kjp, kgp, kb, kc, ks, khue = jax.random.split(rng, 7)
    return {
        "h": jax.random.bernoulli(kh, shape=(b,)),
        "jp": jax.random.bernoulli(kjp, 0.8, shape=(b,)),
        "gp": jax.random.bernoulli(kgp, 0.2, shape=(b,)),
        "fb": jax.random.uniform(kb, (b,), minval=0.6, maxval=1.4),
        "fc": jax.random.uniform(kc, (b,), minval=0.6, maxval=1.4),
        "fs": jax.random.uniform(ks, (b,), minval=0.6, maxval=1.4),
        "fh": jax.random.uniform(khue, (b,), minval=-0.1, maxval=0.1),
    }


def _apply_color_affine(m, bias, x, dtype=jnp.bfloat16):
    """(B,3,3) matrix + (B,) or (B,3) bias applied per pixel, in ``dtype``."""
    md = m.astype(dtype)
    b2 = bias.astype(dtype)
    if b2.ndim == 1:
        b2 = b2[:, None]
    r, g, b3 = x[..., 0], x[..., 1], x[..., 2]
    return jnp.stack(
        [
            md[:, d, 0, None, None] * r
            + md[:, d, 1, None, None] * g
            + md[:, d, 2, None, None] * b3
            + b2[:, d % b2.shape[1], None, None]
            for d in range(3)
        ],
        axis=-1,
    )


def simclr_view_batch(crop_rngs, params: dict, imgs_u8, out_size: int):
    """Fused batched SimCLR view: separable-MATMUL crop with the hflip
    folded into the x-interpolation matrix, then TWO fused color passes —
    (jitter-affine → clip) and ((grayscale∘normalize)-affine) — instead
    of the ~25-pass per-example chain. Parity-tested against
    ``_simclr_view_one_with_params`` + normalize.

    The contrast mean is computed straight from the interpolation
    matrices (``mean = (Σ_o wy)·img·(Σ_p wx) / out²``; flips preserve
    it), so the cropped view has no read-back barrier between the crop
    matmuls and the color passes — round-4 v5e: the two-view augment
    went 50 ms (gather path) → 18 ms (matmul crop) → ~10 ms (folded
    flip + matrix mean) at B=512."""
    b, H, W = imgs_u8.shape[0], imgs_u8.shape[1], imgs_u8.shape[2]
    x8 = imgs_u8.astype(jnp.bfloat16) / 255.0
    y0, x0, hh, ww = jax.vmap(
        lambda r: _sample_crop_box(r, H, W)
    )(crop_rngs)
    wy = jax.vmap(_interp_matrix, in_axes=(0, 0, None, None))(
        y0, hh, H, out_size
    )  # (B, out, H) f32
    wx = jax.vmap(_interp_matrix, in_axes=(0, 0, None, None))(
        x0, ww, W, out_size
    )  # (B, out, W) f32
    # horizontal flip of the output == reversing wx's output rows
    wx = jnp.where(params["h"][:, None, None], wx[:, ::-1, :], wx)

    # contrast mean of the cropped/flipped view, from the matrices alone
    u = jnp.sum(wy, axis=1)  # (B, H)
    v = jnp.sum(wx, axis=1)  # (B, W)
    m0 = jnp.einsum(
        "bh,bhwc,bw->bc", u, x8.astype(jnp.float32), v,
        preferred_element_type=jnp.float32,
    ).mean(axis=1) / (out_size * out_size)

    wy16, wx16 = wy.astype(jnp.bfloat16), wx.astype(jnp.bfloat16)
    tmp = jnp.einsum("boh,bhwc->bowc", wy16, x8,
                     preferred_element_type=jnp.float32)
    x = jnp.einsum("bpw,bowc->bopc", wx16, tmp.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # pass 1: jitter-or-identity affine, then clip (the reference chain
    # clips only the jittered branch, but the plain branch lives in [0,1]
    # already — a convex bilinear blend of [0,1] pixels — so one shared
    # clip is semantics-preserving)
    mj, bj = _jitter_affine(params, m0)
    jp = params["jp"]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
    m1 = jnp.where(jp[:, None, None], mj, eye)
    b1 = jnp.where(jp, bj, 0.0)
    x = jnp.clip(_apply_color_affine(m1, b1, x), 0.0, 1.0)

    # pass 2: (grayscale-or-identity) folded into ImageNet normalization
    w_luma = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    gmat = jnp.broadcast_to(w_luma[None, None, :], (b, 3, 3))
    m2 = jnp.where(params["gp"][:, None, None], gmat, eye)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    m2 = m2 / std[None, :, None]
    e = jnp.broadcast_to((-mean / std)[None, :], (b, 3))
    # emit bf16: the SimCLR encoder computes in bf16 and would cast the
    # first conv's input anyway — emitting f32 costs a 308 MB/view HBM
    # round-trip for precision the consumer immediately discards. The
    # affine itself accumulates in f32 (see _apply_color_affine callers'
    # coordinate-math note); only the final store narrows.
    return _apply_color_affine(m2, e, x, dtype=jnp.float32).astype(
        jnp.bfloat16
    )


@functools.partial(jax.jit, static_argnames=("out_size",))
def simclr_two_views(rng, imgs_u8, out_size: int = 224):
    """uint8 (B,H,W,3) → two independently augmented normalized views
    ((B,out,out,3) float32 each) of every example."""
    B = imgs_u8.shape[0]
    k1, k2, kp1, kp2 = jax.random.split(rng, 4)
    crop1 = jax.random.split(k1, B)
    crop2 = jax.random.split(k2, B)
    v1 = simclr_view_batch(crop1, sample_simclr_view_params(kp1, B),
                           imgs_u8, out_size)
    v2 = simclr_view_batch(crop2, sample_simclr_view_params(kp2, B),
                           imgs_u8, out_size)
    return v1, v2
