"""Fused ResNet stem Pallas kernel: conv7x7/2 + BN + ReLU + maxpool3x3/2.

Round-1 profiling (docs/PERFORMANCE.md) showed the stem costing 5.9 ms of
the 15.8 ms ResNet18 batch — HBM-bound, not FLOP-bound: XLA materializes
the (B, 112, 112, 64) conv output (822 MB at B=512), re-reads it for
BN/ReLU, and again for the maxpool. This kernel keeps the whole stem in
VMEM per image and writes only the (B, 56, 56, 64) pooled output:

- the 7x7 stride-2 conv is reformulated as a 4x4 stride-1 conv over a
  2x2 space-to-depth input (the MLPerf ResNet trick) so the im2col matmul
  has K = 4*4*12 = 192 instead of 147 with better tiling;
- ImageNet normalization is an affine per channel and conv is linear, so
  the normalize FOLDS into the conv weights (x/255 - mean)/std = a*x + b:
  W' = W*a per input channel, bias' += conv(b*ones). Padding stays exact
  because the input is zero-padded in *normalized* space on the host side
  of the fold (see ``stem_space_to_depth``);
- inference BatchNorm is affine per output channel and folds likewise;
- ReLU and the overlapping 3x3/2 maxpool run on the VPU before the single
  HBM write.

Accelerates the reference hot loop ``src/main.py:867-873`` (feature
extraction) and every inference path. Parity with the XLA stem is tested;
off-TPU the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ImageNet constants (reference src/main.py:417-425 normalize)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_NEG = -3e38  # -inf stand-in for maxpool padding (f32 finite)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def fold_stem_params(
    conv_kernel,  # (7, 7, 3, 64) HWIO
    bn_scale,
    bn_bias,
    bn_mean,
    bn_var,
    eps: float = 1e-5,
):
    """Fold inference BatchNorm into (w2, bias).

    The input normalization itself happens in :func:`stem_space_to_depth`
    (it must precede the zero padding to keep borders exact), so only the
    BN affine folds into the weights here.

    Returns:
        w2: (192, 64) the space-to-depth 4x4x12 conv kernel, flattened in
            (KY, KX, dy, dx, c) tap order to match ``stem_space_to_depth``.
        bias: (64,) folded BN shift.
    """
    w = jnp.asarray(conv_kernel, jnp.float32)

    inv = jax.lax.rsqrt(jnp.asarray(bn_var, jnp.float32) + eps)
    gamma = jnp.asarray(bn_scale, jnp.float32) * inv
    w = w * gamma[None, None, None, :]
    bias = jnp.asarray(bn_bias, jnp.float32) - jnp.asarray(
        bn_mean, jnp.float32
    ) * gamma

    # scatter the 7x7 kernel into the 4x4 space-to-depth layout:
    # tap (ky, kx) -> (KY, dy, KX, dx) with ky = 2*KY + dy
    w2 = jnp.zeros((4, 4, 2, 2, 3, 64), jnp.float32)
    for ky in range(7):
        for kx in range(7):
            w2 = w2.at[ky // 2, kx // 2, ky % 2, kx % 2].set(w[ky, kx])
    # (KY, KX, dy, dx, c, o) -> KX-major groups of (KY*12 + dydxc, o):
    # the kernel accumulates one matmul per KX group (K = 48)
    w2 = w2.reshape(4, 4, 12, 64).transpose(1, 0, 2, 3)  # (KX, KY, 12, 64)
    return w2.reshape(4, 48, 64), bias


def stem_space_to_depth(imgs_u8, dtype=jnp.float32):
    """(B, 224, 224, 3) uint8 -> (B, 115, 115, 12) normalized + zero-padded
    space-to-depth input for the fused kernel.

    The affine u8->normalized map is x*a + b; the *b* half cannot fold into
    conv weights without breaking zero padding, so it is applied here (one
    cheap fused XLA pass) and padding happens after — i.e. in normalized
    space, exactly like the reference pipeline.

    The affine is applied on a (B*224, 672) view: with channels-last C=3 in
    the lane dimension the VPU wastes 125/128 lanes (measured 2.5 ms per
    512-batch); merging W and C fills the lanes (constants tile with
    period 3 over 672 columns).
    """
    a = jnp.tile(jnp.asarray((1.0 / 255.0) / IMAGENET_STD, dtype), 224)
    b = jnp.tile(jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, dtype), 224)
    B = imgs_u8.shape[0]
    flat = imgs_u8.reshape(B, 224, 224 * 3)
    x = (flat.astype(dtype) * a + b).reshape(B, 224, 224, 3)
    # conv pad 3 on each side -> 230; 230/2 = 115 space-to-depth cells
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    x = x.reshape(B, 115, 2, 115, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 115, 115, 12)


_POOL_ROWS = 7  # pool rows per grid step (56 / 7 = 8 row blocks / image)


def _stem_kernel(in2_ref, w2_ref, bias_ref, out_ref, *, mm_dtype):
    r = pl.program_id(1)
    pb = _POOL_ROWS
    cc = 2 * pb + 1  # conv rows this block (incl. top halo)
    # first conv row = 2*(pb*r) - 1, clamped; row -1 is handled as pad below
    s = jnp.maximum(0, 2 * pb * r - 1)

    # im2col of the 4x4 stride-1 conv over the block's conv rows, one
    # K=48 matmul per KX group (4 live taps at a time: lane dim 12 pads to
    # 128 in vregs, so materializing all 16 taps would blow VMEM). Taps
    # load DIRECTLY from the VMEM ref (fresh canonical-layout vectors) —
    # slicing one loaded vector gives per-tap vreg offsets that Mosaic
    # cannot concatenate on non-concat dims; in2 stays f32 because bf16
    # tile packing (16, 128) gives odd-row taps un-concatenable sublane
    # offsets. The bf16 cast happens per patch group, feeding the MXU.
    y = jnp.zeros((cc * 112, 64), jnp.float32)
    for kx in range(4):
        taps = [
            in2_ref[0, pl.ds(s + ky, cc), kx : kx + 112, :]
            for ky in range(4)
        ]
        p = jnp.concatenate(taps, axis=-1)  # (cc, 112, 48) f32
        y = y + jax.lax.dot_general(
            p.reshape(cc * 112, 48).astype(mm_dtype),
            w2_ref[kx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = jnp.maximum(y + bias_ref[:], 0.0).reshape(cc, 112, 64)

    # rows for pooling: P[j] = conv row (2*pb*r - 1 + j). The first block's
    # P[0] is the maxpool pad row — ZERO padding is exact here because the
    # pooled values are post-ReLU (>= 0), so max(0, a, b) == max(a, b).
    # Mosaic cannot legalize a scalar-cond select over a big vector, so the
    # r == 0 shift is an arithmetic blend instead of lax.cond.
    zero_row = jnp.zeros((1, 112, 64), jnp.float32)
    y_shift = jnp.concatenate([zero_row, y[: cc - 1]], axis=0)
    m = (r == 0).astype(jnp.float32)
    p_rows = m * y_shift + (1.0 - m) * y  # (cc, 112, 64)

    # maxpool 3x3 stride 2: pool row q = max(P[2q], P[2q+1], P[2q+2]);
    # even-index subsampling via the reshape trick (no strided slicing)
    rmax = jnp.maximum(
        jnp.maximum(p_rows[0 : cc - 2], p_rows[1 : cc - 1]), p_rows[2:cc]
    )  # (2*pb - 1, 112, 64)
    rows = jnp.concatenate([rmax, zero_row], axis=0).reshape(pb, 2, 112, 64)[
        :, 0
    ]  # rows 0, 2, ... of rmax -> (pb, 112, 64)

    cp = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)))  # zero col pad (post-ReLU)
    cmax = jnp.maximum(jnp.maximum(cp[:, 0:112], cp[:, 1:113]), cp[:, 2:114])
    out_ref[0] = cmax.reshape(pb, 56, 2, 64)[:, :, 0].astype(out_ref.dtype)


def fused_stem(in2, w2, bias, out_dtype=jnp.bfloat16,
               mm_dtype=jnp.bfloat16):
    """Run the fused stem: (B, 115, 115, 12) -> (B, 56, 56, 64).

    Args:
        in2: output of :func:`stem_space_to_depth`.
        w2, bias: output of :func:`fold_stem_params`.
        mm_dtype: matmul input dtype (bf16 for serving; f32 for exact
            parity tests).
    """
    B = in2.shape[0]
    n_row_blocks = 56 // _POOL_ROWS
    return pl.pallas_call(
        functools.partial(_stem_kernel, mm_dtype=mm_dtype),
        grid=(B, n_row_blocks),
        in_specs=[
            pl.BlockSpec((1, 115, 115, 12), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2 (4, 48, 64) resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (64,)
        ],
        out_specs=pl.BlockSpec((1, _POOL_ROWS, 56, 64),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 56, 56, 64), out_dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 112 * 112 * 192 * 64,
            bytes_accessed=B * (115 * 115 * 12 * 4 + 56 * 56 * 64 * 2),
            transcendentals=0,
        ),
    )(in2.astype(jnp.float32), w2.astype(mm_dtype), bias)


def stem_forward(imgs_u8, conv_kernel, bn_scale, bn_bias, bn_mean, bn_var,
                 eps: float = 1e-5, dtype=jnp.bfloat16):
    """End-to-end fused stem from raw uint8 images (convenience wrapper)."""
    w2, bias = fold_stem_params(conv_kernel, bn_scale, bn_bias, bn_mean,
                                bn_var, eps)
    in2 = stem_space_to_depth(imgs_u8, jnp.float32)
    return fused_stem(in2, w2, bias, out_dtype=dtype, mm_dtype=dtype)


# ---------------------------------------------------------------------------
# Hybrid stem: XLA conv (BN folded into weights) + fused bias/ReLU/pool
# ---------------------------------------------------------------------------


def _bias_relu_pool_kernel(y_ref, bnd_ref, bias_ref, out_ref):
    """One NON-overlapping block of 2*pb conv rows (+ the preceding
    boundary row via ``bnd_ref``) -> (1, pb, 56, 64): + bias, ReLU,
    maxpool 3x3 stride 2 pad 1, all in VMEM (saves the separate BN/ReLU
    and reduce_window HBM round-trips). Zero pool padding is exact
    post-ReLU. Non-overlapping input blocks keep the DMA at one pass over
    the conv output (overlapping windows would refetch whole images)."""
    pb = out_ref.shape[1]
    cc = 2 * pb + 1

    body = y_ref[0].astype(jnp.float32)  # (2*pb, 112, 64)
    prev = bnd_ref[0, 0].astype(jnp.float32)  # (1, 112, 64) row before block
    y = jnp.maximum(
        jnp.concatenate([prev, body], axis=0) + bias_ref[:], 0.0
    )  # (cc, 112, 64); y[j] = conv row (2*pb*r - 1 + j); y[0] of block 0
    # is the zero boundary row = the maxpool pad (exact post-ReLU)

    zero_row = jnp.zeros((1, 112, 64), jnp.float32)
    rmax = jnp.maximum(
        jnp.maximum(y[0 : cc - 2], y[1 : cc - 1]), y[2:cc]
    )
    rows = jnp.concatenate([rmax, zero_row], axis=0).reshape(pb, 2, 112, 64)[
        :, 0
    ]
    cp = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)))
    cmax = jnp.maximum(jnp.maximum(cp[:, 0:112], cp[:, 1:113]), cp[:, 2:114])
    out_ref[0] = cmax.reshape(pb, 56, 2, 64)[:, :, 0].astype(out_ref.dtype)


def bias_relu_pool(conv_out, bias, out_dtype=jnp.bfloat16,
                   pool_rows: int = 14):
    """Fused bias + ReLU + 3x3/2 maxpool over (B, 112, 112, 64)."""
    B = conv_out.shape[0]
    n_blocks = 56 // pool_rows
    rows_per_block = 2 * pool_rows
    # boundary rows: conv row (2*pb*r - 1) for each block; r=0 gets the
    # zero pad row (pre-bias -bias so post-bias it is exactly 0... instead
    # keep raw zeros and rely on ReLU ensuring pad <= any pooled value
    # only when bias <= 0 — NOT guaranteed, so subtract bias explicitly)
    bias = jnp.asarray(bias, jnp.float32)
    pad_row = jnp.broadcast_to(
        (-bias).astype(conv_out.dtype), (B, 1, 1, 112, 64)
    )  # + bias -> 0 pre-ReLU -> 0 post-ReLU: the exact maxpool pad
    inner = conv_out[:, rows_per_block - 1 :: rows_per_block][:, : n_blocks - 1]
    bnd = jnp.concatenate(
        [pad_row, inner[:, :, None]], axis=1
    )  # (B, n_blocks, 1, 112, 64)

    return pl.pallas_call(
        _bias_relu_pool_kernel,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, rows_per_block, 112, 64),
                         lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 112, 64), lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pool_rows, 56, 64),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 56, 56, 64), out_dtype),
        interpret=_interpret(),
    )(conv_out, bnd, jnp.asarray(bias, jnp.float32))


def stem_forward_hybrid(imgs_u8, conv_kernel, bn_scale, bn_bias, bn_mean,
                        bn_var, eps: float = 1e-5, dtype=jnp.bfloat16):
    """Production stem: lane-efficient normalize (XLA) -> conv7x7/2 with BN
    scale folded into the weights (XLA, MXU) -> fused bias/ReLU/maxpool
    (Pallas). One intermediate HBM round-trip instead of three."""
    inv = jax.lax.rsqrt(jnp.asarray(bn_var, jnp.float32) + eps)
    gamma = jnp.asarray(bn_scale, jnp.float32) * inv
    w = jnp.asarray(conv_kernel, jnp.float32) * gamma[None, None, None, :]
    bias = jnp.asarray(bn_bias, jnp.float32) - jnp.asarray(
        bn_mean, jnp.float32
    ) * gamma

    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        normalize,
    )

    x = normalize(imgs_u8, dtype)
    y = jax.lax.conv_general_dilated(
        x, w.astype(dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    return bias_relu_pool(y, bias, out_dtype=dtype)
