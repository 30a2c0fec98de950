"""Fused int8 ResNet stage-1 kernel: both residual blocks, one HBM pass.

The VERDICT round-1 kernel north star — fused conv(+BN-folded
bias)+ReLU(+residual) blocks for the 64-channel stage
(reference hot loop ``/root/reference/src/main.py:867-873``). At C=64 a
(B, 56, 56, 64) int8 activation plane is 200 KB per image, so a whole
image's stage-1 — FOUR 3×3 convs, two requant epilogues, two residual
adds — fits in VMEM at once. XLA runs the stage as four conv customs
with int8 HBM tensors between them (~8 plane round-trips); this kernel
reads the input plane once and writes the output plane once.

Each 3×3 conv is 9 shifted (56·56, 64)×(64, 64) MXU contractions over a
zero-padded copy (int8 zero == real 0.0 under symmetric quantization, so
padding in the quantized domain is exact — ``models/quantized.py``).

Scales/biases mirror :func:`..models.quantized.quant_forward` stage-1
semantics exactly; parity is pinned by
``tests/test_ops.py::test_fused_stage1_matches_quant_forward``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_H = 56  # stage-1 plane edge (224-px input: 112 after stem, 56 after pool)
_C = 64


def _conv3x3(xpad, kernels, i):
    """(58, 58, 64) int8 → (56, 56, 64) int32 via 9 shifted contractions."""
    acc = jnp.zeros((_H, _H, _C), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            a = lax.slice(xpad, (dy, dx, 0), (dy + _H, dx + _H, _C))
            acc = acc + lax.dot_general(
                a, kernels[i, dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc


def _pad1(x):
    """Zero-pad (56, 56, 64) → (58, 58, 64) (q=0 is exact real zero)."""
    z_row = jnp.zeros((1, _H, _C), x.dtype)
    x = jnp.concatenate([z_row, x, z_row], axis=0)
    z_col = jnp.zeros((_H + 2, 1, _C), x.dtype)
    return jnp.concatenate([z_col, x, z_col], axis=1)


def _requant(y32, msc, bias, s_out, residual=None):
    y = y32.astype(jnp.float32) * msc + bias
    if residual is not None:
        y = y + residual
    y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y / s_out), -127.0, 127.0).astype(jnp.int8)


def _kernel(x_ref, k_ref, msc_ref, bias_ref, scal_ref, out_ref):
    """One image per grid step.

    scal_ref (SMEM, (5, 1) f32): [s_x, s_y1_b0, s_o_b0, s_y1_b1, s_o_b1].
    msc_ref (4, 64): per-conv per-channel dequant scale (s_in · wscale);
    the caller pre-multiplies the input-side activation scale in.
    """
    x = x_ref[0]
    s_x = scal_ref[0, 0]
    for blk in range(2):
        c1, c2 = 2 * blk, 2 * blk + 1
        s_y1 = scal_ref[1 + 2 * blk, 0]
        s_o = scal_ref[2 + 2 * blk, 0]
        y32 = _conv3x3(_pad1(x), k_ref, c1)
        y1 = _requant(y32, msc_ref[c1], bias_ref[c1], s_y1)
        z32 = _conv3x3(_pad1(y1), k_ref, c2)
        res = x.astype(jnp.float32) * s_x
        x = _requant(z32, msc_ref[c2], bias_ref[c2], s_o, residual=res)
        s_x = s_o
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stage1_int8(
    xq, kernels, mscales, biases, scalars, interpret: bool = False
):
    """Run both stage-1 residual blocks fused.

    Args:
        xq: (B, 56, 56, 64) int8 (stage-1 input, scale ``scalars[0]``).
        kernels: (4, 3, 3, 64, 64) int8 — s1b0c1, s1b0c2, s1b1c1, s1b1c2.
        mscales: (4, 64) f32 — input-activation-scale × per-channel weight
            scale for each conv (c1 scales use the BLOCK INPUT's activation
            scale; c2 scales use that block's y1 scale).
        biases: (4, 64) f32 — BN-folded biases.
        scalars: (5,) f32 — [s_x, s_y1_b0, s_o_b0, s_y1_b1, s_o_b1].
    Returns:
        (B, 56, 56, 64) int8 at activation scale ``scalars[4]``.
    """
    b = xq.shape[0]
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, _H, _H, _C), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 3, 3, _C, _C), lambda i: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((4, _C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _H, _H, _C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, _H, _H, _C), jnp.int8),
        interpret=interpret,
    )(xq, kernels, mscales, biases, scalars.reshape(5, 1))


def stage1_params_from_qtree(qp: dict):
    """Package ``models.quantized`` stage-1 params for the fused kernel.

    Returns (kernels, mscales, biases, scalars) with the activation-scale
    pre-multiplication :func:`fused_stage1_int8` expects.
    """
    qk, ws, bs, sc = qp["qkernels"], qp["wscales"], qp["biases"], qp["ascales"]
    names = ["s1b0c1", "s1b0c2", "s1b1c1", "s1b1c2"]
    kernels = jnp.stack(
        # HWIO (3, 3, 64, 64) → (3, 3, I, O); contraction uses [dy, dx] →
        # (I, O) which matches dot_general's (64in, 64out)
        [qk[n] for n in names]
    )
    s_x = sc["p0"]
    s_y1_b0, s_o_b0 = sc["s1b0y1"], sc["s1b0o"]
    s_y1_b1, s_o_b1 = sc["s1b1y1"], sc["s1b1o"]
    mscales = jnp.stack([
        s_x * ws["s1b0c1"],
        s_y1_b0 * ws["s1b0c2"],
        s_o_b0 * ws["s1b1c1"],
        s_y1_b1 * ws["s1b1c2"],
    ])
    biases = jnp.stack([bs[n] for n in names])
    scalars = jnp.stack([s_x, s_y1_b0, s_o_b0, s_y1_b1, s_o_b1])
    return kernels, mscales, biases, scalars
