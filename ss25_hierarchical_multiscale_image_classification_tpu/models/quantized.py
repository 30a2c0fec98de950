"""Post-training int8 (w8a8) ResNet18 inference for TPU.

The v5e MXU runs int8 matmuls/convs at up to 2x the bf16 rate (measured on
this chip: stage-1 3x3 conv 2.24 ms bf16 -> 1.27 ms int8 per 512-batch) and
int8 activations halve the HBM traffic of the bandwidth-bound stages. This
module quantizes a trained float :class:`~..models.resnet.ResNet18Classifier`
(the reference's deployment model, ``src/models/resnet.py:57-77``) into a
pure-functional int8 forward:

- **BN folding**: every Conv+BatchNorm pair collapses into a conv with
  per-channel scale and bias (inference-only identity transform).
- **Weights**: symmetric per-output-channel int8; scales from max-abs.
- **Activations**: symmetric per-tensor int8; scales calibrated by running
  the float (folded) model over calibration batches and taking max-abs at
  every quantization point.
- **Compute**: ``lax.conv_general_dilated`` on int8 operands with
  ``preferred_element_type=int32`` (MXU int8 path); each conv's epilogue
  dequantizes (f32), adds bias (+ dequantized residual), applies ReLU and
  requantizes to int8 for the next layer — XLA fuses the epilogue into the
  conv, so every inter-layer tensor in HBM is int8.
- **Semantics**: zero padding happens in the quantized domain, where q=0 is
  exactly real 0.0 (symmetric quant), matching the float model's zero pads
  bit-for-bit in meaning; the stem input is quantized from the ImageNet-
  normalized image, so the whole graph is a drop-in for the float forward.

The head (global-average-pool + fc) stays in f32: it is <0.1% of the FLOPs
and the 512-d feature artifact of ``--extract_features`` keeps full
precision (reference ``src/main.py:805-894`` consumers).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)

_STAGES = ((1, 2), (2, 2), (3, 2), (4, 2))  # (stage index, blocks) for ResNet18
_EPS = 1e-5


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------


def _fold(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps):
    """Fold BatchNorm into the preceding conv: returns (kernel', bias')."""
    g = np.asarray(bn_scale, np.float64) / np.sqrt(
        np.asarray(bn_var, np.float64) + eps
    )
    k = np.asarray(kernel, np.float64) * g  # broadcast over output channels
    b = np.asarray(bn_bias, np.float64) - np.asarray(bn_mean, np.float64) * g
    return k.astype(np.float32), b.astype(np.float32)


def fold_batchnorm(variables: dict, eps: float = _EPS) -> dict:
    """Collapse every Conv+BN pair of a ResNet18 variable tree into
    ``{name: (kernel, bias)}`` float32 arrays (inference identity).

    Returned names: ``stem``, ``s{i}b{j}c1``, ``s{i}b{j}c2``, ``s{i}b{j}down``
    (when present) and ``fc`` as ``(kernel, bias)`` unfolded.
    """
    params, stats = variables["params"], variables["batch_stats"]
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    out["stem"] = _fold(
        params["stem_conv"]["kernel"],
        params["stem_norm"]["scale"],
        params["stem_norm"]["bias"],
        stats["stem_norm"]["mean"],
        stats["stem_norm"]["var"],
        eps,
    )
    for i, blocks in _STAGES:
        for j in range(blocks):
            name = f"stage{i}_block{j}"
            p, s = params[name], stats[name]
            out[f"s{i}b{j}c1"] = _fold(
                p["Conv_0"]["kernel"], p["BatchNorm_0"]["scale"],
                p["BatchNorm_0"]["bias"], s["BatchNorm_0"]["mean"],
                s["BatchNorm_0"]["var"], eps,
            )
            out[f"s{i}b{j}c2"] = _fold(
                p["Conv_1"]["kernel"], p["BatchNorm_1"]["scale"],
                p["BatchNorm_1"]["bias"], s["BatchNorm_1"]["mean"],
                s["BatchNorm_1"]["var"], eps,
            )
            if "downsample_conv" in p:
                out[f"s{i}b{j}down"] = _fold(
                    p["downsample_conv"]["kernel"],
                    p["downsample_norm"]["scale"],
                    p["downsample_norm"]["bias"],
                    s["downsample_norm"]["mean"],
                    s["downsample_norm"]["var"], eps,
                )
    if "fc" in params:
        out["fc"] = (
            np.asarray(params["fc"]["kernel"], np.float32),
            np.asarray(params["fc"]["bias"], np.float32),
        )
    return out


# ---------------------------------------------------------------------------
# Float forward on folded weights (calibration / reference path)
# ---------------------------------------------------------------------------


def _convf(x, kernel, bias, strides, pad):
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = lax.conv_general_dilated(
        x, kernel, (strides, strides), pad, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return y + bias


def _normalize_f32(imgs_u8):
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (imgs_u8.astype(jnp.float32) - mean) / std


def folded_forward(folded: dict, imgs_u8, with_fc: bool = True,
                   collect: bool = False):
    """Float forward on the BN-folded weights.

    With ``collect=True`` also returns ``{point: max_abs}`` at every
    activation-quantization point (the calibration observables).
    """
    obs: dict[str, jnp.ndarray] = {}

    def note(name, x):
        if collect:
            obs[name] = jnp.max(jnp.abs(x)).astype(jnp.float32)
        return x

    x = note("in", _normalize_f32(imgs_u8))
    x = _convf(x, *folded["stem"], 2, [(3, 3), (3, 3)])
    x = jax.nn.relu(x)
    x = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    x = note("p0", x)
    for i, blocks in _STAGES:
        for j in range(blocks):
            strides = 2 if i > 1 and j == 0 else 1
            res = x
            y = _convf(x, *folded[f"s{i}b{j}c1"], strides, [(1, 1), (1, 1)])
            y = note(f"s{i}b{j}y1", jax.nn.relu(y))
            y = _convf(y, *folded[f"s{i}b{j}c2"], 1, [(1, 1), (1, 1)])
            if f"s{i}b{j}down" in folded:
                res = _convf(res, *folded[f"s{i}b{j}down"], strides,
                             [(0, 0), (0, 0)])
            x = note(f"s{i}b{j}o", jax.nn.relu(y + res))
    feats = jnp.mean(x, axis=(1, 2))
    if with_fc and "fc" in folded:
        out = feats @ folded["fc"][0] + folded["fc"][1]
    else:
        out = feats
    return (out, obs) if collect else out


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class QuantizedResNet18:
    """int8 weights + scales; ``forward``/``features`` are jittable."""

    qkernels: dict[str, jnp.ndarray]          # int8 HWIO
    wscales: dict[str, jnp.ndarray]           # f32 per output channel
    biases: dict[str, jnp.ndarray]            # f32 per output channel
    ascales: dict[str, jnp.ndarray]           # f32 scalars per quant point
    fc: tuple[jnp.ndarray, jnp.ndarray] | None
    stem_bias_map: jnp.ndarray | None = None  # f32 (H/2, W/2, C) normalize fold

    def tree(self) -> dict[str, Any]:
        return {
            "qkernels": self.qkernels, "wscales": self.wscales,
            "biases": self.biases, "ascales": self.ascales, "fc": self.fc,
            "stem_bias_map": self.stem_bias_map,
        }

    def forward(self, imgs_u8):
        return quant_forward(self.tree(), imgs_u8, with_fc=True)

    def features(self, imgs_u8):
        return quant_forward(self.tree(), imgs_u8, with_fc=False)


def _quantize_weights(folded: dict) -> tuple[dict, dict, dict]:
    qk, ws, bs = {}, {}, {}
    for name, (kernel, bias) in folded.items():
        if name == "fc":
            continue
        k = np.asarray(kernel, np.float32)
        s = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
        s = np.maximum(s, 1e-12).astype(np.float32)
        qk[name] = jnp.asarray(
            np.clip(np.rint(k / s), -127, 127).astype(np.int8)
        )
        ws[name] = jnp.asarray(s)
        bs[name] = jnp.asarray(bias)
    return qk, ws, bs


def calibrate(folded: dict, calib_batches) -> dict[str, jnp.ndarray]:
    """Max-abs activation scales from float passes over ``calib_batches``
    (an iterable of uint8 (B,H,W,3) arrays)."""
    run = jax.jit(
        lambda b: folded_forward(folded, b, with_fc=False, collect=True)[1]
    )
    maxes: dict[str, np.ndarray] | None = None
    for batch in calib_batches:
        o = jax.device_get(run(jnp.asarray(batch)))
        if maxes is None:
            maxes = {k: np.asarray(v) for k, v in o.items()}
        else:
            maxes = {k: np.maximum(maxes[k], np.asarray(v)) for k, v in o.items()}
    if maxes is None:
        raise ValueError("calibrate() needs at least one batch")
    return {
        k: jnp.asarray(max(float(v) / 127.0, 1e-12), jnp.float32)
        for k, v in maxes.items()
    }


def _fold_normalize_into_stem(
    folded: dict, input_hw: tuple[int, int] = (224, 224)
) -> jnp.ndarray:
    """Fold the ImageNet normalize into the stem conv so the int8 path
    consumes raw ``u8 - 128`` pixels with NO separate normalize+quantize
    pass (measured 4.6 ms → the whole u8→f32→round→int8 sweep disappears).

    normalized = (u8 - mean)/std = (t + 128 - mean)/std with t = u8 - 128
    exactly representable in int8. The 1/std per-input-channel factor folds
    into the kernel; the (128 - mean)/std offset becomes a per-position
    bias map A (f32, one conv over a constant plane) that is exact at the
    borders where the float model's zero padding contributes nothing.

    Mutates ``folded['stem']`` (kernel /= std) and returns A with shape
    (H_out, W_out, C_out).
    """
    kernel, _bias = folded["stem"]
    std = (np.asarray(IMAGENET_STD, np.float64) * 255.0).reshape(1, 1, 3, 1)
    mean = np.asarray(IMAGENET_MEAN, np.float64) * 255.0
    kernel_f = (np.asarray(kernel, np.float64) / std).astype(np.float32)
    folded["stem"] = (kernel_f, folded["stem"][1])

    # A[y, x, o] = sum over in-bounds taps of kernel_f * (128 - mean_c):
    # one f32 conv of the constant plane with the folded kernel.
    h, w = input_hw
    plane = np.broadcast_to(
        (128.0 - mean).astype(np.float32), (1, h, w, 3)
    )
    dn = lax.conv_dimension_numbers(
        plane.shape, kernel_f.shape, ("NHWC", "HWIO", "NHWC")
    )
    a = lax.conv_general_dilated(
        jnp.asarray(plane), jnp.asarray(kernel_f), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    )
    return a[0]  # (H/2, W/2, C_out)


def _stem_kernel_s2d(kernel_f: np.ndarray) -> np.ndarray:
    """Rearrange the (7,7,3,C) stem kernel for a space-to-depth input.

    With s(Y,X,(r*2+rx)*3+c) = in(2Y+r, 2X+rx, c), the 7×7/stride-2 conv is
    exactly a 4×4/stride-1 conv over the (H/2, W/2, 12) plane with padding
    (2,1): zero-pad the kernel to 8×8 at the front (taps −4..3), then tap
    (2q+r − 4) maps to s2d kernel position q, channel slot (r*2+rx)*3+c.
    C_in=12 instead of 3 quadruples the MXU lane occupancy of the im2col
    (measured 2.81 → 1.92 ms per 512-batch on v5e).
    """
    k8 = np.zeros((8, 8) + kernel_f.shape[2:], kernel_f.dtype)
    k8[1:, 1:] = kernel_f
    out = np.zeros((4, 4, 12, kernel_f.shape[3]), kernel_f.dtype)
    for qy in range(4):
        for qx in range(4):
            for r in range(2):
                for rx in range(2):
                    s = (r * 2 + rx) * 3
                    out[qy, qx, s : s + 3] = k8[2 * qy + r, 2 * qx + rx]
    return out


def fold_resnet18_inference(
    variables: dict,
    input_hw: tuple[int, int] = (224, 224),
    stem_s2d: bool = False,
    dtype=jnp.bfloat16,
) -> dict:
    """Float (bf16) inference-folded weights: BN folded into the convs,
    ImageNet normalize folded into the stem, optional space-to-depth stem.

    The same inference-identity transforms as the int8 path, minus the
    quantization: the jitted forward consumes raw uint8 batches with no
    separate normalize pass and no BN elementwise stage, and every conv
    input is bf16 (u8−128 is exactly representable). This is the float
    deployment path for ``--extract_features`` (reference hot loop
    ``src/main.py:867-873``).

    ``stem_s2d`` defaults OFF here: in bf16 the explicit space-to-depth
    transpose costs a full input pass and measures slower than XLA's own
    7×7 handling (30.5k vs 32.6k patches/s/chip) — the opposite of the
    int8 path, where it wins 7%.

    Returns a pytree for :func:`folded_forward_inference`.
    """
    folded = fold_batchnorm(variables)
    bias_map = _fold_normalize_into_stem(folded, input_hw)
    if stem_s2d and (input_hw[0] % 2 or input_hw[1] % 2):
        raise ValueError("stem_s2d requires even input H/W")
    if stem_s2d:
        folded["stem"] = (
            _stem_kernel_s2d(folded["stem"][0]), folded["stem"][1]
        )
    kernels, biases, fc = {}, {}, None
    for name, (k, b) in folded.items():
        if name == "fc":
            fc = (jnp.asarray(k, dtype), jnp.asarray(b, jnp.float32))
            continue
        kernels[name] = jnp.asarray(k, dtype)
        biases[name] = jnp.asarray(b, dtype)
    # stem epilogue: BN bias + normalize-offset map in one precomputed map
    stem_map = (jnp.asarray(bias_map) + biases["stem"]).astype(dtype)
    return {
        "kernels": kernels,
        "biases": biases,
        "fc": fc,
        "stem_bias_map": stem_map,
    }


def _convb(x, kernel, strides, pad):
    """bf16 conv, bf16 output (MXU accumulates f32 internally)."""
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return lax.conv_general_dilated(
        x, kernel, (strides, strides), pad, dimension_numbers=dn,
        preferred_element_type=kernel.dtype,
    )


def folded_forward_inference(fp: dict, imgs_u8, with_fc: bool = True):
    """Jittable bf16 forward on :func:`fold_resnet18_inference` weights.

    All-bf16 data flow (the MXU still accumulates partial products in
    f32); epilogues (bias/bias-map + residual + ReLU) fuse into the convs,
    so the graph has no normalize pass and no BN elementwise stage.
    """
    k, b = fp["kernels"], fp["biases"]
    dtype = k["stem"].dtype
    t = (imgs_u8.astype(jnp.int16) - 128).astype(dtype)
    if k["stem"].shape[0] == 4:  # space-to-depth stem
        b_, h_, w_, _ = t.shape
        s = t.reshape(b_, h_ // 2, 2, w_ // 2, 2, 3)
        s = s.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h_ // 2, w_ // 2, 12)
        y = _convb(s, k["stem"], 1, [(2, 1), (2, 1)])
    else:
        y = _convb(t, k["stem"], 2, [(3, 3), (3, 3)])
    x = jax.nn.relu(y + fp["stem_bias_map"])
    x = lax.reduce_window(
        x, jnp.asarray(-jnp.inf, dtype), lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for i, blocks in _STAGES:
        for j in range(blocks):
            strides = 2 if i > 1 and j == 0 else 1
            y = _convb(x, k[f"s{i}b{j}c1"], strides, [(1, 1), (1, 1)])
            y1 = jax.nn.relu(y + b[f"s{i}b{j}c1"])
            y = _convb(y1, k[f"s{i}b{j}c2"], 1, [(1, 1), (1, 1)])
            if f"s{i}b{j}down" in k:
                res = (
                    _convb(x, k[f"s{i}b{j}down"], strides, [(0, 0), (0, 0)])
                    + b[f"s{i}b{j}down"]
                )
            else:
                res = x
            x = jax.nn.relu(y + b[f"s{i}b{j}c2"] + res)
    feats = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    if with_fc and fp["fc"] is not None:
        return feats @ fp["fc"][0].astype(jnp.float32) + fp["fc"][1]
    return feats


def quantize_resnet18(
    variables: dict, calib_batches, fold_stem_normalize: bool = True,
    stem_s2d: bool | None = None,
) -> QuantizedResNet18:
    """Fold BN, quantize weights per-channel, calibrate activation scales.

    ``stem_s2d`` additionally reformulates the stem as a space-to-depth
    4×4 conv (requires even input H/W and ``fold_stem_normalize``).
    Bit-exact vs the direct 7×7/2 conv; default (``None``) auto-enables
    it whenever the preconditions hold (measured +7% end-to-end on v5e).
    """
    return quantize_folded(
        fold_batchnorm(variables), calib_batches,
        fold_stem_normalize=fold_stem_normalize, stem_s2d=stem_s2d,
    )


def quantize_folded(
    folded: dict, calib_batches, fold_stem_normalize: bool = True,
    stem_s2d: bool | None = None,
) -> QuantizedResNet18:
    """Quantize an already BN-folded ``{name: (kernel, bias)}`` tree —
    the entry point for QAT-tuned folded weights (``train/qat.py``),
    where there is no BN form to fold from."""
    # materialize once: calibrate() consumes the iterable, and the hw probe
    # below must see the same batches (a generator would be empty by then)
    calib_batches = list(calib_batches)
    folded = {k: (np.asarray(v[0]), np.asarray(v[1])) for k, v in folded.items()}
    ascales = calibrate(folded, calib_batches)
    bias_map = None
    if fold_stem_normalize:
        hw = None
        for b in calib_batches:
            hw = (int(b.shape[1]), int(b.shape[2]))
            break
        hw = hw or (224, 224)
        bias_map = _fold_normalize_into_stem(folded, hw)
        if stem_s2d is None:
            stem_s2d = hw[0] % 2 == 0 and hw[1] % 2 == 0
        if stem_s2d:
            folded["stem"] = (
                _stem_kernel_s2d(folded["stem"][0]), folded["stem"][1]
            )
    elif stem_s2d:
        raise ValueError("stem_s2d requires fold_stem_normalize")
    qk, ws, bs = _quantize_weights(folded)
    fc = None
    if "fc" in folded:
        fc = (jnp.asarray(folded["fc"][0]), jnp.asarray(folded["fc"][1]))
    return QuantizedResNet18(qk, ws, bs, ascales, fc, stem_bias_map=bias_map)


# ---------------------------------------------------------------------------
# int8 forward
# ---------------------------------------------------------------------------


def _requant(y32, mscale, bias, s_out, residual_f32=None, relu=True):
    """Conv epilogue: int32 -> f32 dequant (+bias, +residual), ReLU,
    requantize to int8 at scale ``s_out``. XLA fuses this into the conv."""
    y = y32.astype(jnp.float32) * mscale + bias
    if residual_f32 is not None:
        y = y + residual_f32
    if relu:
        y = jax.nn.relu(y)
    q = jnp.round(y / s_out)
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8)


def _convq(xq, qkernel, strides, pad):
    dn = lax.conv_dimension_numbers(
        xq.shape, qkernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return lax.conv_general_dilated(
        xq, qkernel, (strides, strides), pad, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def quant_forward(qp: dict, imgs_u8, with_fc: bool = True):
    """Jittable int8 forward. ``qp`` is :meth:`QuantizedResNet18.tree`.

    Every inter-layer HBM tensor is int8; epilogues run in f32 and fuse.
    """
    qk, ws, bs, sc = qp["qkernels"], qp["wscales"], qp["biases"], qp["ascales"]
    s_p0 = sc["p0"]

    if qp.get("stem_bias_map") is not None:
        # normalize folded into the stem weights: the conv consumes raw
        # u8 - 128 pixels (exact int8, no quantization error on the input,
        # no separate normalize/round pass over the 224² plane); the bias
        # map restores the (128 - mean)/std offset with exact zero-pad
        # border semantics.
        t = (imgs_u8.astype(jnp.int16) - 128).astype(jnp.int8)
        if imgs_u8.shape[-1] == 12:
            # batch already in space-to-depth layout (host-side gather,
            # io/native_lib.gather_rows_s2d): no on-device transpose.
            if qk["stem"].shape[0] != 4:
                raise ValueError("pre-s2d input needs an s2d stem kernel")
            y32 = _convq(t, qk["stem"], 1, [(2, 1), (2, 1)])
        elif qk["stem"].shape[0] == 4:  # space-to-depth reformulation
            b_, h_, w_, _ = t.shape
            s = t.reshape(b_, h_ // 2, 2, w_ // 2, 2, 3)
            s = s.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h_ // 2, w_ // 2, 12)
            y32 = _convq(s, qk["stem"], 1, [(2, 1), (2, 1)])
        else:
            y32 = _convq(t, qk["stem"], 2, [(3, 3), (3, 3)])
        x = _requant(
            y32, ws["stem"], bs["stem"] + qp["stem_bias_map"], s_p0
        )
    else:
        # explicit path: normalize (u8 affine) + quantize in one fused pass
        s_in = sc["in"]
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
        std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
        xf = (imgs_u8.astype(jnp.float32) - mean) / (std * s_in)
        xq = jnp.clip(jnp.round(xf), -127.0, 127.0).astype(jnp.int8)
        y32 = _convq(xq, qk["stem"], 2, [(3, 3), (3, 3)])
        x = _requant(y32, s_in * ws["stem"], bs["stem"], s_p0)

    # maxpool on int8 (order swaps with monotone requant+relu exactly)
    x = lax.reduce_window(
        x, jnp.int8(-128), lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    s_x = s_p0

    for i, blocks in _STAGES:
        for j in range(blocks):
            strides = 2 if i > 1 and j == 0 else 1
            s_y1 = sc[f"s{i}b{j}y1"]
            s_o = sc[f"s{i}b{j}o"]
            y32 = _convq(x, qk[f"s{i}b{j}c1"], strides, [(1, 1), (1, 1)])
            yq = _requant(y32, s_x * ws[f"s{i}b{j}c1"], bs[f"s{i}b{j}c1"], s_y1)
            y32 = _convq(yq, qk[f"s{i}b{j}c2"], 1, [(1, 1), (1, 1)])
            if f"s{i}b{j}down" in qk:
                r32 = _convq(x, qk[f"s{i}b{j}down"], strides, [(0, 0), (0, 0)])
                res = (
                    r32.astype(jnp.float32) * (s_x * ws[f"s{i}b{j}down"])
                    + bs[f"s{i}b{j}down"]
                )
            else:
                res = x.astype(jnp.float32) * s_x
            x = _requant(
                y32, s_y1 * ws[f"s{i}b{j}c2"], bs[f"s{i}b{j}c2"], s_o,
                residual_f32=res,
            )
            s_x = s_o

    feats = jnp.mean(x.astype(jnp.float32) * s_x, axis=(1, 2))
    if with_fc and qp["fc"] is not None:
        return feats @ qp["fc"][0] + qp["fc"][1]
    return feats
