#!/usr/bin/env python
"""Per-stage int8 roofline for the w8a8 ResNet18 deployment path.

Round-3 left a gap unexplained: the stage-1 conv microbench showed 1.76x
int8-over-bf16 but the end-to-end path only 1.40x. This script times each
segment of ``models/quantized.quant_forward`` (stem, maxpool, stages 1-4,
GAP) with the fetch-forced scan-differencing methodology (see
scripts/ntxent_bench.py — ``block_until_ready`` lies under the tunnel)
and compares each against its speed-of-light bound from analytic HBM
bytes and MXU FLOPs (v5e: ~394 TOPS int8, ~197 TFLOPS bf16, ~820 GB/s).

Each timed body carries a data dependency through a cheap ``max`` over
the segment output (one extra int8 read of the output — included in the
analytic bytes), so XLA can neither hoist nor dead-code the segment.

Usage: python scripts/int8_roofline.py [--batch 512] [--out PATH]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 820.0
INT8_TOPS = 394.0
BF16_TFLOPS = 197.0


def time_segment(fn, x, iters: int = 20, reps: int = 3) -> float:
    """Per-iteration seconds of ``fn(x)`` via scan-length differencing."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(length):
        @jax.jit
        def steps(x0):
            def body(carry, _):
                xi = x0 + (carry * 0).astype(x0.dtype)
                y = fn(xi)
                return jnp.max(y).astype(jnp.float32), None
            out, _ = lax.scan(body, jnp.float32(0), None, length=length)
            return out
        return steps

    s1, s2 = make(iters), make(2 * iters)
    for _ in range(2):
        float(s1(x))
        float(s2(x))
    t1 = min(
        _timed(lambda: float(s1(x))) for _ in range(reps)
    )
    t2 = min(
        _timed(lambda: float(s2(x))) for _ in range(reps)
    )
    return max((t2 - t1) / iters, 0.0)


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default="docs/proofs/int8_roofline.json")
    a = ap.parse_args()
    B = a.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        _convq,
        _requant,
        fold_resnet18_inference,
        folded_forward_inference,
        quant_forward,
        quantize_resnet18,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )

    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (256, 224, 224, 3), dtype=np.uint8)
    q = quantize_resnet18(dict(variables), [calib])
    qp = q.tree()
    fp = fold_resnet18_inference(dict(variables), input_hw=(224, 224))

    def dev_i8(shape):
        return jax.device_put(
            rng.integers(-127, 128, shape, np.int32).astype(np.int8)
        )

    rows = {}

    def add(name, fn, x, hbm_mb, tera_ops, int8_ops=True):
        dt = time_segment(fn, x)
        peak = INT8_TOPS if int8_ops else BF16_TFLOPS
        sol_ms = max(hbm_mb / 1024 / HBM_GBPS, tera_ops / peak) * 1000
        rows[name] = {
            "ms": round(dt * 1000, 3),
            "sol_ms": round(sol_ms, 3),
            "hbm_mb": round(hbm_mb, 1),
            "tops": round(tera_ops, 4),
            "efficiency": round(sol_ms / (dt * 1000 + 1e-9), 3),
        }
        print(f"{name}: {rows[name]}", flush=True)

    px = lambda h, c: B * h * h * c / 1e6  # Mpx worth of elements

    # stem: pre-s2d int8 input (the production gather layout) → conv 4x4
    # + fused requant. bytes: in (112²·12 i8) + out (112²·64 i8) + dep max
    sc, qk, ws, bs = qp["ascales"], qp["qkernels"], qp["wscales"], qp["biases"]
    x_s2d = dev_i8((B, 112, 112, 12))

    def stem(x):
        y32 = _convq(x, qk["stem"], 1, [(2, 1), (2, 1)])
        return _requant(y32, ws["stem"], bs["stem"] + qp["stem_bias_map"],
                        sc["p0"])

    flops_stem = B * 112 * 112 * 64 * (12 * 16) * 2 / 1e12
    add("stem_conv", stem, x_s2d,
        (px(112, 12) + 2 * px(112, 64)), flops_stem)

    x_stem = dev_i8((B, 112, 112, 64))
    def pool(x):
        return lax.reduce_window(
            x, jnp.int8(-128), lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
    add("maxpool", pool, x_stem, px(112, 64) + 2 * px(56, 64), 0.0)

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        _STAGES,
    )

    def make_stage(i):
        def run(x):
            s_x = sc["p0"] if i == 1 else sc[f"s{i-1}b1o"]
            for j in range(dict(_STAGES)[i]):
                strides = 2 if i > 1 and j == 0 else 1
                s_y1 = sc[f"s{i}b{j}y1"]
                s_o = sc[f"s{i}b{j}o"]
                y32 = _convq(x, qk[f"s{i}b{j}c1"], strides, [(1, 1), (1, 1)])
                yq = _requant(y32, s_x * ws[f"s{i}b{j}c1"],
                              bs[f"s{i}b{j}c1"], s_y1)
                y32 = _convq(yq, qk[f"s{i}b{j}c2"], 1, [(1, 1), (1, 1)])
                if f"s{i}b{j}down" in qk:
                    r32 = _convq(x, qk[f"s{i}b{j}down"], strides,
                                 [(0, 0), (0, 0)])
                    res = (r32.astype(jnp.float32)
                           * (s_x * ws[f"s{i}b{j}down"])
                           + bs[f"s{i}b{j}down"])
                else:
                    res = x.astype(jnp.float32) * s_x
                x = _requant(y32, s_y1 * ws[f"s{i}b{j}c2"],
                             bs[f"s{i}b{j}c2"], s_o, residual_f32=res)
                s_x = s_o
            return x
        return run

    stage_geom = {1: (56, 64), 2: (28, 128), 3: (14, 256), 4: (7, 512)}
    for i in (1, 2, 3, 4):
        h, c = stage_geom[i]
        hin = h if i == 1 else h * 2
        cin = c if i == 1 else c // 2
        # per stage: 4 convs (2 blocks x 2) + 1 downsample conv (i>1)
        fl = 4 * B * h * h * c * (c * 9) * 2 / 1e12
        if i > 1:
            fl = (2 * B * h * h * c * (cin * 9) * 2
                  + 2 * B * h * h * c * (c * 9) * 2
                  + B * h * h * c * cin * 2) / 1e12
        # bytes: stage input + ~5 intermediate int8 tensors + dep read
        mb = px(hin, cin) + 6 * px(h, c)
        add(f"stage{i}", make_stage(i), dev_i8((B, hin, hin, cin)), mb, fl)

    x4 = dev_i8((B, 7, 7, 512))
    add("gap", lambda x: jnp.mean(x.astype(jnp.float32) * sc["s4b1o"],
                                  axis=(1, 2)),
        x4, px(7, 512), 0.0)

    # full paths
    u8 = jax.device_put(
        rng.integers(0, 256, (B, 224, 224, 3), np.uint8)
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
        space_to_depth_u8,
    )

    u8_s2d = jax.device_put(space_to_depth_u8(np.asarray(u8)))
    add("full_int8", lambda x: quant_forward(qp, x, with_fc=False), u8_s2d,
        0.0, 0.0)
    add("full_bf16_folded",
        lambda x: folded_forward_inference(fp, x, with_fc=False), u8,
        0.0, 0.0, int8_ops=False)

    total_segments = sum(
        rows[k]["ms"] for k in rows
        if k not in ("full_int8", "full_bf16_folded")
    )
    report = {
        "metric": "int8_roofline_per_stage_ms",
        "batch": B,
        "assumptions": {"hbm_gbps": HBM_GBPS, "int8_tops": INT8_TOPS,
                        "bf16_tflops": BF16_TFLOPS},
        "rows": rows,
        "segments_sum_ms": round(total_segments, 2),
        "patches_per_sec_int8": round(
            B / (rows["full_int8"]["ms"] / 1000), 1
        ) if rows["full_int8"]["ms"] else None,
    }
    print(json.dumps(report))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
