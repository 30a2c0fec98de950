#!/usr/bin/env python
"""Per-stage bf16 roofline for the folded inference path.

VERDICT round-4 weak #6: the bf16 path (34.8k patches/s) sits ~35% under
round-1's "perfect MXU ≈ 54k" estimate, and the fused-kernel attempts were
only made at C=64 (stem/stage-1, MXU-hostile). This script settles whether
stages 3–4 (C=256/512, MXU-full) leave room a hand-fused
conv-BN-ReLU(+residual) kernel could claim:

1. per-SEGMENT timing of ``models/quantized.folded_forward_inference``
   (cast, stem, maxpool, stages 1–4, GAP) against analytic SOL bounds
   (v5e: ~197 bf16 TFLOPS, ~820 GB/s HBM) — the int8_roofline methodology
   (fetch-forced scan differencing; ``block_until_ready`` lies under the
   tunneled backend);
2. per-OP timing of the individual stride-1/stride-2 3×3 bf16 convs at
   every stage shape — if XLA's conv customs already run near the MXU
   peak *per op*, a hand kernel fusing their epilogues cannot buy the
   missing 35% (epilogues were measured free in int8_conv_experiments).

Writes docs/proofs/bf16_roofline.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 820.0
BF16_TFLOPS = 197.0


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


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
    t1 = min(_timed(lambda: float(s1(x))) for _ in range(reps))
    t2 = min(_timed(lambda: float(s2(x))) for _ in range(reps))
    return max((t2 - t1) / iters, 0.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default="docs/proofs/bf16_roofline.json")
    a = ap.parse_args()
    B = a.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        _STAGES,
        _convb,
        fold_resnet18_inference,
        folded_forward_inference,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )

    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    fp = fold_resnet18_inference(dict(variables), input_hw=(224, 224))
    k, b = fp["kernels"], fp["biases"]
    dtype = k["stem"].dtype
    rng = np.random.default_rng(0)

    def dev_bf16(shape):
        return jax.device_put(
            jnp.asarray(rng.normal(0, 1, shape), dtype)
        )

    rows = {}
    # element-millions; bf16 = 2 bytes each
    px = lambda h, c: B * h * h * c / 1e6

    def add(name, fn, x, hbm_mb, tera_flops):
        dt = time_segment(fn, x)
        sol_ms = max(hbm_mb / 1024 / HBM_GBPS, tera_flops / BF16_TFLOPS) * 1000
        bound = (
            "HBM" if hbm_mb / 1024 / HBM_GBPS > tera_flops / BF16_TFLOPS
            else "MXU"
        )
        rows[name] = {
            "ms": round(dt * 1000, 3),
            "sol_ms": round(sol_ms, 3),
            "bound": bound,
            "hbm_mb": round(hbm_mb, 1),
            "tflops": round(tera_flops, 4),
            "efficiency": round(sol_ms / (dt * 1000 + 1e-9), 3),
        }
        print(f"{name}: {rows[name]}", flush=True)

    # ---- segments of the production folded path -------------------------
    u8 = jax.device_put(rng.integers(0, 256, (B, 224, 224, 3), np.uint8))

    def cast(x):
        return (x.astype(jnp.int16) - 128).astype(dtype)

    # hbm_mb counts MEGABYTES: elements(millions) x bytes/elem; dep-read
    # of the output (the scan max) counts once more, as in int8_roofline
    add("cast_u8_to_bf16", cast, u8, px(224, 3) * 1 + 2 * px(224, 3) * 2,
        0.0)

    x_t = dev_bf16((B, 224, 224, 3))

    def stem(x):
        y = _convb(x, k["stem"], 2, [(3, 3), (3, 3)])
        return jax.nn.relu(y + fp["stem_bias_map"])

    fl_stem = B * 112 * 112 * 64 * (3 * 49) * 2 / 1e12
    add("stem_conv7x7", stem, x_t,
        (px(224, 3) + 2 * px(112, 64)) * 2, fl_stem)

    x_stem = dev_bf16((B, 112, 112, 64))

    def pool(x):
        return lax.reduce_window(
            x, jnp.asarray(-jnp.inf, dtype), lax.max, (1, 3, 3, 1),
            (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

    add("maxpool", pool, x_stem, (px(112, 64) + 2 * px(56, 64)) * 2, 0.0)

    def make_stage(i):
        def run(x):
            for j in range(dict(_STAGES)[i]):
                strides = 2 if i > 1 and j == 0 else 1
                y = _convb(x, k[f"s{i}b{j}c1"], strides, [(1, 1), (1, 1)])
                y1 = jax.nn.relu(y + b[f"s{i}b{j}c1"])
                y = _convb(y1, k[f"s{i}b{j}c2"], 1, [(1, 1), (1, 1)])
                if f"s{i}b{j}down" in k:
                    res = (
                        _convb(x, k[f"s{i}b{j}down"], strides,
                               [(0, 0), (0, 0)])
                        + b[f"s{i}b{j}down"]
                    )
                else:
                    res = x
                x = jax.nn.relu(y + b[f"s{i}b{j}c2"] + res)
            return x
        return run

    stage_geom = {1: (56, 64), 2: (28, 128), 3: (14, 256), 4: (7, 512)}
    for i in (1, 2, 3, 4):
        h, c = stage_geom[i]
        hin = h if i == 1 else h * 2
        cin = c if i == 1 else c // 2
        fl = 4 * B * h * h * c * (c * 9) * 2 / 1e12
        if i > 1:
            fl = (2 * B * h * h * c * (cin * 9) * 2
                  + 2 * B * h * h * c * (c * 9) * 2
                  + B * h * h * c * cin * 2) / 1e12
        # stage input + ~5 intermediate tensors + dep read, bf16 (2 B)
        mb = (px(hin, cin) + 6 * px(h, c)) * 2
        add(f"stage{i}", make_stage(i), dev_bf16((B, hin, hin, cin)), mb, fl)

    x4 = dev_bf16((B, 7, 7, 512))
    add("gap", lambda x: jnp.mean(x.astype(jnp.float32), axis=(1, 2)),
        x4, px(7, 512) * 2, 0.0)

    # ---- per-op conv efficiency at the stage shapes ----------------------
    per_op = {}
    shapes = [
        ("56x64_s1", 56, 64, 64, 1),
        ("56to28x128_s2", 56, 64, 128, 2),
        ("28x128_s1", 28, 128, 128, 1),
        ("28to14x256_s2", 28, 128, 256, 2),
        ("14x256_s1", 14, 256, 256, 1),
        ("14to7x512_s2", 14, 256, 512, 2),
        ("7x512_s1", 7, 512, 512, 1),
    ]
    for name, hin, cin, cout, s in shapes:
        kern = dev_bf16((3, 3, cin, cout))
        xin = dev_bf16((B, hin, hin, cin))
        hout = hin // s
        fl = B * hout * hout * cout * (cin * 9) * 2 / 1e12

        def conv(x, kern=kern, s=s):
            return _convb(x, kern, s, [(1, 1), (1, 1)])

        dt = time_segment(conv, xin)
        tflops = fl / dt / 1.0
        per_op[name] = {
            "ms": round(dt * 1000, 3),
            "tflops_achieved": round(tflops, 1),
            "pct_of_peak": round(100 * tflops / BF16_TFLOPS, 1),
        }
        print(f"conv {name}: {per_op[name]}", flush=True)

    # ---- full path -------------------------------------------------------
    dt_full = time_segment(
        lambda x: folded_forward_inference(fp, x, with_fc=False), u8
    )
    seg_sum = sum(rows[kk]["ms"] for kk in rows)
    sol_sum = sum(rows[kk]["sol_ms"] for kk in rows)
    report = {
        "metric": "bf16_roofline_per_stage_ms",
        "batch": B,
        "assumptions": {"hbm_gbps": HBM_GBPS, "bf16_tflops": BF16_TFLOPS},
        "rows": rows,
        "per_op_convs": per_op,
        "segments_sum_ms": round(seg_sum, 2),
        "segments_sol_sum_ms": round(sol_sum, 2),
        "overall_pct_of_sol": round(100 * sol_sum / seg_sum, 1),
        "full_ms": round(dt_full * 1000, 2),
        "patches_per_sec_bf16": round(B / dt_full, 1),
    }
    print(json.dumps(report))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
