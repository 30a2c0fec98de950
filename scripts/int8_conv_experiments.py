#!/usr/bin/env python
"""Alternative lowerings for the int8 3x3 convs XLA runs below 70% MXU.

The int8 roofline (docs/proofs/int8_roofline.json) attributes the
remaining 35%-of-SOL gap to XLA's int8 conv customs at the small-spatial
stages (stage2 28²x128: 46%, stage3 14²x256: 68%, stage4 7²x512: 80%).
This experiment measures, per stage shape, three mathematically identical
lowerings of the 3x3 int8 conv + requant epilogue:

  conv     lax.conv_general_dilated int8xint8->int32 (production _convq)
  shift9   sum of 9 shifted 1x1 matmuls (dot_general per kernel tap,
           int32 accumulation) — no im2col materialization, 9x input
           reads from VMEM-resident slices
  patches  conv_general_dilated_patches (im2col to 9C channels) + one
           (BHW, 9C)x(9C, Cout) dot — one big MXU-friendly matmul at the
           cost of a 9x-activation HBM materialization

Timing: fetch-forced L-vs-2L scan differencing (the only trustworthy
method on this tunneled box — see docs/PERFORMANCE.md round-4 notes).
If an alternative wins by >10% on a stage, it's worth wiring into
models/quantized.quant_forward behind a parity test; otherwise this
JSON documents that XLA's conv custom is the practical ceiling.

Usage: python scripts/int8_conv_experiments.py [--batch 512] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def time_fn(fn, x, iters: int = 20, reps: int = 3) -> float:
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="docs/proofs/int8_conv_experiments.json")
    a = ap.parse_args()
    B = a.batch

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def dev_i8(shape):
        return jax.device_put(
            rng.integers(-127, 128, shape, np.int32).astype(np.int8)
        )

    report = {"metric": "int8_conv_lowerings_ms", "batch": B, "shapes": {}}

    # (H, C) per stage at stride 1 (the 3 of 4 convs per stage that
    # dominate; the strided block-0 conv has the same lowering choice)
    for name, (H, C) in {"stage2": (28, 128), "stage3": (14, 256),
                         "stage4": (7, 512)}.items():
        x = dev_i8((B, H, H, C))
        k = dev_i8((3, 3, C, C))              # HWIO
        # conv_general_dilated_patches emits features channel-major
        # (C_in, ky, kx), so permute HWIO accordingly before flattening
        k_mat = jnp.reshape(
            jnp.transpose(k, (2, 0, 1, 3)), (9 * C, C)
        )  # (9C, Cout) for patches
        wscale = jnp.float32(0.01)
        bias = jax.device_put(rng.normal(size=(C,)).astype(np.float32))
        out_scale = jnp.float32(0.1)

        def requant(y32):
            y = y32.astype(jnp.float32) * wscale + bias
            y = jnp.maximum(y, 0.0) / out_scale
            return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

        def requant_bf16(y32):
            # epilogue arithmetic in bf16: VPU lanes double, at the cost
            # of ±1-step rounding drift near int8 boundaries
            a = (wscale / out_scale).astype(jnp.bfloat16)
            b = (bias / out_scale).astype(jnp.bfloat16)
            y = y32.astype(jnp.bfloat16) * a + b
            y = jnp.maximum(y, jnp.bfloat16(0))
            # 0..127 are exact in bf16 (7-bit significand), so round/clip
            # stay in bf16; only values straddling a .5 boundary after the
            # bf16 madd can differ from the f32 epilogue by one step
            return jnp.clip(jnp.round(y), jnp.bfloat16(-127),
                            jnp.bfloat16(127)).astype(jnp.int8)

        def raw_conv(xi):
            return lax.conv_general_dilated(
                xi, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )

        def conv(xi):
            return requant(raw_conv(xi))

        def conv_bf16ep(xi):
            return requant_bf16(raw_conv(xi))

        def conv_noep(xi):
            # truncating cast only: isolates the epilogue's VPU cost
            return raw_conv(xi).astype(jnp.int8)

        def shift9(xi):
            n = xi.shape[0]
            xp = jnp.pad(xi, [(0, 0), (1, 1), (1, 1), (0, 0)])
            y32 = jnp.zeros((n, H, H, C), jnp.int32)
            for dy in range(3):
                for dx in range(3):
                    xs = lax.slice(
                        xp, (0, dy, dx, 0), (n, dy + H, dx + H, C)
                    )
                    y32 = y32 + lax.dot_general(
                        xs, k[dy, dx],
                        (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            return requant(y32)

        def patches(xi):
            p = lax.conv_general_dilated_patches(
                xi, (3, 3), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, H, H, 9C) int8
            y32 = lax.dot_general(
                p, k_mat, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return requant(y32)

        # parity before timing (tiny slice, avoids wasting chip time on
        # a wrong formulation)
        xs = dev_i8((2, H, H, C))
        ref = np.asarray(conv(xs))
        for label, fn in (("shift9", shift9), ("patches", patches),
                          ("conv_bf16ep", conv_bf16ep)):
            got = np.asarray(fn(xs))
            diff = int(np.abs(ref.astype(np.int32)
                              - got.astype(np.int32)).max())
            tol = 2 if label == "conv_bf16ep" else 1
            if diff > tol:  # requant rounding boundary tolerance
                raise AssertionError(f"{name}/{label} parity diff {diff}")

        row = {}
        flops = B * H * H * C * (C * 9) * 2 / 1e12
        for label, fn in (("conv", conv), ("conv_bf16ep", conv_bf16ep),
                          ("conv_noep", conv_noep), ("shift9", shift9),
                          ("patches", patches)):
            dt = time_fn(fn, x, iters=a.iters)
            row[label] = {
                "ms": round(dt * 1000, 3),
                "tops": round(flops / dt / 1e0, 1) if dt else None,
            }
            print(f"{name} {label}: {row[label]}", flush=True)
        report["shapes"][name] = row

    print(json.dumps(report))
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
