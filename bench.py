#!/usr/bin/env python
"""Headline benchmark: ResNet18 inference throughput on 224² patches.

Measures the rebuilt feature-extraction hot loop (SURVEY.md §3.4, the
reference's ``--extract_features`` path): uint8 host batches → device →
on-device ImageNet normalize → bf16 ResNet18 forward. The driver-set target
is ≥ 20,000 patches/sec/chip on TPU v5e (BASELINE.json); ``vs_baseline`` is
measured/20k.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Outage resilience (round-4): TPU backend init over the tunnel is a blocking
C call that can hang when the tunnel blips — BENCH_r03 recorded 0.0 because
a single 300 s init watchdog fired once and gave up. The default invocation
is now a PARENT that runs each measurement phase (float, int8) in a child
subprocess with its own init watchdog, retrying failed phases with backoff
and escalating init timeouts. The parent emits the best completed
measurement if any phase ever succeeds, and only reports an error line when
every attempt of every phase failed.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 20_000.0

# Parent retry policy: per-attempt child init watchdog (seconds) and sleep
# before the attempt. Escalating init timeouts tolerate a genuinely slow
# cold init (~2 min observed) while retrying fast on a down tunnel.
RETRY_SCHEDULE = [
    # (sleep_before_s, init_watchdog_s)
    (0, 180),
    (15, 180),
    (30, 300),
    (60, 300),
    (90, 420),
    (120, 600),
]
PARENT_BUDGET_S = 2700.0  # total wall budget: always emit a line before this
BENCH_WATCHDOG_S = 900.0  # child phase-2 guard: measurement after init


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

    _warmup_with_retry(step, params, batch_stats, dev_batches, warmup)

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
    _warmup_with_retry(
        lambda qp, _bs, b: step(qp, b), qtree, None, dev_batches, warmup
    )
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


def _warmup_with_retry(step, params, batch_stats, dev_batches, warmup):
    """First compile over the tunnel can fail transiently; retry it once."""
    try:
        float(step(params, batch_stats, dev_batches[0]))
    except Exception:
        time.sleep(10.0)
        float(step(params, batch_stats, dev_batches[0]))
    for i in range(1, warmup):
        float(step(params, batch_stats, dev_batches[i % 2]))


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


def _child_main(argv: list[str]) -> None:
    """One measurement phase under init + bench watchdogs; prints one JSON."""
    init_s = 300.0
    for a in argv:
        if a.startswith("--init-timeout="):
            init_s = float(a.split("=", 1)[1])

    # phase 1 guard: backend init + one tiny op (the call that actually
    # hangs when the tunnel is down).
    disarm = _watchdog(init_s, "device init")
    import jax as _jax

    float(_jax.jit(lambda x: x + 1)(_jax.numpy.zeros(())))
    disarm()
    # phase 2 guard: the measurement itself — an hour means something is
    # wrong (a hung remote-compile service mid-run), and the parent still
    # needs its one JSON line
    disarm = _watchdog(BENCH_WATCHDOG_S, "benchmark")
    if "--child-int8" in argv:
        result = run_bench_int8(stem_s2d=False if "--no-s2d" in argv else None)
    elif "--unfolded" in argv:
        result = run_bench(folded=False)
    else:
        result = run_bench()
    disarm()
    print(json.dumps(result), flush=True)


def _parse_result(stdout: str) -> dict | None:
    """Last JSON object line in ``stdout``, or None."""
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def _run_child(phase_flag: str, init_timeout: float, extra: list[str],
               hard_timeout: float) -> dict | None:
    """Run one child attempt; return its parsed result JSON or None."""
    cmd = [sys.executable, __file__, phase_flag,
           f"--init-timeout={init_timeout:.0f}"] + extra
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=hard_timeout,
        )
    except subprocess.TimeoutExpired:
        return None
    except Exception:
        return None
    parsed = _parse_result(proc.stdout)
    if parsed is None or "error" in parsed or parsed.get("value", 0.0) <= 0.0:
        if parsed is not None:
            print(f"# attempt failed: {json.dumps(parsed)}", file=sys.stderr)
        else:
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            print("# attempt failed, stderr tail: " + " | ".join(tail),
                  file=sys.stderr)
        return None
    return parsed


def _phase_with_retries(phase_flag: str, extra: list[str], t_start: float,
                        budget_s: float) -> dict | None:
    """Retry one phase on the schedule until success or budget exhausted."""
    for i, (sleep_s, init_s) in enumerate(RETRY_SCHEDULE):
        remaining = budget_s - (time.time() - t_start)
        # need room for the sleep, the init, and some measurement time
        if remaining < sleep_s + init_s + 120:
            # shrink the init window rather than silently skipping the
            # last chance, as long as a minimally useful attempt fits
            init_s = remaining - sleep_s - 120
            if init_s < 60:
                return None
        if sleep_s:
            time.sleep(sleep_s)
        hard_timeout = init_s + BENCH_WATCHDOG_S + 60
        remaining = budget_s - (time.time() - t_start)
        hard_timeout = min(hard_timeout, max(remaining, 60))
        result = _run_child(phase_flag, init_s, extra, hard_timeout)
        if result is not None:
            return result
        print(f"# {phase_flag} attempt {i + 1} failed "
              f"(init window {init_s:.0f}s)", file=sys.stderr)
    return None


def _parent_main(argv: list[str]) -> None:
    t_start = time.time()
    want_float = "--int8" not in argv
    want_int8 = "--float-only" not in argv and "--unfolded" not in argv
    extra = [a for a in argv if a in ("--no-s2d", "--unfolded")]

    float_res = None
    int8_res = None
    if want_float:
        # the headline float metric gets the larger share of the budget
        float_res = _phase_with_retries(
            "--child-float", extra, t_start,
            PARENT_BUDGET_S if not want_int8 else PARENT_BUDGET_S * 0.7,
        )
    if want_int8:
        int8_res = _phase_with_retries(
            "--child-int8", extra, t_start, PARENT_BUDGET_S - 60,
        )

    if want_float and not want_int8:
        result = float_res
    elif want_int8 and not want_float:
        result = int8_res
    elif float_res is not None:
        result = dict(float_res)
        if int8_res is not None:
            result["int8_metric"] = int8_res["metric"]
            result["int8_value"] = int8_res["value"]
            result["int8_vs_baseline"] = int8_res["vs_baseline"]
        else:
            result["int8_error"] = "int8 phase failed after retries"
    elif int8_res is not None:
        # best completed measurement: the float phase never succeeded but
        # int8 did — report what we measured rather than 0.0
        result = dict(int8_res)
        result["float_error"] = "float phase failed after retries"
    else:
        result = None

    if result is None:
        result = {
            "metric": "resnet18_infer_patches_per_sec",
            "value": 0.0,
            "unit": "patches/s/chip",
            "vs_baseline": 0.0,
            "error": (
                f"all phases failed after {len(RETRY_SCHEDULE)} retries over "
                f"{time.time() - t_start:.0f}s (TPU tunnel down?)"
            ),
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--child-float" in sys.argv or "--child-int8" in sys.argv:
        _child_main(sys.argv)
    else:
        _parent_main(sys.argv)
