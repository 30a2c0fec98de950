#!/usr/bin/env python
"""Host decode-rate bench: patches/s/core + cores-to-feed-one-chip.

The device eats 34.8k bf16 / 54.0k int8 224² patches/s/chip (bench.py);
SURVEY §7 set a ~3 GB/s decoded-feed bar per chip. This bench quantifies
the HOST side of that equation — the one resource this 1-core dev
environment cannot demonstrate at scale, so the scaling story must be a
measured per-core rate times a documented core count, not hand-waving:

- native threaded tile decode (`TiffSlide.read_regions`, per-thread TIFF
  handles) of a 224² level-3 grid, per compression (the CAMELYON16
  production encoding jpeg_ycbcr, plain RGB jpeg, deflate, none);
- decoded-tile LRU cache on/off at stride 224 (no tile reuse) and
  stride 112 (each tile read ~4x — the sliding-window/heatmap pattern);
- an N-core projection table: cores needed to saturate one chip at the
  measured bf16/int8 device rates (perfectly parallel across slides:
  extraction/inference fan out per-slide with per-thread handles, so the
  projection multiplies the single-core rate; cross-validated against
  num_threads=omp_max on hosts with >1 core).

Writes docs/proofs/decode_bench.json. Pure host work: no TPU needed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W0, H0 = 28672, 21504  # level 3 = 3584x2688 → 16x12 grid of 224² cells
NUM_LEVELS = 6
LEVEL = 3
PATCH = 224

DEVICE_RATES = {"bf16": 34812.0, "int8": 54019.0}  # docs/proofs/bench_r04.json


def fabricate(root: str, compression: str) -> str:
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        write_giant_synthetic_slide,
    )

    path = os.path.join(root, f"decode_{compression}.tiff")
    if os.path.exists(path):
        return path
    t0 = time.time()
    spec = SyntheticSlideSpec(
        width=W0, height=H0, num_levels=NUM_LEVELS,
        tissue_radii=(0.47, 0.47), seed=11,
    )
    write_giant_synthetic_slide(path, spec, compression=compression)
    print(f"[fabricate {compression}] {time.time() - t0:.1f}s "
          f"({os.path.getsize(path) / 1e6:.0f} MB)", flush=True)
    return path


def grid_coords(lw: int, lh: int, stride: int) -> np.ndarray:
    xs = np.arange(0, lw - PATCH + 1, stride, np.int64)
    ys = np.arange(0, lh - PATCH + 1, stride, np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.ravel(), gy.ravel()], axis=1)


def bench_slide(path: str, stride: int, cache_bytes: int,
                num_threads: int, reps: int = 3) -> dict:
    from ss25_hierarchical_multiscale_image_classification_tpu.io.tiff_slide import (
        TiffSlide,
    )

    best = None
    n = None
    for _ in range(reps):
        # fresh handle per rep: the LRU is per-handle, so rep 2 would
        # otherwise measure a warm cache even in the "off" phases
        slide = TiffSlide(path)
        try:
            slide.set_cache_bytes(cache_bytes)
            lw, lh = slide.level_dimensions[LEVEL]
            coords = grid_coords(lw, lh, stride)
            n = len(coords)
            t0 = time.perf_counter()
            out = slide.read_regions(coords, LEVEL, (PATCH, PATCH),
                                     num_threads=num_threads)
            dt = time.perf_counter() - t0
            assert out.shape == (n, PATCH, PATCH, 3)
            stats = slide.cache_stats()
        finally:
            slide.close()
        best = dt if best is None else min(best, dt)
    rate = n / best
    return {
        "patches": n,
        "seconds": round(best, 3),
        "patches_per_s": round(rate, 1),
        "decoded_mb_per_s": round(rate * PATCH * PATCH * 3 / 1e6, 1),
        "cache": {k: int(v) for k, v in stats.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hipac_decode")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "proofs", "decode_bench.json"))
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()
    os.makedirs(a.root, exist_ok=True)

    from ss25_hierarchical_multiscale_image_classification_tpu.io import (
        native_lib,
    )

    lib = native_lib.get_lib()
    assert lib is not None, "native decoder unavailable"
    omp_max = int(lib.hipac_omp_max_threads())

    report: dict = {
        "metric": "host_decode_patches_per_s_per_core",
        "slide_l0": [W0, H0],
        "level": LEVEL,
        "patch": PATCH,
        "omp_max_threads": omp_max,
        "host_note": "this environment exposes ONE CPU core; the "
                     "per-core rate is measured with num_threads=1 and "
                     "the N-core feed projection assumes per-slide "
                     "fan-out (per-thread TIFF handles, no shared "
                     "state beyond the per-handle LRU)",
        "device_rates_patches_per_s": DEVICE_RATES,
    }

    variants: dict = {}
    for compression in ("jpeg_ycbcr", "jpeg", "deflate", "none"):
        path = fabricate(a.root, compression)
        v = {"file_mb": round(os.path.getsize(path) / 1e6, 1)}
        # per-core rate, no tile reuse (extraction stride)
        v["stride224_cache_off"] = bench_slide(
            path, 224, 0, 1, a.reps)
        # overlapping grid (heatmap stride): LRU off vs on
        v["stride112_cache_off"] = bench_slide(
            path, 112, 0, 1, a.reps)
        v["stride112_cache_256mb"] = bench_slide(
            path, 112, 256 << 20, 1, a.reps)
        if omp_max > 1:
            v["stride224_cache_off_all_cores"] = bench_slide(
                path, 224, 0, 0, a.reps)
        variants[compression] = v
        print(f"[{compression}] {json.dumps(v)}", flush=True)

    report["variants"] = variants

    # N-core feed projection against the measured chip rates
    proj = {}
    for compression, v in variants.items():
        per_core = v["stride224_cache_off"]["patches_per_s"]
        proj[compression] = {
            "per_core_patches_per_s": per_core,
            "cores_to_feed_one_chip": {
                k: round(rate / per_core, 1)
                for k, rate in DEVICE_RATES.items()
            },
            "eight_core_feed_patches_per_s": round(per_core * 8, 0),
            "feeds_chip_bf16_with_8_cores": per_core * 8
            >= DEVICE_RATES["bf16"],
        }
    report["projection"] = proj

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
