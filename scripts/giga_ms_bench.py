#!/usr/bin/env python
"""Multiscale ± cascade wall-clock on the real-size gigapixel slide.

The 48-slide proof measures cascade on decode-cheap 7168x5376 slides; the
claimed savings scale with the finer-magnification decode share, which
only a real-size slide exercises. This script times the hierarchical
producer on the canonical 97792x221184 BigTIFF (``scripts/gigapixel_proof.py``
fabricates it) three ways: single-level, full multiscale, cascade
multiscale (the artifact's fitted operating point), and reports
survivor accounting.

Usage: python scripts/giga_ms_bench.py [--slide PATH] [--models DIR]
Defaults assume the proof artifacts: slide /tmp/hipac_gigapixel/tumor_giant.tif,
models /tmp/hipac_froc/models (hierarchical_classifier trained by
``scripts/froc_e2e_proof.py`` — synthetic-style weights are fine, the
measurement is about decode+compute wall, not accuracy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slide", default="/tmp/hipac_gigapixel/tumor_giant.tif")
    ap.add_argument("--models", default="/tmp/hipac_froc/models")
    ap.add_argument("--stride", type=int, default=112)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--out", default="docs/proofs/giga_ms_report.json")
    a = ap.parse_args()

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        predict_slide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        load_model,
    )

    ms_vars = load_model(os.path.join(a.models, "hierarchical_classifier"))
    clf_vars = load_model(os.path.join(a.models, "resnet18_patch_classifier"))
    report: dict = {
        "metric": "gigapixel_multiscale_cascade_wall",
        "slide": a.slide,
        "stride": a.stride,
    }

    # Environment attribution: on this tunneled single-chip setup the
    # dominant wall is HOST→DEVICE BATCH TRANSFER over the tunnel (tens
    # of MB/s, fluctuating minute to minute), not decode or TPU compute.
    # Record the decode-only wall and the tunnel bandwidth alongside, so
    # the report separates design costs from environment artifacts
    # (round-4 decomposition: decode 4.0 s, host assembly 5.6 s,
    # dispatch+fetch = the rest — docs/PERFORMANCE.md).
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        open_slide,
    )

    slide = open_slide(a.slide)
    g3 = PatchGrid.for_slide_level(
        3, slide.level_dimensions[3], slide.level_downsamples[3],
        stride=a.stride,
    )
    w3, h3 = slide.level_dimensions[3]
    t0 = time.time()
    for iy in range(g3.ny):
        y = iy * g3.stride
        h = min(g3.patch_size, h3 - y)
        slide.read_region(g3.level0_origin(0, y), 3, (w3, h))
    report["decode_only_level3_s"] = round(time.time() - t0, 1)
    report["tile_cache"] = slide.cache_stats()
    slide.close()

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    probe = np.zeros((a.batch_size, 224, 224, 3), np.uint8)
    float(f(probe))
    t0 = time.time()
    for _ in range(5):
        float(f(probe))
    mb = probe.nbytes / 2**20
    report["tunnel_mb_per_s"] = round(5 * mb / (time.time() - t0), 1)

    t0 = time.time()
    probs, grid = predict_slide(
        a.slide, clf_vars, level=3, stride=a.stride,
        batch_size=a.batch_size,
    )
    report["single_level_s"] = round(time.time() - t0, 1)
    report["grid"] = [int(grid.ny), int(grid.nx)]
    report["tissue_cells"] = int((probs > 0).sum())

    t0 = time.time()
    full, ms_grid = predict_slide_multiscale(
        a.slide, ms_vars, levels=(2, 3), stride=a.stride,
        batch_size=a.batch_size,
    )
    report["multiscale_s"] = round(time.time() - t0, 1)

    # the cascade floor: the artifact's fitted operating point when it
    # ships one, else an explicit probability floor (the wall is the
    # measurement target either way; report which was used)
    calib = dict(ms_vars.get("calibration", {}) or {})
    cascade: object = "auto" if "cascade_margin" in calib else 0.5
    report["cascade_floor"] = (
        "auto (artifact operating point)" if cascade == "auto"
        else f"explicit p>={cascade}"
    )

    # HEADLINE: the production cascade config (mid-flight bailout probe
    # active, default threshold) — when the floor is uninformative on
    # this slide's tissue the screen is abandoned early, bounding the
    # worst case near the full pass
    t0 = time.time()
    casc, _ = predict_slide_multiscale(
        a.slide, ms_vars, levels=(2, 3), stride=a.stride,
        batch_size=a.batch_size, cascade=cascade,
    )
    report["multiscale_cascade_s"] = round(time.time() - t0, 1)

    # diagnostic: the same floor with the probe disabled (unconditional
    # screen) — the round-3 transfer wall this bench exists to bound
    t0 = time.time()
    forced, _ = predict_slide_multiscale(
        a.slide, ms_vars, levels=(2, 3), stride=a.stride,
        batch_size=a.batch_size, cascade=cascade, cascade_bailout=1.0,
    )
    report["multiscale_cascade_forced_screen_s"] = round(time.time() - t0, 1)

    # survivors: cells whose cascade output differs from non-tissue AND
    # match the full fused values (the rest carry the screen margin)
    agree = np.isclose(casc, full, atol=1e-5)
    report["cells_with_fused_values"] = int((agree & (full > 0)).sum())
    report["cascade_matches_full_everywhere"] = bool(
        np.isclose(casc, full, atol=1e-5).all()
    )
    report["speedup_vs_full_multiscale"] = round(
        report["multiscale_s"] / max(report["multiscale_cascade_s"], 1e-9), 2
    )

    # DETECTION-LEVEL recall safety (VERDICT r4 #9): grid-value parity is
    # the wrong bar — screened-out cells intentionally carry the screen
    # margin, not the fused value. What production consumes is the
    # detection list, so the claim to assert is: every detection the FULL
    # fused pass emits above the operating point is also emitted by the
    # cascade (same NMS, same threshold), within the NMS suppression
    # radius. Extra cascade detections are fine (they only add operating
    # points for the FROC consumer); a MISSING one is a recall loss.
    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        DETECTION_PROB_THRESHOLD,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        nms_detections,
    )

    radius_cells = 1
    thr = max(DETECTION_PROB_THRESHOLD, 0.5)
    full_dets = nms_detections(full, ms_grid, threshold=thr,
                               radius_cells=radius_cells)
    casc_dets = nms_detections(casc, ms_grid, threshold=thr,
                               radius_cells=radius_cells)
    match_l0 = (radius_cells + 1) * ms_grid.stride * ms_grid.downsample

    def _covered(det, dets) -> bool:
        _, x, y = det
        return any(
            abs(x - x2) <= match_l0 and abs(y - y2) <= match_l0
            for _, x2, y2 in dets
        )

    missed = [d for d in full_dets if not _covered(d, casc_dets)]
    report["detection_parity"] = {
        "threshold": thr,
        "full_detections": len(full_dets),
        "cascade_detections": len(casc_dets),
        "full_detections_missed_by_cascade": len(missed),
        "cascade_detection_superset_of_full": not missed,
    }
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    # asserted AFTER the report lands on disk so a recall loss is both
    # fatal (nonzero exit for the proof harness) and diagnosable
    assert not missed, (
        f"cascade lost {len(missed)} full-pass detections: {missed[:5]}"
    )


if __name__ == "__main__":
    main()
