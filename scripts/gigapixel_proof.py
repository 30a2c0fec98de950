#!/usr/bin/env python
"""Gigapixel extraction proof (VERDICT round-1 missing #1).

Fabricates a full-scale synthetic CAMELYON16 slide — 97792 x 221184, the
canonical giant slide of reference ``02_patch_extraction.ipynb`` cell 2 —
as a tiled JPEG BigTIFF (streamed to disk, never resident), then runs
band-streamed patch extraction at levels 0..3 while tracking peak RSS.

The reference extractor streams one patch at a time (src/main.py:682-726)
and so handles level 0 on any machine; this proves the rebuild's batch
pipeline does too, under a stated memory budget.

Usage: python scripts/gigapixel_proof.py [--out DIR] [--budget_gb 8]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/hipac_gigapixel")
    p.add_argument("--budget_gb", type=float, default=8.0)
    p.add_argument("--width", type=int, default=97792)
    p.add_argument("--height", type=int, default=221184)
    p.add_argument("--levels", type=str, default="0,1,2,3")
    p.add_argument("--skip_fabricate", action="store_true")
    args = p.parse_args()

    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches_for_slide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_giant_synthetic_slide,
    )

    os.makedirs(args.out, exist_ok=True)
    slide_path = os.path.join(args.out, "tumor_giant.tif")
    xml_path = os.path.join(args.out, "tumor_giant.xml")
    report = {
        "width": args.width,
        "height": args.height,
        "budget_gb": args.budget_gb,
        "stages": {},
    }

    if not args.skip_fabricate or not os.path.exists(slide_path):
        t0 = time.perf_counter()
        spec = tumor_spec(
            width=args.width,
            height=args.height,
            num_levels=4,
            seed=42,
            tumor_polygons=(
                ((0.42, 0.40), (0.55, 0.42), (0.58, 0.55), (0.45, 0.58)),
                ((0.30, 0.62), (0.36, 0.60), (0.38, 0.68), (0.31, 0.70)),
            ),
        )
        write_giant_synthetic_slide(slide_path, spec, xml_path=xml_path)
        dt = time.perf_counter() - t0
        report["stages"]["fabricate"] = {
            "seconds": round(dt, 1),
            "peak_rss_gb": round(rss_gb(), 2),
            "file_gb": round(os.path.getsize(slide_path) / 2**30, 2),
        }
        print(f"[fabricate] {dt:.0f}s, file "
              f"{report['stages']['fabricate']['file_gb']} GB, "
              f"peak RSS {rss_gb():.2f} GB", flush=True)

    patches_dir = os.path.join(args.out, "patches")
    for lvl in [int(v) for v in args.levels.split(",")]:
        t0 = time.perf_counter()
        recs = extract_patches_for_slide(
            slide_path, xml_path, lvl, patches_dir, store_format="packed",
        )
        dt = time.perf_counter() - t0
        n_tumor = sum(1 for r in recs if r.label == 1)
        report["stages"][f"level_{lvl}"] = {
            "seconds": round(dt, 1),
            "patches": len(recs),
            "tumor": n_tumor,
            "peak_rss_gb": round(rss_gb(), 2),
        }
        print(f"[level {lvl}] {len(recs)} patches ({n_tumor} tumor) in "
              f"{dt:.0f}s, peak RSS {rss_gb():.2f} GB", flush=True)

    report["peak_rss_gb"] = round(rss_gb(), 2)
    report["within_budget"] = report["peak_rss_gb"] < args.budget_gb
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["within_budget"] else 1


if __name__ == "__main__":
    sys.exit(main())
