#!/usr/bin/env python
"""The DISCRIMINATIVE multiscale benchmark: texture lesions only finer
magnifications can see.

The 48-slide proof (``froc_e2e_proof.py``) saturates at FROC 1.0 for every
producer once detections are centroid-localized — tinted tumors are
separable at any level. This fixture makes the hierarchy itself the
signal: ``tumor_style="texture"`` lesions carry a zero-mean 4-px
checkerboard whose amplitude survives pyramid box-averaging to level 2
but cancels EXACTLY at level 3 (``io/synthetic.py``,
``tests/test_synthetic.py``). The single-level producer at its own level
(3) is blind by construction; the hierarchical multiscale producer reads
levels (2, 3) per cell and detects through the level-2 stream — the
capability the reference is NAMED for, measured as a FROC gap instead of
a tie.

Phases (all through the CLI):
  1. extract L3 + L2 patches
  2. single-level train (L3) → fleet producer → official FROC
     (blind by construction — the floor)
  3. single-level train (L2) → producer at level 2 → FROC
     (the fine-level ceiling: what a detector AT the signal-bearing
     level can do, at 4x the inference cost per unit area)
  4. multiscale train (2,3), resize input → fused producer → FROC
     (box-resizing 448→224 composes to the same 8x box average that
     made level 3, so this mode is nearly blind too — the negative
     control that motivated input_mode='crop')
  5. multiscale train (2,3), crop input → fused producer → FROC
     (the claim: native-magnification fine stream detects through
     level 2 while the producer keeps the base level's grid)

Writes docs/proofs/froc_hard_report.json. Resumable like the main proof
(--resume skips phases already recorded).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

W0, H0 = 7168, 5376
NUM_LEVELS = 6
N_TRAIN_TUMOR, N_TRAIN_NORMAL = 8, 8
N_TEST_TUMOR, N_TEST_NORMAL = 12, 12


def _tumor_poly(rng):
    cx = rng.uniform(0.38, 0.62)
    cy = rng.uniform(0.38, 0.62)
    r = rng.uniform(0.10, 0.17)
    angles = np.sort(rng.uniform(0, 2 * np.pi, 7))
    return tuple(
        (cx + r * rng.uniform(0.75, 1.0) * np.cos(a),
         cy + r * rng.uniform(0.75, 1.0) * np.sin(a))
        for a in angles
    )


def fabricate(root: str) -> None:
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.rasterize import (
        polygons_to_mask,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        write_synthetic_case,
    )

    rng = np.random.default_rng(7)
    t0 = time.time()

    def spec(seed, polys=()):
        return SyntheticSlideSpec(
            width=W0, height=H0, num_levels=NUM_LEVELS,
            tissue_radii=(0.45, 0.45), tumor_polygons=polys, seed=seed,
            tumor_style="texture",
        )

    def _exists(name, split):
        return os.path.exists(
            os.path.join(root, split, "img", f"{name}.wsi.npz")
        )

    for i in range(N_TRAIN_TUMOR):
        poly = _tumor_poly(rng)
        if not _exists(f"tumor_{i + 1:03d}", "train"):
            write_synthetic_case(root, f"tumor_{i + 1:03d}",
                                 spec(500 + i, (poly,)), split="train")
    for i in range(N_TRAIN_NORMAL):
        if not _exists(f"normal_{i + 1:03d}", "train"):
            write_synthetic_case(root, f"normal_{i + 1:03d}",
                                 spec(600 + i), split="train")

    mask_dir = os.path.join(root, "test", "mask")
    os.makedirs(mask_dir, exist_ok=True)
    l5 = (W0 // 32, H0 // 32)
    case = 0
    for kind, n in (("tumor", N_TEST_TUMOR), ("normal", N_TEST_NORMAL)):
        for i in range(n):
            case += 1
            name = f"test_{case:03d}"
            polys = (_tumor_poly(rng),) if kind == "tumor" else ()
            if not _exists(name, "test"):
                write_synthetic_case(root, name, spec(700 + case, polys),
                                     split="test")
            if polys:
                polys_l0 = [
                    np.array([(fx * W0, fy * H0) for fx, fy in p])
                    for p in polys
                ]
                mask = polygons_to_mask(polys_l0, l5, (W0, H0))
                np.save(os.path.join(mask_dir, f"{name}_mask.npy"),
                        np.asarray(mask, np.uint8))
    print(f"[fabricate] {time.time() - t0:.1f}s", flush=True)


def _strategy_cfg(root: str) -> str:
    """Config file bounding the SimCLR pretraining inside the strategy
    phase (the 200-epoch default would dominate the proof's wall)."""
    path = os.path.join(root, "strategy_cfg.json")
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump({"simclr": {"epochs": 40, "batch_size": 64}}, f)
    return path


def cli(args: list[str], root: str, models: str) -> float:
    cmd = [sys.executable, os.path.join(REPO, "main.py"), *args,
           "--data_dir", root, "--models_dir", models]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"CLI failed: {' '.join(args)}")
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hipac_froc_hard")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    if a.resume:
        a.keep = True
    if os.path.exists(a.root) and not a.keep:
        shutil.rmtree(a.root)
    os.makedirs(a.root, exist_ok=True)
    models = os.path.join(a.root, "models")
    if not a.resume:
        for sub in ("patches", "models"):
            shutil.rmtree(os.path.join(a.root, sub), ignore_errors=True)

    fabricate(a.root)

    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
        run_froc_evaluation,
    )

    def froc(csv_subdir="model_predictions_csv"):
        r = run_froc_evaluation(
            os.path.join(models, csv_subdir),
            os.path.join(a.root, "test", "mask"),
        )
        return {
            "froc_score": round(float(r["score"]), 4),
            "sensitivity_max": round(float(np.max(r["sensitivity"])), 4)
            if len(r["sensitivity"]) else None,
            "n_slides": len(r["names"]),
        }

    report: dict = {
        "metric": "froc_hard_texture_fixture",
        "n_tumor_slides": N_TEST_TUMOR,
        "note": "Texture lesions: zero-mean 4-px checkerboard, amplitude "
                "preserved at level 2 and EXACTLY canceled at level 3 by "
                "pyramid box-averaging (io/synthetic.py tumor_style="
                "'texture'). The single-level level-3 producer is blind "
                "by construction (floor); single-level level-2 is the "
                "fine-level ceiling at 4x the per-area inference cost; "
                "multiscale with resize input is the negative control "
                "(448->224 box-resize recreates the level-3 cancellation); "
                "multiscale with crop input (--ms_input crop) is the "
                "claim: the native-magnification fine stream detects "
                "through level 2 on the base level's detection grid.",
    }
    out_path = a.out or os.path.join(
        REPO, "docs", "proofs", "froc_hard_report.json"
    )
    if a.resume and os.path.exists(out_path):
        with open(out_path) as f:
            report = {**json.load(f), **report}
        phases = ("seconds_patch", "single_level_L3", "single_level_L2",
                  "multiscale_resize", "multiscale_crop",
                  "single_level_L2_int8", "single_level_L2_qat",
                  "multiscale_crop_int8", "single_level_L2_simclr")
        print(f"[resume] recovered: "
              f"{[k for k in phases if k in report]}", flush=True)

    def checkpoint():
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print(json.dumps(report), flush=True)

    if "seconds_patch" not in report:
        t = cli(["--patch", "--patch_level", "3", "--stride", "112"],
                a.root, models)
        t += cli(["--patch", "--patch_level", "2", "--stride", "224"],
                 a.root, models)
        report["seconds_patch"] = round(t, 1)

    test_img = os.path.join(a.root, "test", "img")

    if "single_level_L3" not in report:
        t_train = cli(["--train", "--patch_level", "3", "--epochs", "10",
                       "--batch_size", "32"], a.root, models)
        t_eval = cli(["--predict_slide", test_img, "--run_evaluation",
                      "--patch_level", "3", "--stride", "56",
                      "--batch_size", "128"], a.root, models)
        report["single_level_L3"] = {
            **froc(), "seconds_train": round(t_train, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
        }
        print(f"[single-level L3] → {report['single_level_L3']}", flush=True)
        checkpoint()

    # fine-level ceiling control: same detection raster (448 L0 px => L2
    # stride 112), trained and predicted entirely at the signal-bearing
    # level — 4x the pixels per unit slide area of the L3 producer
    if "single_level_L2" not in report:
        t_train = cli(["--train", "--patch_level", "2", "--epochs", "10",
                       "--batch_size", "32"], a.root, models)
        t_eval = cli(["--predict_slide", test_img, "--run_evaluation",
                      "--patch_level", "2", "--stride", "112",
                      "--batch_size", "128"], a.root, models)
        report["single_level_L2"] = {
            **froc(), "seconds_train": round(t_train, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
        }
        print(f"[single-level L2] → {report['single_level_L2']}", flush=True)
        checkpoint()

    def multiscale_phase(key: str, input_mode: str) -> None:
        if key in report:
            return
        t_train = cli(["--train_multiscale", "--levels", "2,3",
                       "--ms_input", input_mode, "--epochs", "10",
                       "--batch_size", "32"], a.root, models)
        t_eval = cli(["--predict_slide", test_img,
                      "--multiscale", "--levels", "2,3", "--run_evaluation",
                      "--stride", "56", "--batch_size", "64"],
                     a.root, models)
        report[key] = {
            **froc(), "input_mode": input_mode,
            "seconds_train": round(t_train, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
        }
        print(f"[{key}] → {report[key]}", flush=True)
        checkpoint()

    multiscale_phase("multiscale_resize", "resize")
    multiscale_phase("multiscale_crop", "crop")

    # Resume on a fresh host: phase RECORDS survive in the committed
    # report, but their on-disk side effects (patch stores + checkpoints
    # under /tmp) do not. Later phases depend on them — re-materialize
    # missing prerequisites without re-recording the earlier timings.
    def ensure_patches() -> None:
        for level, stride in ((3, 112), (2, 224)):
            pdir = os.path.join(a.root, "patches", f"level_{level}")
            if not os.path.isdir(pdir) or not os.listdir(pdir):
                print(f"[prereq] re-extracting level-{level} patches",
                      flush=True)
                cli(["--patch", "--patch_level", str(level),
                     "--stride", str(stride)], a.root, models)

    def ensure_model(name: str, train_args: list[str]) -> None:
        ensure_patches()  # calibration + any retrain both read patches
        if not os.path.exists(os.path.join(models, name)):
            print(f"[prereq] retraining missing artifact {name}",
                  flush=True)
            cli(train_args, a.root, models)

    # ---- quantization phases: measured where the task is NOT saturated --
    # The 48-slide proof scores 1.0 on every surface, so an int8/QAT
    # quality regression would be invisible there; here the baselines are
    # single_level_L2 (fine-level ceiling) and multiscale_crop (the claim).

    # int8 single-level at the signal-bearing level (PTQ artifact)
    if "single_level_L2_int8" not in report:
        ensure_model("resnet18_patch_classifier",
                     ["--train", "--patch_level", "2", "--epochs", "10",
                      "--batch_size", "32"])
        t_q = cli(["--quantize", "--patch_level", "2"], a.root, models)
        t_eval = cli(["--predict_slide", test_img, "--run_evaluation",
                      "--patch_level", "2", "--stride", "112",
                      "--batch_size", "128", "--int8"], a.root, models)
        report["single_level_L2_int8"] = {
            **froc(), "seconds_quantize": round(t_q, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
            "baseline": "single_level_L2",
        }
        print(f"[L2 int8] → {report['single_level_L2_int8']}", flush=True)
        checkpoint()

    # QAT at the same level: upgrades the persisted artifact in place
    if "single_level_L2_qat" not in report:
        ensure_model("resnet18_patch_classifier",
                     ["--train", "--patch_level", "2", "--epochs", "10",
                      "--batch_size", "32"])
        t_q = cli(["--qat", "--patch_level", "2", "--epochs", "2",
                   "--batch_size", "32"], a.root, models)
        t_eval = cli(["--predict_slide", test_img, "--run_evaluation",
                      "--patch_level", "2", "--stride", "112",
                      "--batch_size", "128", "--int8"], a.root, models)
        report["single_level_L2_qat"] = {
            **froc(), "seconds_qat": round(t_q, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
            "baseline": "single_level_L2",
        }
        print(f"[L2 qat] → {report['single_level_L2_qat']}", flush=True)
        checkpoint()

    # int8 multiscale: quantize the crop-trained trunk (the last-trained
    # multiscale artifact), rerun the fused producer
    if "multiscale_crop_int8" not in report:
        ensure_model("hierarchical_classifier",
                     ["--train_multiscale", "--levels", "2,3",
                      "--ms_input", "crop", "--epochs", "10",
                      "--batch_size", "32"])
        t_q = cli(["--quantize", "--multiscale", "--levels", "2,3"],
                  a.root, models)
        t_eval = cli(["--predict_slide", test_img,
                      "--multiscale", "--levels", "2,3", "--run_evaluation",
                      "--stride", "56", "--batch_size", "64", "--int8"],
                     a.root, models)
        report["multiscale_crop_int8"] = {
            **froc(), "seconds_quantize": round(t_q, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
            "baseline": "multiscale_crop",
        }
        print(f"[ms crop int8] → {report['multiscale_crop_int8']}",
              flush=True)
        checkpoint()

    # ---- SimCLR-initialized producer (the C12 self_supervised path) ----
    # Pretrain on the train patches (labels unused), fine-tune, and drive
    # the single-level producer from the per-strategy artifact
    # (--model_name; reference saves per-strategy at src/main.py:605).
    if "single_level_L2_simclr" not in report:
        ensure_patches()
        t_train = cli(["--train_strategy", "--strategy", "self_supervised",
                       "--patch_level", "2", "--epochs", "10",
                       "--batch_size", "32", "--config",
                       _strategy_cfg(a.root)], a.root, models)
        t_eval = cli(["--predict_slide", test_img, "--run_evaluation",
                      "--patch_level", "2", "--stride", "112",
                      "--batch_size", "128", "--model_name",
                      "resnet18_patch_classifier_self_supervised"],
                     a.root, models)
        report["single_level_L2_simclr"] = {
            **froc(), "seconds_train": round(t_train, 1),
            "seconds_predict_plus_froc": round(t_eval, 1),
            "baseline": "single_level_L2",
        }
        print(f"[L2 simclr] → {report['single_level_L2_simclr']}",
              flush=True)
        checkpoint()

    checkpoint()


if __name__ == "__main__":
    main()
