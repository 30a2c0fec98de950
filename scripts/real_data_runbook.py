#!/usr/bin/env python
"""Real-data readiness runbook: CAMELYON16 + torchvision weights → FROC.

This environment is zero-egress and has no real slides, so accuracy parity
with the reference's goldens (logreg 0.8661 on 89,598 level-3 features,
``/root/reference/src/04_evaluate_classifier.ipynb`` cell 0/5) cannot be
measured here. This script collapses that gap to ONE command the day real
data is available: it drives the full chain

    verify/download → prep → pretrained-init check → extract (all levels)
    → train (30-epoch weighted-loss, ImageNet init) → features → logreg
    sanity (golden 0.8661) → quantize → test-set detection + official FROC

with per-step preconditions, resumability (every stage is idempotent), and
a machine-readable progress report. ``--dry_run`` prints the exact
commands without executing — the hermetically testable contract
(tests/test_real_data_runbook.py).

Usage:
    python scripts/real_data_runbook.py --data_dir /data/camelyon16 \
        [--models_dir out] [--pth ~/.cache/torch/hub/checkpoints/resnet18-f37072fd.pth]
        [--remote] [--dry_run] [--until STAGE]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TORCH_HUB_PTH = os.path.expanduser(
    "~/.cache/torch/hub/checkpoints/resnet18-f37072fd.pth"
)

STAGES = ("download", "prep", "pretrained", "patch", "train", "features",
          "validate", "quantize", "froc")


def build_plan(a) -> list[tuple[str, list[str]]]:
    """The ordered (stage, CLI argv) plan. Pure — testable without data."""
    base = ["--data_dir", a.data_dir, "--models_dir", a.models_dir]
    epochs = (
        ["--epochs", str(a.epochs)] if getattr(a, "epochs", None) else []
    )
    plan = [
        ("download",
         ["--download"] + (["--remote"] if a.remote else []) + base),
        ("download", ["--check_good_downloaded_files"] + base),
        ("prep", ["--prep"] + base),
        # sentinel stage: no CLI argv — main() runs check_pretrained().
        # It must be a real plan entry so `--until pretrained` actually
        # executes the verification it names.
        ("pretrained", None),
        ("patch", ["--patch", "--patch_level", "all"] + base),
        ("train", ["--train", "--patch_level", "3"] + epochs + base),
        ("features", ["--extract_features", "--patch_level", "3"] + base),
        ("validate", ["--validate", "--patch_level", "3"] + base),
        ("quantize", ["--quantize", "--patch_level", "3"] + base),
        ("froc",
         ["--predict_slide", os.path.join(a.data_dir, "test", "img"),
          "--run_evaluation", "--patch_level", "3", "--stride", "56"]
         + base),
    ]
    start = STAGES.index(getattr(a, "start", STAGES[0]) or STAGES[0])
    until = STAGES.index(a.until)
    return [
        (s, argv) for s, argv in plan if start <= STAGES.index(s) <= until
    ]


def check_pretrained(pth_path: str, dry_run: bool) -> None:
    """The reference trains FROM torchvision ImageNet weights
    (``src/models/resnet.py:63-65``); the converter is logit-parity-tested
    (tests/test_torch_interop.py) but needs the real .pth here."""
    if dry_run:
        print(f"[pretrained] would verify weights at {pth_path}")
        return
    if not os.path.exists(pth_path):
        raise SystemExit(
            f"[pretrained] torchvision weights not found at {pth_path}.\n"
            "Download resnet18-f37072fd.pth on a connected machine:\n"
            "  https://download.pytorch.org/models/resnet18-f37072fd.pth\n"
            "and place it at that path (the trainer auto-loads it when "
            "model.pretrained=true, the default)."
        )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.torch_import import (
        load_torch_checkpoint,
    )

    variables = load_torch_checkpoint(pth_path, include_head=False)
    if variables is None:
        raise SystemExit(f"[pretrained] could not convert {pth_path}")
    print(f"[pretrained] OK: {pth_path} converts to the flax layout")
    if os.path.abspath(pth_path) != os.path.abspath(TORCH_HUB_PTH):
        print(
            f"[pretrained] NOTE: the trainer auto-loads from "
            f"{TORCH_HUB_PTH}; copy the file there so --train picks it up."
        )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--models_dir", default="models_out")
    ap.add_argument("--pth", default=TORCH_HUB_PTH)
    ap.add_argument("--remote", action="store_true",
                    help="full dataset (not the 1-per-class subset)")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--start", default=STAGES[0], choices=STAGES,
                    help="first stage to run (resume / smoke against an "
                         "already-populated data root)")
    ap.add_argument("--until", default="froc", choices=STAGES,
                    help="stop after this stage")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override --train epochs (smoke runs)")
    a = ap.parse_args(argv)

    plan = build_plan(a)
    report = {"stages": [], "dry_run": a.dry_run}
    for stage, argv in plan:
        if argv is None:  # the pretrained-weights verification stage
            check_pretrained(a.pth, a.dry_run)
            report["stages"].append({"stage": stage, "argv": None})
            continue
        cmd = [sys.executable, os.path.join(REPO, "main.py")] + argv
        if a.dry_run:
            print(f"[{stage}] {' '.join(cmd)}")
            report["stages"].append({"stage": stage, "argv": argv})
            continue
        print(f"[{stage}] running: {' '.join(argv)}")
        t0 = time.time()
        r = subprocess.run(cmd, cwd=REPO)
        dt = round(time.time() - t0, 1)
        report["stages"].append(
            {"stage": stage, "argv": argv, "rc": r.returncode,
             "seconds": dt}
        )
        if r.returncode != 0:
            print(f"[{stage}] FAILED rc={r.returncode} after {dt}s")
            break
    out = os.path.join(a.models_dir, "real_data_runbook_report.json")
    if not a.dry_run:
        os.makedirs(a.models_dir, exist_ok=True)
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0 if all(
        s.get("rc", 0) == 0 for s in report["stages"]
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
