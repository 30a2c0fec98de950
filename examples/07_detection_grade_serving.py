#!/usr/bin/env python
"""Detection-grade serving: centroid localization + hierarchical cascade.

Two round-3 capabilities that decide whether a CAMELYON16 detection
pipeline actually scores (the official FROC consumer,
``evaluation_FROC.py:134`` semantics: only the REPORTED POINT of each
detection is tested against the lesion outline):

1. **Centroid localization** (`infer/sliding_window.nms_detections`).
   A peak on a stride-s grid is quantized to ±s/2, and for lesions
   smaller than one patch footprint every overlapping patch fires — the
   argmax cell center can land outside the lesion outline entirely. The
   producer therefore reports the tumor-mass centroid of the NMS window
   (weights = probability mass above the decision boundary, restricted
   to the peak's connected component). This section reproduces the exact
   geometry that capped the 48-slide proof at 21/22 lesions and shows
   the official hit test miss with argmax centers and hit with centroids.

2. **Hierarchical cascade** (`--cascade`,
   `infer/multiscale.predict_slide_multiscale(cascade=...)`). A first
   pass screens every tissue cell with the BASE (detection-grid) level's
   aux head alone — 1/S of the fused trunk batch and none of the
   finer-magnification decode — and only survivors get the fused
   multiscale model. The artifact ships a fitted operating point (the
   screen floor that kept every validation tumor cell); this section
   demonstrates the two-pass flow and its survivor accounting on a
   synthetic slide.

Run: ``python examples/07_detection_grade_serving.py [--out DIR]``
(CPU works; everything is small).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def part1_centroid_localization() -> None:
    from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
        compute_fp_tp_probs,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.grid.pyramid import (
        PatchGrid,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        nms_detections,
    )

    print("== 1. centroid vs argmax localization ====================")
    # stride-56 level-3 grid: cell centers 448 L0 px apart, i.e. 14 px
    # apart in the level-5 evaluation mask (L0/32)
    grid = PatchGrid(level=3, width=1792, height=1792, downsample=8.0,
                     patch_size=224, stride=56)
    # a lesion occupying the INTER-CENTER GAP: no cell center inside
    em = np.zeros((56, 56), np.uint8)
    em[26:31, 33:38] = 1
    probs = np.zeros((grid.ny, grid.nx), np.float32)
    probs[0, 0] = 0.93  # strongest response; center at eval x=28
    probs[0, 1] = 0.91  # center at eval x=42

    def hit(dets):
        ps = [d[0] for d in dets]
        xs = [d[1] for d in dets]
        ys = [d[2] for d in dets]
        _fp, tp, _n, _, _ = compute_fp_tp_probs(ys, xs, ps, True, em, [],
                                                level=5)
        return float(np.max(tp)) if len(tp) else 0.0

    for label, kw in (("argmax (com_radius=0)", {"com_radius": 0}),
                      ("centroid (default)", {})):
        dets = nms_detections(probs, grid, threshold=0.5, radius_cells=1,
                              **kw)
        (p, x, y) = dets[0]
        print(f"  {label}: detection at L0 ({x}, {y}) → eval "
              f"({x // 32}, {y // 32}); official hit test: "
              f"{'HIT' if hit(dets) > 0 else 'MISS'}")


def part2_cascade(out: str) -> None:
    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        NON_TISSUE_MARGIN,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_synthetic_case,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
        HierarchicalPatchClassifier,
    )

    print("== 2. hierarchical cascade inference ======================")
    root = os.path.join(out, "data")
    write_synthetic_case(
        root, "tumor_001",
        tumor_spec(width=3584, height=2688, tissue_radii=(0.45, 0.45),
                   seed=1),
    )
    slide = os.path.join(root, "train", "img", "tumor_001.wsi.npz")

    # an untrained fusion model keeps the example fast; a real deployment
    # loads the --train_multiscale artifact, whose calibration carries the
    # fitted cascade operating point
    model = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    s = 64
    init = {lvl: jnp.zeros((1, s, s, 3), jnp.float32) for lvl in (2, 3)}
    variables = dict(
        model.init(jax.random.key(0), init, train=False, with_aux=True)
    )

    kw = dict(levels=(2, 3), stride=112, batch_size=8, model=model,
              input_size=s, output="margin", return_components=True)
    full, grid, comps = predict_slide_multiscale(slide, variables, **kw)
    tissue = comps["aux_base"] > NON_TISSUE_MARGIN
    # a floor BETWEEN two distinct screen margins near the median, so no
    # cell sits exactly on the boundary
    u = np.unique(comps["aux_base"][tissue])
    floor = float(0.5 * (u[len(u) // 2 - 1] + u[len(u) // 2]))
    # ship the operating point the way the trainer would
    variables["calibration"] = {"cascade_margin": floor}
    casc, _, ccomps = predict_slide_multiscale(
        slide, variables, cascade="auto", **kw
    )
    survived = tissue & (comps["aux_base"] >= floor)
    print(f"  grid {grid.ny}x{grid.nx}: {int(tissue.sum())} tissue cells, "
          f"{int(survived.sum())} survive the base-level screen")
    same = np.allclose(ccomps["fusion"][survived],
                       comps["fusion"][survived], atol=1e-5)
    print(f"  survivors carry the full fused values: {same}")
    carried = np.allclose(ccomps["aux_base"][tissue & ~survived],
                          comps["aux_base"][tissue & ~survived], atol=1e-5)
    print(f"  screened-out cells keep the screen margin (aux_base): "
          f"{carried}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hipac_example07")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    part1_centroid_localization()
    part2_cascade(a.out)
    print("done; artifacts under", a.out)


if __name__ == "__main__":
    main()
