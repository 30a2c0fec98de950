#!/usr/bin/env python
"""Deployment inference walkthrough: folded float, int8, and multiscale.

Beyond the notebook track: the round-2 serving paths on one synthetic
slide —

1. float (inference-folded bf16) full-slide heatmap + detection CSV;
2. the same with ``int8=True`` (w8a8 trunk, calibrated on the slide);
3. hierarchical multiscale prediction (every cell classified from all
   its magnifications at once), float and int8.

Run: ``python examples/05_deploy_inference.py [--out DIR]``
(uses whatever jax backend is available — CPU works).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hipac_example05")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.overlay import (
        render_overlay,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        predict_and_export,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        tumor_spec,
        write_synthetic_case,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.hierarchical import (
        HierarchicalPatchClassifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )

    slide = write_synthetic_case(
        a.out, "tumor_001",
        tumor_spec(width=3584, height=2688, tissue_radii=(0.45, 0.45), seed=1),
    )
    print(f"slide: {slide}")

    # 1+2: single-level producer, float then int8 (random-init weights —
    # swap in a --train checkpoint via train.checkpoints.load_model)
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = dict(model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    ))
    for int8 in (False, True):
        tag = "int8" if int8 else "float"
        probs, _csv = predict_and_export(
            slide, variables, os.path.join(a.out, f"csv_{tag}"),
            level=3, threshold=0.0, batch_size=16, int8=int8,
        )
        render_overlay(
            slide, probs,
            save_path=os.path.join(a.out, f"overlay_{tag}.png"),
        )
        print(f"{tag}: grid {probs.shape}, max prob {probs.max():.3f}")

    # 3: multiscale — every cell from levels 2 AND 3 at once
    ms = HierarchicalPatchClassifier(levels=(2, 3), dtype=jnp.float32)
    init = {lvl: jnp.zeros((1, 224, 224, 3), jnp.float32) for lvl in (2, 3)}
    ms_vars = dict(ms.init(jax.random.key(1), init, train=False))
    for int8 in (False, True):
        tag = "int8" if int8 else "float"
        probs, _grid = predict_slide_multiscale(
            slide, ms_vars, levels=(2, 3), batch_size=8, model=ms, int8=int8,
        )
        print(
            f"multiscale {tag}: grid {probs.shape}, "
            f"probs [{probs.min():.3f}, {probs.max():.3f}]"
        )
    print(f"artifacts under {a.out}")


if __name__ == "__main__":
    main()
