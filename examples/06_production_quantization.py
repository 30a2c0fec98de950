#!/usr/bin/env python
"""Production quantization walkthrough: persisted artifacts, QAT, and
calibrated multiscale probabilities (the round-3 deployment surface).

On one synthetic case:

1. extract + train a small classifier;
2. ``--quantize`` equivalent: calibrate ONCE on training tissue, persist
   ``quantized_resnet18.npz``, and show slide predictions are identical
   across batch sizes (deterministic serving);
3. QAT fine-tune (fake-quant graph, STE) and re-persist;
4. multiscale fusion training with per-scale aux heads → temperature +
   ensemble-weight calibration shipped inside the artifact → all five
   probability surfaces (calibrated ensemble / fusion / per-level aux /
   base-level aux / fusion×aux-base) from ONE slide pass.

Run: ``python examples/06_production_quantization.py [--out DIR]``
(CPU works; everything is small).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hipac_example06")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)

    from ss25_hierarchical_multiscale_image_classification_tpu.config import (
        Config,
        DataConfig,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        tumor_spec,
        write_synthetic_case,
    )

    root = os.path.join(a.out, "camelyon16")
    models = os.path.join(a.out, "models")
    cfg = Config(data=DataConfig(data_dir=root), models_dir=models)
    cfg.train.batch_size = 16

    print("== 1. fabricate + extract + train =========================")
    for name, spec in [
        ("tumor_001", tumor_spec(width=3584, height=2688,
                                 tissue_radii=(0.45, 0.45), seed=1)),
        ("normal_001", SyntheticSlideSpec(width=3584, height=2688,
                                          tissue_radii=(0.45, 0.45), seed=2)),
    ]:
        write_synthetic_case(root, name, spec)
    for lvl, stride in ((2, 224), (3, 112)):
        extract_patches(cfg.data, level=lvl, stride=stride,
                        store_format="packed")

    from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
        train_resnet_classifier,
    )

    trainer = train_resnet_classifier(cfg, level=3, epochs=2)
    variables = trainer.variables()

    print("== 2. persisted int8 artifact =============================")
    from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
        CLASSIFIER_ARTIFACT,
        load_quantized,
        quantize_classifier_to_artifact,
    )

    path = quantize_classifier_to_artifact(cfg, level=3)
    qtree = load_quantized(path)
    print(f"artifact: {path}")

    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
        predict_slide,
    )

    slide = os.path.join(root, "train", "img", "tumor_001.wsi.npz")
    p_a, _ = predict_slide(slide, variables, level=3, stride=112,
                           batch_size=8, int8=True, qtree=qtree)
    p_b, _ = predict_slide(slide, variables, level=3, stride=112,
                           batch_size=32, int8=True, qtree=qtree)
    print("int8 batch-size invariance:",
          bool(np.allclose(p_a, p_b, atol=1e-6)))

    print("== 3. QAT fine-tune =======================================")
    from ss25_hierarchical_multiscale_image_classification_tpu.train.qat import (
        qat_finetune,
    )

    result = qat_finetune(cfg, variables=variables, level=3, epochs=1,
                          batch_size=16, input_size=224)
    print("QAT history:", result["history"])
    print("re-persisted:", result["artifact_path"])

    print("== 4. calibrated multiscale surfaces ======================")
    from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
        predict_slide_multiscale,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
        load_model,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
        train_multiscale_classifier,
    )

    ms = train_multiscale_classifier(cfg, levels=(2, 3), epochs=2,
                                     batch_size=16)
    print("calibration:", ms["calibration"])
    ms_vars = load_model(os.path.join(models, "hierarchical_classifier"))
    probs, grid, comps = predict_slide_multiscale(
        slide, ms_vars, levels=(2, 3), stride=112, batch_size=8,
        return_components=True,
    )
    for k, v in comps.items():
        print(f"  {k}: grid {v.shape}, tumor-prob range "
              f"[{v.min():.3f}, {v.max():.3f}]")
    print("done; artifacts under", a.out)


if __name__ == "__main__":
    main()
