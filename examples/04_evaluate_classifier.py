#!/usr/bin/env python
"""Feature/classifier evaluation (notebook-track replacement).

Mirrors ``04_evaluate_classifier.ipynb``: loads the extracted feature
artifacts, prints PCA explained variance + class means, t-SNE class means,
and logistic-regression accuracy/confusion (the reference's recorded run:
(89598, 512) features, PCA [0.7379, 0.2178], logreg 0.8661), and saves the
scatter/confusion plots.
"""

import argparse
import os

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.features_eval import (
    plot_logreg_confusion,
    plot_pca,
    plot_tsne,
    validate_features,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
    load_feature_artifacts,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="data/camelyon16")
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--out", default="examples_out/eval")
    args = p.parse_args()

    cfg = Config(data=DataConfig(data_dir=args.data_dir))
    feats, labels, _names = load_feature_artifacts(
        cfg.data.features_dir, args.level
    )
    print(f"Feature shape: {feats.shape}")
    print(f"Label distribution: "
          f"[{(labels == 0).sum()} {(labels == 1).sum()}]")

    result = validate_features(feats, labels)
    if "pca_explained_variance" in result:
        print(f"PCA explained variance: {result['pca_explained_variance']}")
        print(f"PCA class means: {result['pca_class_means']}")
    if "tsne_class_means" in result:
        print(f"t-SNE class means: {result['tsne_class_means']}")
    if "logreg_accuracy" in result:
        print(f"Logistic Regression Accuracy: {result['logreg_accuracy']:.4f}")

    os.makedirs(args.out, exist_ok=True)
    if len(feats) >= 5:
        plot_pca(feats, labels, os.path.join(args.out, "pca_patch_features.png"))
        plot_tsne(feats, labels, os.path.join(args.out, "tsne_patch_features.png"))
    if "logreg_confusion" in result:
        plot_logreg_confusion(
            result["logreg_confusion"],
            os.path.join(args.out, "logreg_confusion_matrix.png"),
        )
    print(f"plots saved under {args.out}")


if __name__ == "__main__":
    main()
