#!/usr/bin/env python
"""Train + feature extraction (notebook-track replacement).

Mirrors ``03_train_classifier.ipynb``: weighted-loss training of the patch
classifier followed by feature extraction, with the strategy trainer and
balanced-sampling experiment reachable by flag.
"""

import argparse

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
    extract_features,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
    train_resnet_classifier,
    train_resnet_classifier_strategic,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="data/camelyon16")
    p.add_argument("--models_dir", default="models_out")
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--strategy", default=None,
                   choices=[None, "balanced", "weighted_loss", "self_supervised"])
    args = p.parse_args()

    cfg = Config(data=DataConfig(data_dir=args.data_dir),
                 models_dir=args.models_dir)
    if args.batch_size:
        cfg.train.batch_size = args.batch_size

    if args.strategy:
        train_resnet_classifier_strategic(
            cfg, level=args.level, strategy=args.strategy, epochs=args.epochs
        )
    else:
        train_resnet_classifier(cfg, level=args.level, epochs=args.epochs)

    feats = extract_features(cfg, level=args.level)
    print(f"feature matrix: {feats.shape}")


if __name__ == "__main__":
    main()
