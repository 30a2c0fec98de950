"""Pipeline CLI matching the reference flag surface.

Rebuild of ``main()`` (``src/main.py:1073-1228``): every reference flag is
preserved (``--download --remote --patch --patch_level --prep --validate
--train --eval --extract_features --run_evaluation --balance_dataset
--count_tumor_patches --patch_one_slide --slide --move_files --train_strategy
--check_good_downloaded_files --strategy``), plus the stage gates
(images-downloaded / patches-extracted preconditions) and unknown-argument
rejection. New flags cover rebuilt-only capability: ``--predict_slide`` /
``--overlay`` (the sliding-window FROC producer the reference lacks),
``--data_dir`` / ``--models_dir`` to relocate artifacts, and ``--store``
to pick the PNG-compatible vs packed patch store.
"""

from __future__ import annotations

import argparse
import os
import sys

# (JAX_PLATFORMS is honored by the package __init__, which importing
# Config below executes — no duplicate guard needed here.)
from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("cli")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="hipac-tpu", description="Camelyon Dataset Processing (TPU-native)"
    )
    # --- reference flag surface (src/main.py:1074-1093) ---
    parser.add_argument("--download", action="store_true",
                        help="Download CAMELYON16 dataset")
    parser.add_argument("--base_dir", type=str, default=None,
                        help="Base directory for downloaded files "
                             "(README-documented alias of --data_dir)")
    parser.add_argument("--check_structure", action="store_true",
                        help="Check the data directory structure")
    parser.add_argument("--remote", action="store_true",
                        help="Download the full dataset (not the 1-per-class subset)")
    parser.add_argument("-p", "--patch", action="store_true",
                        help="Extract patches")
    parser.add_argument("--patch_level", type=str, default="3",
                        help="WSI level for patch extraction (0-3 or 'all')")
    parser.add_argument("-prep", "--prepare", action="store_true",
                        help="Prepare data (extract annotation zips)")
    parser.add_argument("-val", "--validation", action="store_true",
                        help="Create validation set (slide-level split is "
                             "computed on the fly; kept for flag parity)")
    parser.add_argument("--validate", action="store_true",
                        help="Validate extracted patch features (sanity check)")
    parser.add_argument("--tsne_full", action="store_true",
                        help="With --validate: run t-SNE on ALL features"
                             " (the reference's exact behavior on its 89,598"
                             " rows) instead of the default 10k subsample —"
                             " O(N log N) per iteration, can take hours at"
                             " full CAMELYON16 scale")
    parser.add_argument("-train", "--train", action="store_true",
                        help="Train ResNet model (weighted loss, 30 epochs)")
    parser.add_argument("-eval", "--evaluate", action="store_true",
                        help="Evaluate ResNet model on the validation split")
    parser.add_argument("--extract_features", action="store_true",
                        help="Extract features from patches")
    parser.add_argument("--run_evaluation", action="store_true",
                        help="Run the official CAMELYON16 FROC evaluation")
    parser.add_argument("--balance_dataset", action="store_true",
                        help="Download tumor slides and extract tumor patches")
    parser.add_argument("--count_tumor_patches", action="store_true",
                        help="Per-level tumor/normal patch census")
    parser.add_argument("--patch_one_slide", type=str, default=None,
                        help="Extract patches from a single slide (e.g. tumor_109)")
    parser.add_argument("--slide", type=str, default=None,
                        help="Slide name for single-slide operations")
    parser.add_argument("--move_files", action="store_true",
                        help="Flatten nested tumor/ patch directories")
    parser.add_argument("--train_strategy", action="store_true",
                        help="Train with a specific strategy")
    parser.add_argument("--check_good_downloaded_files", action="store_true",
                        help="Scan patch stores for corruption")
    parser.add_argument("--strategy", type=str, default="self_supervised",
                        choices=["balanced", "weighted_loss", "self_supervised"],
                        help="Training strategy")
    # --- rebuilt-only capability ---
    parser.add_argument("--predict_slide", type=str, default=None,
                        help="Sliding-window inference on one slide: writes "
                             "the detection CSV (FROC producer)")
    parser.add_argument("--overlay", action="store_true",
                        help="With --predict_slide: save the tumor heatmap "
                             "overlay at the coarsest level")
    parser.add_argument("--multiscale", action="store_true",
                        help="With --predict_slide: classify every grid "
                             "cell from all --levels magnifications at "
                             "once via the hierarchical fusion classifier "
                             "(requires a --train_multiscale artifact)")
    parser.add_argument("--ms_combine", type=str, default="auto",
                        choices=["auto", "ensemble", "fusion", "aux",
                                 "aux_base", "ensemble_base"],
                        help="With --predict_slide --multiscale: which"
                             " probability surface to report (auto = the"
                             " surface the artifact's calibration selected;"
                             " aux = the per-level-probability ensemble"
                             " baseline; aux_base = the base grid level's aux"
                             " head; ensemble_base = fusion x aux_base mix)")
    parser.add_argument("--ms_fusion", type=str, default="concat",
                        choices=["concat", "attention"],
                        help="With --train_multiscale: how the fused head"
                             " combines the per-scale trunk features"
                             " (models/hierarchical.py). Prediction"
                             " auto-detects the artifact's mode")
    parser.add_argument("--ms_input", type=str, default="resize",
                        choices=["resize", "crop"],
                        help="With --train_multiscale: how a finer level's"
                             " larger patch reaches the trunk input size."
                             " resize box-downsamples (at 448->224 this"
                             " equals the coarse level up to rounding);"
                             " crop keeps the CENTER at native"
                             " magnification (half FoV, full detail)."
                             " Prediction follows the artifact")
    parser.add_argument("--ms_components", action="store_true",
                        help="With --predict_slide --multiscale: also write"
                             " detection CSVs for the fusion-only, per-level"
                             "-aux, aux-base and ensemble-base surfaces (one"
                             " inference pass; dirs model_predictions_csv_"
                             "{fusion,aux,aux_base,ensemble_base})")
    parser.add_argument("--compile_cache_dir", type=str, default=None,
                        help="Persistent XLA compilation cache directory "
                             "(default ~/.cache/hipac-tpu/jax_cache; 'off' "
                             "disables). Cold processes re-use compiled "
                             "executables instead of re-paying "
                             "minutes-long compiles")
    parser.add_argument("--model_name", type=str,
                        default="resnet18_patch_classifier",
                        help="With --predict_slide (single-level): which "
                             "classifier artifact under models_dir drives "
                             "the producer (e.g. resnet18_patch_classifier"
                             "_self_supervised from --train_strategy, "
                             "mirroring the reference's per-strategy "
                             "artifacts, src/main.py:605)")
    parser.add_argument("--tissue_filter", choices=["host", "device"],
                        default="host",
                        help="With --predict_slide (float, single chip): "
                             "where the white-patch short-circuit runs. "
                             "'host' filters before upload (default; right "
                             "when the feed link is the bottleneck); "
                             "'device' uploads every cell and runs the "
                             "fused normalize+tissue-statistic Pallas "
                             "kernel, freeing the host's per-patch mean "
                             "pass (right on full-rate PCIe hosts with "
                             "few cores)")
    parser.add_argument("--detect_threshold", type=float, default=None,
                        help="With --predict_slide: emission floor for "
                             "detections, in probability space (default "
                             "0.05; the FROC consumer ranks and sweeps "
                             "thresholds itself, so a low floor only adds "
                             "operating points)")
    def _cascade_value(v: str):
        if v == "auto":
            return v
        try:
            f = float(v)
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"--cascade expects 'auto' or a probability in [0, 1), "
                f"got {v!r}"
            )
        if not 0.0 <= f < 1.0:
            raise argparse.ArgumentTypeError(
                f"--cascade probability must be in [0, 1), got {f}"
            )
        return f

    parser.add_argument("--cascade", type=_cascade_value, nargs="?",
                        const="auto", default=None,
                        help="With --predict_slide --multiscale: hierarchical"
                             " cascade inference — screen every tissue cell"
                             " with the base-level aux head alone and run"
                             " the fused multiscale model only on survivors"
                             " (finer-level decode skipped elsewhere)."
                             " With no value, uses the artifact's fitted"
                             " operating point (the screen floor that kept"
                             " every validation tumor cell); an explicit"
                             " probability overrides it")
    parser.add_argument("--cascade_bailout", type=float, default=None,
                        help="With --cascade: abandon the screen pass"
                             " mid-flight and run the full fused pass if"
                             " more than this fraction of probed tissue"
                             " survives the floor (the operating point is"
                             " uninformative on this slide's tissue)."
                             " Default 0.6; >= 1 disables the probe")
    parser.add_argument("--stride", type=int, default=None,
                        help="Patch-grid stride in level pixels (default: "
                             "patch size, i.e. non-overlapping). Applies to "
                             "--patch extraction and --predict_slide "
                             "inference; smaller values give overlapping "
                             "windows and denser detection grids")
    parser.add_argument("--simclr_features", action="store_true",
                        help="With --extract_features: use the SimCLR encoder")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override epoch count")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="Override global batch size (default 512)")
    parser.add_argument("--train_mil", action="store_true",
                        help="Train the attention-MIL slide classifier on "
                             "extracted features")
    parser.add_argument("--train_multiscale", action="store_true",
                        help="Train the hierarchical multiscale fusion "
                             "classifier on co-located cross-level patches")
    parser.add_argument("--levels", type=str, default="2,3",
                        help="Comma-separated pyramid levels for "
                             "--train_multiscale")
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config file (overrides defaults; the live "
                             "equivalent of the reference's dead Config/YAML)")
    parser.add_argument("--wsi_viz", type=str, default=None,
                        help="Render annotation-mask QA figures for a slide "
                             "path (the standalone visualizer)")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace around compute "
                             "stages (written under <log_dir>/profile)")
    parser.add_argument("--mine_hard_negatives", action="store_true",
                        help="Harvest high-probability false positives from "
                             "annotation-free slides into the patch store "
                             "(retrain afterwards with --train)")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="Data root (default: ./data/camelyon16)")
    parser.add_argument("--models_dir", type=str, default=None,
                        help="Model artifact dir (default: ./models_out)")
    parser.add_argument("--store", type=str, default=None,
                        choices=["png", "packed"],
                        help="Patch store format")
    parser.add_argument("--stain_norm", action="store_true",
                        help="Macenko H&E stain normalization of stored"
                             " patches during --patch (on-device)")
    parser.add_argument("--group_size", type=int, default=None,
                        help="With --predict_slide <dir>: devices per slide"
                             " group (fleet inference, one slide per group;"
                             " default all devices on one slide at a time)")
    parser.add_argument("--int8", action="store_true",
                        help="Post-training int8 (w8a8) inference for"
                             " --extract_features / --predict_slide: BN-fold"
                             " + per-channel weight quant + calibrated"
                             " activation scales (models/quantized.py)."
                             " Uses the persisted --quantize artifact when"
                             " present; falls back to lazy calibration")
    parser.add_argument("--freeze_bn", action="store_true",
                        help="Fine-tune with frozen BatchNorm statistics"
                             " (gamma/beta still train). Standard for"
                             " ImageNet/SimCLR warm starts; ~1.4x faster"
                             " train step (norms fuse into conv epilogues)")
    parser.add_argument("--qat", action="store_true",
                        help="Quantization-aware fine-tune of the trained"
                             " classifier (fake-quant int8 graph, STE"
                             " gradients); persists the resulting int8"
                             " artifact for --int8 inference")
    parser.add_argument("--quantize", action="store_true",
                        help="Calibrate int8 scales ONCE on training tissue"
                             " and persist the quantized model artifact"
                             " (quantized_resnet18.npz; with --multiscale:"
                             " quantized_hierarchical_trunk.npz) for"
                             " deterministic --int8 inference")
    parser.add_argument("--extract_impl", type=str, default="host",
                        choices=["host", "device"],
                        help="Patch extraction implementation: bounded-memory"
                             " host band streaming, or the on-device XLA"
                             " program (levels whose plane fits the budget)")
    return parser


def _reject_unknown_args(parser: argparse.ArgumentParser, argv) -> None:
    """Unknown-argument rejection (``src/main.py:1095-1100``)."""
    known = {a.dest for a in parser._actions}
    for a in parser._actions:
        known.update(s.lstrip("-").replace("-", "_") for s in a.option_strings)
    given = {
        arg.split("=")[0].lstrip("-").replace("-", "_")
        for arg in argv
        if arg.startswith("-")
    }
    unknown = given - known
    if unknown:
        log.error("Unknown command line arguments: %s", ", ".join(sorted(unknown)))
        sys.exit(1)


def setup_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Every cold CLI process otherwise re-pays full XLA compiles — measured
    431 s for one gigapixel ``--predict_slide`` pass vs its 28 s runtime
    (``docs/proofs/heatmap_report.json``, round 4). With the cache, the
    second cold process deserializes executables in seconds.

    ``path=None`` picks ``~/.cache/hipac-tpu/jax_cache`` unless the
    ``JAX_COMPILATION_CACHE_DIR`` env var already set one (which JAX
    honors on its own — we leave it alone). ``path="off"`` disables.
    Returns the directory in use, or None when disabled/deferred to env.
    """
    if path == "off":
        return None
    if path is None and os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return None  # user already configured it at the env level
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "hipac-tpu", "jax_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes >= 1 s to build, regardless of size:
        # the default 2 KiB floor skips nothing relevant here, but the
        # default min compile time would drop small-yet-hot steps
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError) as e:  # unwritable dir / old jax
        log.warning("persistent compilation cache disabled: %s", e)
        return None
    return path


def _config_from_args(args) -> Config:
    if getattr(args, "config", None):
        import json

        with open(args.config) as f:
            cfg = Config.from_dict(json.load(f))
    else:
        cfg = Config()
    data_dir = args.data_dir or args.base_dir or (
        cfg.data.data_dir
        if getattr(args, "config", None)
        else os.path.join(os.getcwd(), "data", "camelyon16")
    )
    cfg = cfg.replace(data=DataConfig(data_dir=data_dir))
    if args.store:
        cfg.data.patch_store_format = args.store
    if args.models_dir:
        cfg = cfg.replace(models_dir=args.models_dir)
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
        cfg.simclr.batch_size = args.batch_size
    if args.freeze_bn:
        cfg.train.freeze_bn = True
    return cfg


def _levels(patch_level: str) -> list[int]:
    return [0, 1, 2, 3] if patch_level == "all" else [int(patch_level)]


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    _reject_unknown_args(parser, argv)
    args = parser.parse_args(argv)
    if args.cascade_bailout is not None and args.cascade is None:
        parser.error(
            "--cascade_bailout requires --cascade (the bailout probe "
            "configures the cascade's screen pass)"
        )
    cfg = _config_from_args(args)
    setup_compilation_cache(args.compile_cache_dir)

    from ss25_hierarchical_multiscale_image_classification_tpu.io.download import (
        download_all_tumor_extract_patches,
        download_dataset,
        images_downloaded,
        patches_extracted,
        prepare_data,
    )

    if args.check_good_downloaded_files:
        from ss25_hierarchical_multiscale_image_classification_tpu.utils.structure import (
            check_good_files,
        )

        log.info("Checking downloaded files for corruption...")
        check_good_files(cfg.data.patches_dir)
        return 0

    if args.check_structure:
        from ss25_hierarchical_multiscale_image_classification_tpu.utils.structure import (
            check_structure,
        )

        check_structure(cfg.data)
        return 0

    if args.download:
        download_dataset(cfg.data, remote=args.remote)

    if args.move_files:
        from ss25_hierarchical_multiscale_image_classification_tpu.utils.structure import (
            move_files_up,
        )

        move_files_up(cfg.data.patch_level_dir(3))

    streamed_train = False
    if args.patch and args.train:
        # combined invocation: extraction STREAMS into training (epoch 0
        # trains on slides as they extract, bounded RSS; epochs 1+ are the
        # exact store-based path) — train/streaming.py
        if not images_downloaded(cfg.data):
            log.error("Images must be downloaded before extracting patches.")
            return 1
        from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
            extract_patches,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.train.streaming import (
            train_resnet_classifier_streaming,
        )

        train_level = 3 if args.patch_level == "all" else int(args.patch_level)
        for lvl in _levels(args.patch_level):
            if lvl != train_level:
                extract_patches(
                    cfg.data, level=lvl,
                    store_format=cfg.data.patch_store_format,
                    impl=args.extract_impl,
                    stain_norm=args.stain_norm or cfg.data.stain_norm,
                    stride=args.stride,
                )
        log.info("--patch --train: streaming extraction into training")
        train_resnet_classifier_streaming(
            cfg, level=train_level, epochs=args.epochs, stride=args.stride,
            batch_size=args.batch_size,
            store_format=cfg.data.patch_store_format,
            extract_impl=args.extract_impl,
            stain_norm=args.stain_norm or cfg.data.stain_norm,
        )
        streamed_train = True
    elif args.patch:
        if not images_downloaded(cfg.data):
            log.error("Images must be downloaded before extracting patches.")
            return 1
        from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
            extract_patches,
        )

        for lvl in _levels(args.patch_level):
            extract_patches(
                cfg.data,
                level=lvl,
                store_format=cfg.data.patch_store_format,
                impl=args.extract_impl,
                stain_norm=args.stain_norm or cfg.data.stain_norm,
                stride=args.stride,
            )

    if args.extract_features:
        for lvl in _levels(args.patch_level):
            if not patches_extracted(cfg.data, lvl):
                log.error(
                    "Patches must be extracted at level %d before features.", lvl
                )
                return 1
        level = 3 if args.patch_level == "all" else int(args.patch_level)
        import contextlib

        from ss25_hierarchical_multiscale_image_classification_tpu.utils.profiling import (
            trace,
        )

        prof = (
            trace(os.path.join(cfg.log_dir, "profile"))
            if args.profile
            else contextlib.nullcontext()
        )
        with prof:
            if args.simclr_features:
                from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
                    extract_features_with_simclr,
                )

                extract_features_with_simclr(cfg, level=level, int8=args.int8)
            else:
                from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
                    extract_features,
                )

                extract_features(cfg, level=level, int8=args.int8)

    if args.train and not streamed_train:
        if not images_downloaded(cfg.data):
            log.error("Images must be downloaded before training.")
            return 1
        level = int(args.patch_level) if args.patch_level != "all" else 3
        if not patches_extracted(cfg.data, level):
            log.error("Patches must be extracted before training.")
            return 1
        from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
            train_resnet_classifier,
        )

        train_resnet_classifier(cfg, level=level, epochs=args.epochs)

    if args.train_strategy:
        if not images_downloaded(cfg.data):
            log.error("Images must be downloaded before training.")
            return 1
        level = int(args.patch_level) if args.patch_level != "all" else 3
        if not patches_extracted(cfg.data, level):
            log.error("Patches must be extracted before training.")
            return 1
        from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
            train_resnet_classifier_strategic,
        )

        train_resnet_classifier_strategic(
            cfg, level=level, strategy=args.strategy, epochs=args.epochs
        )

    if args.prepare:
        prepare_data(cfg.data)

    if args.validation:
        # the split is computed deterministically on the fly; report it
        # (reference's --validation materialized a val set, main.py:1078)
        from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
            slide_level_split,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
            load_or_scan_manifest,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
        train_slides, val_slides = slide_level_split(
            manifest.slides(), cfg.data.val_fraction, cfg.data.split_seed
        )
        log.info("Validation split (level %d): %d train slides %s / "
                 "%d val slides %s", level, len(train_slides), train_slides,
                 len(val_slides), val_slides)

    if args.validate:
        level = int(args.patch_level) if args.patch_level != "all" else 3
        from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.features_eval import (
            validate_features,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.infer.features import (
            load_feature_artifacts,
        )

        feats, labels, _ = load_feature_artifacts(cfg.data.features_dir, level)
        validate_features(
            feats, labels,
            **({"tsne_max_samples": len(feats)} if args.tsne_full else {}),
        )

    if args.evaluate:
        level = int(args.patch_level) if args.patch_level != "all" else 3
        from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.classifier_eval import (
            evaluate_resnet_classifier,
        )

        evaluate_resnet_classifier(cfg, level=level)

    if args.balance_dataset:
        download_all_tumor_extract_patches(cfg.data)

    if args.count_tumor_patches:
        from ss25_hierarchical_multiscale_image_classification_tpu.utils.structure import (
            count_tumor_patches,
        )

        count_tumor_patches(cfg.data.patches_dir)

    if args.patch_one_slide:
        from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
            extract_patches,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        extract_patches(
            cfg.data, level=level, slide_filter=[args.patch_one_slide]
        )

    if args.train_mil:
        level = int(args.patch_level) if args.patch_level != "all" else 3
        from ss25_hierarchical_multiscale_image_classification_tpu.train.mil_trainer import (
            train_mil_classifier,
        )

        train_mil_classifier(cfg, level=level, epochs=args.epochs)

    if args.train_multiscale:
        from ss25_hierarchical_multiscale_image_classification_tpu.train.multiscale_trainer import (
            train_multiscale_classifier,
        )

        levels = tuple(int(v) for v in args.levels.split(","))
        train_multiscale_classifier(
            cfg, levels=levels, epochs=args.epochs, fusion=args.ms_fusion,
            input_mode=args.ms_input,
        )

    if args.qat:
        from ss25_hierarchical_multiscale_image_classification_tpu.train.qat import (
            qat_finetune,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        qat_finetune(
            cfg, level=level, epochs=args.epochs,
            batch_size=args.batch_size,
        )

    if args.quantize:
        from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
            quantize_classifier_to_artifact,
            quantize_trunk_to_artifact,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        if args.multiscale:
            quantize_trunk_to_artifact(
                cfg, levels=tuple(int(v) for v in args.levels.split(","))
            )
        else:
            quantize_classifier_to_artifact(cfg, level=level)

    if args.mine_hard_negatives:
        from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
            load_model,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.train.hard_negatives import (
            mine_hard_negatives,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        variables = load_model(
            os.path.join(cfg.models_dir, "resnet18_patch_classifier")
        )
        mine_hard_negatives(cfg, variables, level=level)

    if args.predict_slide:
        from ss25_hierarchical_multiscale_image_classification_tpu.infer.overlay import (
            render_overlay,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
            predict_and_export,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
            load_model,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        csv_dir = os.path.join(cfg.models_dir, "model_predictions_csv")
        from ss25_hierarchical_multiscale_image_classification_tpu.config import (
            DETECTION_PROB_THRESHOLD,
        )

        detect_threshold = (
            args.detect_threshold if args.detect_threshold is not None
            else DETECTION_PROB_THRESHOLD
        )

        import jax

        def _full_mesh():
            """All visible devices as a 1-D data mesh (None on one chip:
            the unsharded path avoids pointless device_put laps)."""
            if len(jax.devices()) <= 1:
                return None
            from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
                make_mesh,
            )

            return make_mesh()

        def _checked_group_size():
            group_size = args.group_size
            n_dev = len(jax.devices())
            if group_size is not None and (
                group_size < 1 or n_dev % group_size
            ):
                log.warning(
                    "--group_size %d does not divide the %d devices; "
                    "using one group", group_size, n_dev,
                )
                group_size = None
            return group_size

        if args.multiscale:
            from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
                predict_and_export_multiscale,
                predict_slide_multiscale,
            )

            ms_levels = tuple(int(v) for v in args.levels.split(","))
            variables = load_model(
                os.path.join(cfg.models_dir, "hierarchical_classifier")
            )
            ms_kw = {}
            if args.batch_size:
                ms_kw["batch_size"] = args.batch_size
            if args.stride:
                ms_kw["stride"] = args.stride
            if args.cascade is not None:
                ms_kw["cascade"] = args.cascade
                if args.cascade_bailout is not None:
                    ms_kw["cascade_bailout"] = args.cascade_bailout
            if args.int8:
                from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
                    TRUNK_ARTIFACT,
                    maybe_load_artifact,
                )

                ms_kw["qtree"] = maybe_load_artifact(
                    cfg.models_dir, TRUNK_ARTIFACT
                )
            if os.path.isdir(args.predict_slide):
                # multiscale fleet: one slide per chip group, the
                # hierarchical producer meshed within each group
                from ss25_hierarchical_multiscale_image_classification_tpu.infer.fleet import (
                    predict_slide_fleet,
                )

                paths = sorted(
                    os.path.join(args.predict_slide, f)
                    for f in os.listdir(args.predict_slide)
                    if f.endswith((".tif", ".tiff", ".wsi.npz"))
                )
                if not paths:
                    log.error("No slides in %s", args.predict_slide)
                    return 1

                if args.ms_components:
                    from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
                        slide_name,
                    )
                    from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
                        margin_detections,
                        write_detection_csv,
                    )

                    def _ms_predict(path, variables, *, mesh, **kw):
                        # the fleet calls with output="margin"; the
                        # component surfaces come back in the same space
                        scores, grid, comps = predict_slide_multiscale(
                            path, variables, levels=ms_levels, mesh=mesh,
                            combine=args.ms_combine,
                            return_components=True, **kw,
                        )
                        from ss25_hierarchical_multiscale_image_classification_tpu.infer.multiscale import (
                            COMPONENT_EXPORTS,
                        )

                        name = slide_name(os.path.basename(path))
                        for comp in COMPONENT_EXPORTS:
                            det = margin_detections(
                                comps[comp], grid, detect_threshold
                            )
                            write_detection_csv(
                                f"{csv_dir}_{comp}/{name}.csv", det
                            )
                        return scores, grid
                else:
                    def _ms_predict(path, variables, *, mesh, **kw):
                        return predict_slide_multiscale(
                            path, variables, levels=ms_levels, mesh=mesh,
                            combine=args.ms_combine, **kw,
                        )

                grids = predict_slide_fleet(
                    paths, variables, csv_dir,
                    group_size=_checked_group_size(),
                    threshold=detect_threshold,
                    predict_fn=_ms_predict, int8=args.int8, **ms_kw,
                )
                overlay_targets = grids.items() if args.overlay else ()
            else:
                prob_grid, _csv = predict_and_export_multiscale(
                    args.predict_slide, variables, csv_dir,
                    levels=ms_levels, int8=args.int8, mesh=_full_mesh(),
                    combine=args.ms_combine, threshold=detect_threshold,
                    export_components=args.ms_components,
                    **ms_kw,
                )
                overlay_targets = (
                    [(args.predict_slide, prob_grid)] if args.overlay else ()
                )
            for path, prob_grid in overlay_targets:
                out = os.path.join(
                    cfg.models_dir, "overlays",
                    os.path.basename(path) + ".overlay.png",
                )
                render_overlay(
                    path, prob_grid, save_path=out,
                    predict_level=max(ms_levels), stride=args.stride,
                )
                log.info("Overlay saved: %s", out)
        elif os.path.isdir(args.predict_slide):
            # fleet mode: every slide in the directory, one per chip group
            from ss25_hierarchical_multiscale_image_classification_tpu.infer.fleet import (
                predict_slide_fleet,
            )

            variables = load_model(
                os.path.join(cfg.models_dir, args.model_name)
            )
            paths = sorted(
                os.path.join(args.predict_slide, f)
                for f in os.listdir(args.predict_slide)
                if f.endswith((".tif", ".tiff", ".wsi.npz"))
            )
            if not paths:
                log.error("No slides in %s", args.predict_slide)
                return 1
            predict_kw = {}
            if args.batch_size:
                predict_kw["batch_size"] = args.batch_size
            if args.stride:
                predict_kw["stride"] = args.stride
            if args.int8:
                from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
                    CLASSIFIER_ARTIFACT,
                    maybe_load_artifact,
                )

                predict_kw["qtree"] = maybe_load_artifact(
                    cfg.models_dir, CLASSIFIER_ARTIFACT
                )
            grids = predict_slide_fleet(
                paths, variables, csv_dir, level=level,
                group_size=_checked_group_size(), int8=args.int8,
                threshold=detect_threshold, **predict_kw,
            )
            if args.overlay:
                for path, prob_grid in grids.items():
                    out = os.path.join(
                        cfg.models_dir, "overlays",
                        os.path.basename(path) + ".overlay.png",
                    )
                    render_overlay(
                        path, prob_grid, save_path=out,
                        predict_level=level, stride=args.stride,
                    )
                    log.info("Overlay saved: %s", out)
        else:
            variables = load_model(
                os.path.join(cfg.models_dir, args.model_name)
            )
            predict_kw = {}
            if args.batch_size:
                predict_kw["batch_size"] = args.batch_size
            if args.stride:
                predict_kw["stride"] = args.stride
            pred_mesh = _full_mesh()
            if args.tissue_filter == "device":
                if args.int8 or pred_mesh is not None:
                    log.warning(
                        "--tissue_filter device is the float single-chip "
                        "path (int8 folds normalize into the stem; meshes "
                        "replicate the pallas_call) — using host filtering"
                    )
                else:
                    predict_kw["tissue_filter"] = "device"
            if args.int8:
                from ss25_hierarchical_multiscale_image_classification_tpu.models.quant_artifact import (
                    CLASSIFIER_ARTIFACT,
                    maybe_load_artifact,
                )

                predict_kw["qtree"] = maybe_load_artifact(
                    cfg.models_dir, CLASSIFIER_ARTIFACT
                )
            prob_grid, _csv = predict_and_export(
                args.predict_slide, variables, csv_dir, level=level,
                int8=args.int8, mesh=pred_mesh,
                threshold=detect_threshold, **predict_kw,
            )
            if args.overlay:
                out = os.path.join(
                    cfg.models_dir,
                    "overlays",
                    os.path.basename(args.predict_slide) + ".overlay.png",
                )
                render_overlay(
                    args.predict_slide, prob_grid, save_path=out,
                    predict_level=level, stride=args.stride,
                )
                log.info("Overlay saved: %s", out)

    if args.wsi_viz:
        from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
            annotation_path_for,
            slide_name,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.visualization import (
            visualize_and_save_wsi,
        )

        level = int(args.patch_level) if args.patch_level != "all" else 3
        name = slide_name(os.path.basename(args.wsi_viz))
        visualize_and_save_wsi(
            args.wsi_viz,
            annotation_path_for(cfg.data, name),
            os.path.join(cfg.models_dir, "wsi_viz", name),
            level=level,
        )

    if args.run_evaluation:
        log.info("Running CAMELYON16 evaluation script.")
        mask_dir = os.path.join(cfg.data.data_dir, "test", "mask")
        csv_dir = os.path.join(cfg.models_dir, "model_predictions_csv")
        if not os.path.exists(mask_dir):
            log.error("Evaluation mask folder '%s' not found.", mask_dir)
            return 1
        if not os.path.exists(csv_dir):
            log.error("Model results folder '%s' not found.", csv_dir)
            return 1
        from ss25_hierarchical_multiscale_image_classification_tpu.evaluation.froc import (
            run_froc_evaluation,
        )

        run_froc_evaluation(
            csv_dir,
            mask_dir,
            plot_path=os.path.join(cfg.models_dir, "froc_curve.png"),
        )

    return 0


if __name__ == "__main__":
    sys.exit(main())
