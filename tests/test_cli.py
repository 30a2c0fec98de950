"""CLI flag surface and end-to-end pipeline dispatch."""

import os
import shutil

import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import (
    build_parser,
    main,
)


def test_flag_surface_matches_reference():
    """Every reference flag must parse (src/main.py:1074-1093)."""
    parser = build_parser()
    args = parser.parse_args(
        [
            "--download", "--remote", "--patch", "--patch_level", "all",
            "--prepare", "--validation", "--validate", "--train",
            "--evaluate", "--extract_features", "--run_evaluation",
            "--balance_dataset", "--count_tumor_patches",
            "--patch_one_slide", "tumor_109", "--slide", "tumor_109",
            "--move_files", "--train_strategy",
            "--check_good_downloaded_files", "--strategy", "balanced",
        ]
    )
    assert args.patch_level == "all"
    assert args.strategy == "balanced"
    # short aliases
    args = parser.parse_args(["-p", "-prep", "-val", "-train", "-eval"])
    assert args.patch and args.prepare and args.validation
    assert args.train and args.evaluate


def test_unknown_argument_rejected(capsys):
    with pytest.raises(SystemExit) as exc:
        main(["--definitely_not_a_flag"])
    assert exc.value.code == 1


def test_patch_requires_download_gate(tmp_path):
    rc = main(["--patch", "--data_dir", str(tmp_path / "empty")])
    assert rc == 1


@pytest.fixture()
def pipeline_case(synthetic_case, tmp_path):
    """Copy the synthetic case so CLI runs don't pollute the session fixture."""
    root = str(tmp_path / "camelyon16")
    shutil.copytree(synthetic_case, root, ignore=shutil.ignore_patterns("patches"))
    patches = os.path.join(root, "patches")
    if os.path.isdir(patches):
        shutil.rmtree(patches)
    return root


def test_cli_full_pipeline(pipeline_case, tmp_path):
    """--patch → --train (1 epoch) → --extract_features → --validate →
    --eval all through the CLI."""
    models_dir = str(tmp_path / "models_out")
    common = ["--data_dir", pipeline_case, "--models_dir", models_dir,
              "--patch_level", "2", "--batch_size", "8"]

    assert main(["--patch"] + common) == 0
    manifest = os.path.join(
        pipeline_case, "patches", "level_2", "manifest.parquet"
    )
    assert os.path.exists(manifest)

    assert main(["--train", "--epochs", "1"] + common) == 0
    assert os.path.exists(os.path.join(models_dir, "resnet18_patch_classifier"))

    assert main(["--extract_features"] + common) == 0
    feats = np.load(
        os.path.join(pipeline_case, "features", "patch_features_2.npy")
    )
    assert feats.shape[1] == 512

    assert main(["--validate"] + common) == 0
    assert main(["--evaluate"] + common) == 0
    assert main(["--count_tumor_patches"] + common) == 0


def test_cli_config_file(tmp_path):
    """--config JSON drives the live Config (the reference's YAML was dead)."""
    import json

    from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import (
        _config_from_args,
        build_parser,
    )

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "simclr": {"epochs": 3, "batch_size": 16},
        "train": {"learning_rate": 5e-4},
        "mil": {"pooling": "mean"},
    }))
    args = build_parser().parse_args(["--config", str(cfg_path)])
    cfg = _config_from_args(args)
    assert cfg.simclr.epochs == 3
    assert cfg.simclr.batch_size == 16
    assert cfg.train.learning_rate == 5e-4
    assert cfg.mil.pooling == "mean"
    # CLI overrides still win
    args = build_parser().parse_args(
        ["--config", str(cfg_path), "--batch_size", "32"]
    )
    cfg = _config_from_args(args)
    assert cfg.train.batch_size == 32 and cfg.simclr.batch_size == 32


def test_check_structure_flag(synthetic_case, capsys):
    from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import main

    assert main(["--check_structure", "--data_dir", synthetic_case]) == 0
    # --base_dir is the README-documented alias of --data_dir
    assert main(["--check_structure", "--base_dir", synthetic_case]) == 0


def test_new_round2_flags_parse():
    """Rebuild-only capability flags: int8 inference + fleet group size."""
    parser = build_parser()
    args = parser.parse_args(
        ["--extract_features", "--int8", "--predict_slide", "slides/",
         "--group_size", "4"]
    )
    assert args.int8 and args.group_size == 4
    args = parser.parse_args(["--train"])
    assert not args.int8 and args.group_size is None
