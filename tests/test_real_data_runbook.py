"""Real-data readiness runbook (scripts/real_data_runbook.py): the plan is
correct and every stage's argv parses against the real CLI — the hermetic
half of a chain whose data half needs real slides."""

import importlib.util
import os
import sys
import types

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def runbook():
    spec = importlib.util.spec_from_file_location(
        "real_data_runbook",
        os.path.join(REPO, "scripts", "real_data_runbook.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(runbook, **kw):
    defaults = dict(
        data_dir="/data/camelyon16", models_dir="out",
        pth=runbook.TORCH_HUB_PTH, remote=False, dry_run=True,
        until="froc",
    )
    defaults.update(kw)
    return types.SimpleNamespace(**defaults)


def test_plan_covers_full_chain_in_order(runbook):
    plan = runbook.build_plan(_args(runbook))
    stages = [s for s, _ in plan]
    # verify + prep before extraction, train before features, FROC last
    assert stages[0] == "download" and stages[-1] == "froc"
    for earlier, later in [("download", "patch"), ("prep", "patch"),
                           ("patch", "train"), ("train", "features"),
                           ("features", "validate"), ("train", "froc")]:
        assert max(i for i, s in enumerate(stages) if s == earlier) < min(
            i for i, s in enumerate(stages) if s == later
        )


def test_plan_until_truncates(runbook):
    plan = runbook.build_plan(_args(runbook, until="train"))
    stages = {s for s, _ in plan}
    assert "train" in stages and "features" not in stages
    assert "froc" not in stages


def test_plan_until_pretrained_runs_the_check_it_names(runbook):
    """`--until pretrained` must include the pretrained verification stage
    (it is a real plan entry with argv=None, not a pre-patch hook — a hook
    keyed on 'patch' would be silently skipped by this truncation)."""
    plan = runbook.build_plan(_args(runbook, until="pretrained"))
    stages = [s for s, _ in plan]
    assert stages[-1] == "pretrained"
    assert next(argv for s, argv in plan if s == "pretrained") is None


def test_remote_flag_propagates(runbook):
    plan = runbook.build_plan(_args(runbook, remote=True))
    dl = next(argv for s, argv in plan if argv and "--download" in argv)
    assert "--remote" in dl
    plan = runbook.build_plan(_args(runbook, remote=False))
    dl = next(argv for s, argv in plan if argv and "--download" in argv)
    assert "--remote" not in dl


def test_every_stage_argv_parses_against_the_cli(runbook):
    """The runbook must never drift from the CLI flag surface."""
    from ss25_hierarchical_multiscale_image_classification_tpu.cli.main import (
        build_parser,
    )

    parser = build_parser()
    for _stage, argv in runbook.build_plan(_args(runbook)):
        if argv is not None:  # the pretrained sentinel has no CLI argv
            parser.parse_args(argv)  # raises on drift


def test_pretrained_check_missing_file_message(runbook, tmp_path):
    with pytest.raises(SystemExit) as e:
        runbook.check_pretrained(str(tmp_path / "nope.pth"), dry_run=False)
    assert "resnet18-f37072fd" in str(e.value)


def test_pretrained_check_converts_synthetic_pth(runbook, tmp_path):
    """With a torchvision-layout .pth present, the check converts it (the
    converter itself is logit-parity-tested in tests/test_torch_interop.py)."""
    torch = pytest.importorskip("torch")
    from tests.test_torch_interop import _random_torch_model

    path = str(tmp_path / "resnet18-f37072fd.pth")
    torch.save(_random_torch_model().state_dict(), path)
    runbook.check_pretrained(path, dry_run=False)  # must not raise


def test_dry_run_main(runbook, capsys, monkeypatch, tmp_path):
    monkeypatch.setattr(
        sys, "argv",
        ["real_data_runbook.py", "--data_dir", str(tmp_path), "--dry_run"],
    )
    assert runbook.main() == 0
    out = capsys.readouterr().out
    assert "--download" in out and "--run_evaluation" in out
    assert "would verify weights" in out


def test_plan_start_resumes_mid_chain(runbook):
    plan = runbook.build_plan(_args(runbook, start="patch", until="validate"))
    stages = [s for s, _ in plan]
    assert stages[0] == "patch" and stages[-1] == "validate"
    assert "download" not in stages and "froc" not in stages


def test_plan_epochs_override_reaches_train_stage(runbook):
    plan = runbook.build_plan(
        _args(runbook, start="train", until="train", epochs=1)
    )
    ((stage, argv),) = plan
    assert stage == "train" and "--epochs" in argv
    assert argv[argv.index("--epochs") + 1] == "1"


@pytest.fixture(scope="module")
def realistic_root(tmp_path_factory):
    """A data root whose slides use REAL-WORLD encodings: tiled BigTIFF
    with chroma-subsampled YCbCr JPEG (the CAMELYON16 production encoding)
    and a 6-level pyramid (!= the synthetic default of 4) — so day-one
    real data doesn't hit a cold decode path."""
    from ss25_hierarchical_multiscale_image_classification_tpu.io.native_lib import (
        native_available,
    )

    if not native_available():
        pytest.skip("native toolchain unavailable")
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path_factory.mktemp("realistic") / "camelyon16")
    write_synthetic_case(
        root, "tumor_001",
        tumor_spec(width=3584, height=2688, num_levels=6,
                   tissue_radii=(0.45, 0.45), seed=1),
        container="tiff", compression="jpeg_ycbcr",
    )
    write_synthetic_case(
        root, "normal_001",
        SyntheticSlideSpec(width=3584, height=2688, num_levels=6,
                           tissue_radii=(0.45, 0.45), seed=2),
        container="tiff", compression="jpeg_ycbcr",
    )
    return root


def test_ycbcr_jpeg_tiled_decode(realistic_root):
    """The production encoding decodes through the native path: correct
    geometry for a 6-level pyramid and near-lossless pixels (JPEG q90)."""
    import numpy as np

    from ss25_hierarchical_multiscale_image_classification_tpu.io.slide import (
        open_slide,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        build_pyramid,
        make_level0,
        tumor_spec,
    )

    path = os.path.join(realistic_root, "train", "img", "tumor_001.tif")
    slide = open_slide(path)
    assert slide.level_count == 6
    assert slide.level_dimensions[0] == (3584, 2688)
    assert slide.level_downsamples[5] == 32.0

    spec = tumor_spec(width=3584, height=2688, num_levels=6,
                      tissue_radii=(0.45, 0.45), seed=1)
    level0, _ = make_level0(spec)
    want = build_pyramid(level0, 6)[2]
    got = slide.read_region((0, 0), 2, slide.level_dimensions[2])
    err = np.abs(got.astype(np.float32) - want.astype(np.float32)).mean()
    assert err < 8.0, f"YCbCr JPEG roundtrip error too high: {err}"
    slide.close()


@pytest.mark.slow
def test_runbook_smoke_on_realistic_encodings(realistic_root, tmp_path):
    """CI-mode smoke: the runbook's patch→train→features→validate chain
    EXECUTES (not dry-run) against the YCbCr-JPEG 6-level root — the
    hermetic rehearsal of the real-data day-one path."""
    import subprocess

    models = str(tmp_path / "models")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "real_data_runbook.py"),
         "--data_dir", realistic_root, "--models_dir", models,
         "--start", "patch", "--until", "validate", "--epochs", "1"],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    report = os.path.join(models, "real_data_runbook_report.json")
    assert os.path.exists(report)
    import json

    stages = json.load(open(report))["stages"]
    assert [s["stage"] for s in stages] == [
        "patch", "train", "features", "validate"
    ]
    assert all(s["rc"] == 0 for s in stages)
