"""Package surface: every lazy subpackage and public re-export resolves."""

import importlib

import pytest

import ss25_hierarchical_multiscale_image_classification_tpu as hipac


def test_version_and_config():
    assert hipac.__version__
    cfg = hipac.get_config()
    assert cfg.train.batch_size == 512  # reference main.py:46


@pytest.mark.parametrize(
    "sub",
    ["io", "grid", "data", "models", "ops", "parallel", "train",
     "infer", "evaluation", "visualization", "utils", "cli"],
)
def test_lazy_subpackages_resolve(sub):
    module = getattr(hipac, sub)
    assert module is importlib.import_module(f"{hipac.__name__}.{sub}")


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        hipac.not_a_module


def test_dir_lists_subpackages():
    listing = dir(hipac)
    assert "models" in listing and "ops" in listing


def test_no_package_source_is_gitignored():
    """Guard against ignore rules swallowing package modules (round-1 advisor high).

    An unanchored ``data/`` rule once kept four implemented modules out of
    every commit; a fresh clone then failed with ModuleNotFoundError. Assert
    every .py/.cpp file under the package is tracked by git.
    """
    import pathlib
    import subprocess

    pkg_root = pathlib.Path(hipac.__file__).resolve().parent
    repo_root = pkg_root.parent
    if not (repo_root / ".git").exists():
        pytest.skip("not a git checkout")
    on_disk = {
        str(p.relative_to(repo_root))
        for p in pkg_root.rglob("*")
        if p.suffix in {".py", ".cpp", ".h"} and "__pycache__" not in p.parts
    }
    tracked = set(
        subprocess.run(
            ["git", "ls-files", "--", pkg_root.name],
            cwd=repo_root, capture_output=True, text=True, check=True,
        ).stdout.splitlines()
    )
    missing = sorted(on_disk - tracked)
    assert not missing, f"package sources not tracked by git: {missing}"
