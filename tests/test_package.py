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
