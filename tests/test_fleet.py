"""Fleet inference: slide-per-chip-group orchestration (infer/fleet.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.data.extract import (
    slide_name,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.fleet import (
    device_groups,
    predict_slide_fleet,
)
from ss25_hierarchical_multiscale_image_classification_tpu.infer.sliding_window import (
    predict_slide,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)


@pytest.fixture(scope="module")
def classifier():
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return model, dict(variables)


def test_device_groups_partition():
    n = len(jax.devices())
    assert len(device_groups(None)) == 1
    groups = device_groups(1)
    assert len(groups) == n and all(len(g) == 1 for g in groups)
    if n % 2 == 0:
        groups = device_groups(n // 2)
        assert len(groups) == 2
        flat = [d for g in groups for d in g]
        assert flat == list(jax.devices())  # disjoint, ordered, complete
    with pytest.raises(ValueError):
        device_groups(3) if n % 3 else device_groups(n + 1)


def test_fleet_matches_single_slide_path(synthetic_case, classifier, tmp_path):
    """Grouped fleet inference reproduces the per-slide prob grids and
    writes one CSV per slide."""
    model, variables = classifier
    img_dir = os.path.join(synthetic_case, "train", "img")
    paths = sorted(
        os.path.join(img_dir, f)
        for f in os.listdir(img_dir)
        if f.endswith(".wsi.npz")
    )
    assert len(paths) >= 2

    n = len(jax.devices())
    group_size = max(1, n // 2)
    csv_dir = str(tmp_path / "csv")
    grids = predict_slide_fleet(
        paths, variables, csv_dir, level=3, group_size=group_size,
        batch_size=8, model=model, input_size=64, threshold=0.0,
    )
    assert set(grids) == set(paths)

    for path in paths:
        ref, _ = predict_slide(
            path, variables, level=3, batch_size=8, model=model, input_size=64
        )
        np.testing.assert_allclose(grids[path], ref, rtol=1e-4, atol=1e-5)
        name = slide_name(os.path.basename(path))
        assert os.path.exists(os.path.join(csv_dir, f"{name}.csv"))


def test_fleet_surfaces_errors(classifier, tmp_path):
    model, variables = classifier
    with pytest.raises(RuntimeError):
        predict_slide_fleet(
            [str(tmp_path / "missing.tif")], variables, str(tmp_path / "csv"),
            model=model,
        )
