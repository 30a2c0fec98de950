"""Test harness: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding logic (data-parallel psum, SimCLR NT-Xent all-gather) is
validated on virtual CPU devices per SURVEY.md §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU: tests are hermetic
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize sets jax_platforms programmatically,
# which outranks the env var — override it back before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_case(tmp_path_factory):
    """A tiny synthetic data root with one tumor and one normal slide."""
    from ss25_hierarchical_multiscale_image_classification_tpu.io.synthetic import (
        SyntheticSlideSpec,
        tumor_spec,
        write_synthetic_case,
    )

    root = str(tmp_path_factory.mktemp("camelyon16"))
    # Sized so that the level-2 patch grid (448px patches over a 448x336
    # level) yields tissue-bearing patches despite white pad-to-grid.
    write_synthetic_case(
        root,
        "tumor_001",
        tumor_spec(width=1792, height=1344, tissue_radii=(0.45, 0.45), seed=1),
    )
    write_synthetic_case(
        root,
        "normal_001",
        SyntheticSlideSpec(
            width=1792, height=1344, tissue_radii=(0.45, 0.45), seed=2
        ),
    )
    return root
