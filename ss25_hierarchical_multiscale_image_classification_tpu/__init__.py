"""HiPAC-TPU: TPU-native hierarchical multiscale whole-slide image classification.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the reference
HiPAC pipeline (anacarsi/ss25_Hierarchical_Multiscale_Image_Classification):

- CAMELYON16 dataset acquisition and preparation
- hierarchical multiscale patch extraction (1792/896/448/224 px over pyramid
  levels 0-3) with XML tumor-annotation masking and tissue filtering
- ResNet18 patch classification under weighted-loss / balanced-sampling /
  SimCLR (NT-Xent) self-supervised training strategies
- batched feature extraction, PCA / t-SNE / logistic-regression feature
  evaluation, attention-MIL slide classification, uncertainty estimation
- full-slide sliding-window inference with tumor heatmap overlays and the
  official CAMELYON16 FROC evaluation

Designed TPU-first: SPMD data parallelism over a `jax.sharding.Mesh`,
on-device augmentation and preprocessing, bfloat16 MXU compute, Pallas
kernels for the hot fused ops, and a native C++ tile-decoding host runtime.

Import as::

    import ss25_hierarchical_multiscale_image_classification_tpu as hipac
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS at every entrypoint that imports the package
    # (CLI, examples, scripts, tests). Some site installs (e.g. the axon
    # TPU plugin's sitecustomize) set ``jax_platforms`` programmatically,
    # which outranks the environment variable — so the documented
    # ``JAX_PLATFORMS=cpu python ...`` invocation would silently
    # initialize the TPU backend anyway (and hang if the device is
    # unreachable). A config update before first backend use wins.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

from ss25_hierarchical_multiscale_image_classification_tpu.config import (  # noqa: F401
    Config,
    get_config,
)

# Subpackages are imported lazily by attribute access to keep CLI startup
# fast (jax/flax imports are deferred until a compute path is touched).
_SUBMODULES = (
    "io",
    "grid",
    "data",
    "models",
    "ops",
    "parallel",
    "train",
    "infer",
    "evaluation",
    "visualization",
    "utils",
    "cli",
)


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        module = importlib.import_module(f"{__name__}.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
