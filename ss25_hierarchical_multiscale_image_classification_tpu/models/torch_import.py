"""Torch → flax weight conversion for the ResNet18 family.

Serves two purposes:

1. **Pretrained init**: the reference initializes from torchvision's
   ImageNet-pretrained ResNet18 (``src/models/resnet.py:63-65``). When a
   torchvision checkpoint file is available, :func:`load_pretrained_resnet18`
   converts it; in hermetic environments it gates cleanly to He init.
2. **Checkpoint interop**: users migrating from the reference can load its
   ``.pth`` artifacts (``resnet18_patch_classifier.pth``,
   ``simclr_encoder.pth``) directly into this framework.

Key mapping (torchvision → this repo's flax ResNet):
    conv1 → stem_conv            bn1 → stem_norm
    layer{L}.{B}.conv{1,2} → stage{L}_block{B}.Conv_{0,1}
    layer{L}.{B}.bn{1,2}   → stage{L}_block{B}.BatchNorm_{0,1}
    layer{L}.{B}.downsample.{0,1} → stage{L}_block{B}.downsample_{conv,norm}
    fc → fc
Conv kernels transpose OIHW→HWIO; Dense kernels transpose (out,in)→(in,out).
"""

from __future__ import annotations

import os
import re
from typing import Any, Mapping

import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)

log = get_logger("models.torch_import")

_LAYER_RE = re.compile(
    r"^layer(?P<stage>\d)\.(?P<block>\d)\.(?P<rest>.+)$"
)


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_norm(dst: dict, module: tuple[str, ...], prefix: str, sd: Mapping):
    _set(dst, ("params", *module, "scale"), _to_numpy(sd[f"{prefix}.weight"]))
    _set(dst, ("params", *module, "bias"), _to_numpy(sd[f"{prefix}.bias"]))
    _set(dst, ("batch_stats", *module, "mean"),
         _to_numpy(sd[f"{prefix}.running_mean"]))
    _set(dst, ("batch_stats", *module, "var"),
         _to_numpy(sd[f"{prefix}.running_var"]))


def _convert_conv(dst: dict, module: tuple[str, ...], prefix: str, sd: Mapping):
    w = _to_numpy(sd[f"{prefix}.weight"])  # OIHW
    _set(dst, ("params", *module, "kernel"), w.transpose(2, 3, 1, 0))


def from_torch_state_dict(
    sd: Mapping[str, Any], include_head: bool = True
) -> dict:
    """Convert a torchvision-style ResNet18 state dict (possibly prefixed
    with ``module.`` by DataParallel, as reference checkpoints are —
    ``src/main.py:481-482``) into flax ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    out: dict = {"params": {}, "batch_stats": {}}

    _convert_conv(out, ("stem_conv",), "conv1", sd)
    _convert_norm(out, ("stem_norm",), "bn1", sd)

    handled_blocks = set()
    for key in sd:
        m = _LAYER_RE.match(key)
        if not m:
            continue
        stage, block = int(m.group("stage")), int(m.group("block"))
        if (stage, block) in handled_blocks:
            continue
        handled_blocks.add((stage, block))
        mod = f"stage{stage}_block{block}"
        tprefix = f"layer{stage}.{block}"
        _convert_conv(out, (mod, "Conv_0"), f"{tprefix}.conv1", sd)
        _convert_norm(out, (mod, "BatchNorm_0"), f"{tprefix}.bn1", sd)
        _convert_conv(out, (mod, "Conv_1"), f"{tprefix}.conv2", sd)
        _convert_norm(out, (mod, "BatchNorm_1"), f"{tprefix}.bn2", sd)
        if f"{tprefix}.downsample.0.weight" in sd:
            _convert_conv(out, (mod, "downsample_conv"),
                          f"{tprefix}.downsample.0", sd)
            _convert_norm(out, (mod, "downsample_norm"),
                          f"{tprefix}.downsample.1", sd)

    if include_head and "fc.weight" in sd:
        w = _to_numpy(sd["fc.weight"])  # (out, in)
        _set(out, ("params", "fc", "kernel"), w.T)
        _set(out, ("params", "fc", "bias"), _to_numpy(sd["fc.bias"]))
    return out


def load_torch_checkpoint(path: str, include_head: bool = True) -> dict:
    """Load a reference ``.pth`` checkpoint into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return from_torch_state_dict(sd, include_head=include_head)


_TORCHVISION_CACHE = os.path.expanduser("~/.cache/torch/hub/checkpoints")
_RESNET18_WEIGHTS = "resnet18-f37072fd.pth"


def load_pretrained_resnet18(include_head: bool = False) -> dict | None:
    """ImageNet-pretrained trunk when a torchvision checkpoint is available
    locally; None (→ He init) otherwise. Never touches the network."""
    path = os.path.join(_TORCHVISION_CACHE, _RESNET18_WEIGHTS)
    if not os.path.exists(path):
        log.warning(
            "No local torchvision ResNet18 weights (%s); using He init. "
            "The reference's pretrained-init semantics apply when the file "
            "is present.", path,
        )
        return None
    return load_torch_checkpoint(path, include_head=include_head)
