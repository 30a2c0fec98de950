"""Torch → flax interop validated at the LOGIT level.

Round-1 VERDICT #5: the converter had only been exercised on fabricated
dicts. Here we build torchvision's exact ResNet18 graph in plain torch
(torchvision itself is not in the image), load a randomly-initialized
state dict — with ``num_batches_tracked`` entries and DataParallel
``module.`` prefixes exactly as reference checkpoints have
(``src/main.py:481-482``) — convert it, and assert the flax forward
reproduces the torch forward's logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (  # noqa: E402
    ResNet18Classifier,
    ResNet18FeatureExtractor,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.torch_import import (  # noqa: E402
    from_torch_state_dict,
)


class _BasicBlock(tnn.Module):
    """torchvision.models.resnet.BasicBlock, verbatim semantics."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNet18(tnn.Module):
    """torchvision.models.resnet18 graph (layers [2,2,2,2], fc → classes)."""

    def __init__(self, num_classes=2):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, 2, 1)
        self.layer2 = self._make_layer(128, 2, 2)
        self.layer3 = self._make_layer(256, 2, 2)
        self.layer4 = self._make_layer(512, 2, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def _make_layer(self, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes),
            )
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [_BasicBlock(planes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x, features_only=False):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        if features_only:
            return x
        return self.fc(x)


def _random_torch_model(seed=0):
    torch.manual_seed(seed)
    model = _TorchResNet18()
    # randomize BN running stats so conversion of mean/var is actually tested
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    model.eval()
    return model


@pytest.fixture(scope="module")
def torch_case():
    model = _random_torch_model()
    x = torch.randn(4, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        logits = model(x).numpy()
        feats = model(x, features_only=True).numpy()
    # state dict exactly as a reference DataParallel checkpoint stores it
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    assert any("num_batches_tracked" in k for k in sd)
    return sd, x.numpy(), logits, feats


def test_torch_logit_parity(torch_case):
    sd, x, torch_logits, _ = torch_case
    variables = from_torch_state_dict(sd)
    model = ResNet18Classifier(dtype=jnp.float32)
    imgs = jnp.asarray(x.transpose(0, 2, 3, 1))  # NCHW → NHWC
    logits = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imgs, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(logits), torch_logits, rtol=1e-3, atol=2e-4
    )


def test_torch_feature_parity(torch_case):
    sd, x, _, torch_feats = torch_case
    variables = from_torch_state_dict(sd, include_head=False)
    model = ResNet18FeatureExtractor(dtype=jnp.float32)
    imgs = jnp.asarray(x.transpose(0, 2, 3, 1))
    feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        imgs, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(feats), torch_feats, rtol=1e-3, atol=2e-4
    )


def test_converted_tree_matches_flax_init(torch_case):
    """Converted tree has exactly the structure flax init produces (no
    orphan or missing leaves → safe to feed straight into apply)."""
    sd, _, _, _ = torch_case
    variables = from_torch_state_dict(sd)
    model = ResNet18Classifier(dtype=jnp.float32)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= paths(v, prefix + (k,))
            else:
                out.add(prefix + (k, tuple(np.shape(v))))
        return out

    assert paths(variables["params"]) == paths(ref["params"])
    assert paths(variables["batch_stats"]) == paths(ref["batch_stats"])


def test_pth_checkpoint_roundtrip(torch_case, tmp_path):
    """torch.save(.pth) → load_torch_checkpoint: the reference-artifact
    migration path (resnet18_patch_classifier.pth)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.models.torch_import import (
        load_torch_checkpoint,
    )

    sd, x, torch_logits, _ = torch_case
    path = str(tmp_path / "resnet18_patch_classifier.pth")
    torch.save(sd, path)
    variables = load_torch_checkpoint(path)
    model = ResNet18Classifier(dtype=jnp.float32)
    logits = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(logits), torch_logits, rtol=1e-3, atol=2e-4
    )
