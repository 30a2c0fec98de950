"""Trainers: losses, SPMD train step, strategies, checkpoints."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    Config,
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data import (
    extract_patches,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    PatchDataset,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models import (
    ResNet18Classifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train import (
    Trainer,
    class_weights_inv_min,
    class_weights_total_over_count,
    weighted_cross_entropy,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    load_model,
    save_model,
)


def test_class_weights_inv_min():
    labels = np.array([0] * 90 + [1] * 10)
    w = class_weights_inv_min(labels)
    # (1/90, 1/10) / (1/90) = (1, 9)
    np.testing.assert_allclose(w, [1.0, 9.0], rtol=1e-6)


def test_class_weights_total_over_count():
    labels = np.array([0] * 90 + [1] * 10)
    w = class_weights_total_over_count(labels)
    np.testing.assert_allclose(w, [100 / 90, 10.0], rtol=1e-6)


def test_weighted_ce_matches_manual():
    logits = jnp.asarray([[2.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    labels = jnp.asarray([0, 1, 1])
    w = jnp.asarray([1.0, 3.0])
    loss = float(weighted_cross_entropy(logits, labels, w))
    p = np.exp(np.asarray(logits))
    p /= p.sum(1, keepdims=True)
    nll = -np.log(p[np.arange(3), np.asarray(labels)])
    ws = np.asarray([1.0, 3.0, 3.0])
    expected = (ws * nll).sum() / ws.sum()
    assert loss == pytest.approx(expected, rel=1e-5)


def test_weighted_ce_ignores_invalid_rows():
    logits = jnp.asarray([[2.0, 0.0], [5.0, -5.0]])
    labels = jnp.asarray([0, 1])
    full = float(weighted_cross_entropy(logits, labels, None, jnp.asarray([1.0, 0.0])))
    only_first = float(weighted_cross_entropy(logits[:1], labels[:1]))
    assert full == pytest.approx(only_first, rel=1e-6)


@pytest.fixture(scope="module")
def tiny_train_setup(synthetic_case):
    data = DataConfig(data_dir=synthetic_case)
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    ds = PatchDataset(manifest, resize_to=64)
    return ds


def test_trainer_end_to_end_smoke(tiny_train_setup):
    """Minimum end-to-end slice: synthetic patches → SPMD weighted-loss
    training steps run, metrics are sane, params change."""
    ds = tiny_train_setup
    weights = class_weights_inv_min(ds.labels)
    trainer = Trainer(
        ResNet18Classifier(dtype=jnp.float32),
        ds,
        val_ds=ds,
        batch_size=8,
        learning_rate=1e-3,
        class_weights=weights,
        seed=0,
    )
    p_before = jax.device_get(
        trainer.state.params["fc"]["kernel"]
    ).copy()
    history = trainer.fit(num_epochs=2)
    assert len(history) == 2
    for h in history:
        assert np.isfinite(h["train_loss"])
        assert 0.0 <= h["train_acc"] <= 1.0
        assert 0.0 <= h["val_acc"] <= 1.0
    p_after = jax.device_get(trainer.state.params["fc"]["kernel"])
    assert not np.allclose(p_before, p_after)


def test_trainer_runs_on_8_device_mesh(tiny_train_setup):
    """The same train step must compile and run with the batch sharded over
    all 8 virtual devices."""
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    ds = tiny_train_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(
        ResNet18Classifier(dtype=jnp.float32),
        ds,
        val_ds=None,
        batch_size=16,  # 2 per device
        learning_rate=1e-3,
        mesh=mesh,
        seed=0,
    )
    history = trainer.fit(num_epochs=1)
    assert np.isfinite(history[0]["train_loss"])


def test_model_checkpoint_roundtrip(tmp_path):
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables["batch_stats"]),
    }
    path = str(tmp_path / "ckpt" / "model")
    save_model(path, variables)
    restored = load_model(path, target=variables)
    a = jax.tree.leaves(variables)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_simclr_pretrain_one_epoch(tiny_train_setup, tmp_path):
    from ss25_hierarchical_multiscale_image_classification_tpu.train.simclr_trainer import (
        pretrain_simclr,
    )

    cfg = Config(models_dir=str(tmp_path / "models"))
    cfg.simclr.batch_size = 8
    cfg.simclr.epochs = 1
    variables = pretrain_simclr(
        cfg, dataset=tiny_train_setup, input_size=64
    )
    assert "encoder" in variables["params"]
    assert os.path.exists(os.path.join(str(tmp_path / "models"), "simclr_encoder"))


def test_simclr_pallas_loss_impl(tiny_train_setup, tmp_path):
    """The pallas loss_impl config path wires into the SimCLR step
    (interpret mode on CPU)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.train.simclr_trainer import (
        pretrain_simclr,
    )

    cfg = Config(models_dir=str(tmp_path / "models"))
    cfg.simclr.batch_size = 8
    cfg.simclr.epochs = 1
    cfg.simclr.loss_impl = "pallas"
    variables = pretrain_simclr(cfg, dataset=tiny_train_setup, input_size=64)
    assert "encoder" in variables["params"]


def test_frozen_bn_trains_affine_but_not_stats(tiny_train_setup):
    """--freeze_bn regime: BatchNorm normalizes with the stored running
    statistics even under train=True (the stats never move), while the
    BN affine (scale/bias) and every conv/fc weight still receive
    gradient updates. This is what lets XLA fuse every norm into the
    conv epilogue (see models/resnet.py ``frozen_bn``)."""
    ds = tiny_train_setup
    trainer = Trainer(
        ResNet18Classifier(dtype=jnp.float32, frozen_bn=True),
        ds,
        val_ds=ds,
        batch_size=8,
        learning_rate=1e-3,
        seed=0,
        frozen_bn=True,
    )
    stats_before = jax.device_get(trainer.state.batch_stats)
    scale_before = jax.device_get(
        trainer.state.params["stem_norm"]["scale"]
    ).copy()
    history = trainer.fit(num_epochs=1)
    assert np.isfinite(history[0]["train_loss"])

    stats_after = jax.device_get(trainer.state.batch_stats)
    flat_b = jax.tree_util.tree_leaves(stats_before)
    flat_a = jax.tree_util.tree_leaves(stats_after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    scale_after = jax.device_get(trainer.state.params["stem_norm"]["scale"])
    assert not np.allclose(scale_before, scale_after)


def test_frozen_bn_train_fwd_matches_eval_fwd():
    """With frozen_bn=True the training-mode forward is numerically the
    eval-mode forward (both read running stats): dropout-free ResNet18,
    so train=True vs train=False must agree exactly."""
    model = ResNet18Classifier(dtype=jnp.float32, frozen_bn=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    eval_logits = model.apply(variables, x, train=False)
    train_logits = model.apply(variables, x, train=True)
    np.testing.assert_allclose(
        np.asarray(train_logits), np.asarray(eval_logits), rtol=1e-6
    )
