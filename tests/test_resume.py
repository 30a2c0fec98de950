"""Checkpoint/resume and download resumability-by-idempotence."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ss25_hierarchical_multiscale_image_classification_tpu.config import (
    DataConfig,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    CheckpointManager,
)


def test_full_train_state_resume(synthetic_case, tmp_path):
    """Full-state resume: params, optimizer state, AND step survive — the
    capability the reference lacks (torch.save of weights only)."""
    from ss25_hierarchical_multiscale_image_classification_tpu.data import (
        extract_patches,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train import Trainer

    data = DataConfig(data_dir=synthetic_case)
    manifest = extract_patches(data, level=2, stride=112, store_format="packed")
    ds = PatchDataset(manifest, resize_to=64)

    def make_trainer():
        return Trainer(
            ResNet18Classifier(dtype=jnp.float32), ds, None,
            batch_size=8, learning_rate=1e-3, seed=0,
        )

    trainer = make_trainer()
    trainer.fit(num_epochs=1)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    trainer.save_checkpoint(mgr, epoch=1)
    expected_step = int(jax.device_get(trainer.state.step))
    expected_fc = np.asarray(jax.device_get(trainer.state.params["fc"]["kernel"]))

    fresh = make_trainer()
    restored_epoch = fresh.restore_checkpoint(mgr)
    assert restored_epoch == 1
    assert int(jax.device_get(fresh.state.step)) == expected_step
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(fresh.state.params["fc"]["kernel"])),
        expected_fc,
    )
    # optimizer state restored too (adam mu for fc kernel is nonzero)
    mu = jax.device_get(fresh.state.opt_state[0].mu)["fc"]["kernel"]
    assert np.abs(np.asarray(mu)).max() > 0
    mgr.close()

    empty_mgr = CheckpointManager(str(tmp_path / "empty"))
    assert make_trainer().restore_checkpoint(empty_mgr) is None
    empty_mgr.close()


def test_download_skip_if_exists(tmp_path, monkeypatch):
    """Resumability-by-idempotence (``src/main.py:163-168``): existing files
    are never re-downloaded; missing ones are fetched."""
    from ss25_hierarchical_multiscale_image_classification_tpu.io import download

    data = DataConfig(data_dir=str(tmp_path / "camelyon16"))
    # pre-place the first normal slide
    os.makedirs(data.train_img_dir, exist_ok=True)
    with open(os.path.join(data.train_img_dir, "normal_001.tif"), "wb") as f:
        f.write(b"existing")

    fetched = []
    monkeypatch.setattr(
        download, "download_file",
        lambda url, dest: fetched.append(os.path.basename(dest)) or True,
    )
    download.download_dataset(data, remote=False)
    assert "normal_001.tif" not in fetched  # skipped
    assert "tumor_001.tif" in fetched
    assert "test_001.tif" in fetched
    assert "lesion_annotations.zip" in fetched


def test_stage_gates(tmp_path, synthetic_case):
    from ss25_hierarchical_multiscale_image_classification_tpu.io.download import (
        features_extracted,
        images_downloaded,
        patches_extracted,
    )

    empty = DataConfig(data_dir=str(tmp_path / "nothing"))
    assert not images_downloaded(empty)
    assert not patches_extracted(empty, 3)
    assert not features_extracted(empty, 3)

    populated = DataConfig(data_dir=synthetic_case)
    assert images_downloaded(populated)
