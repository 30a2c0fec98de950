"""Data-parallel patch-classifier training.

TPU rebuild of the reference trainers:

- :func:`train_resnet_classifier` — the 30-epoch weighted-loss default
  (``src/main.py:472-534``): Adam lr=1e-4, class weights (1/count)/min,
  per-epoch validation accuracy, checkpoint every 10 epochs + final.
- :func:`train_resnet_classifier_strategic` — the 5-epoch strategy trainer
  (``src/main.py:536-606``): ``balanced`` (balanced sampling + plain CE),
  ``weighted_loss`` (total/count weights), ``self_supervised`` (SimCLR
  pretrain if no encoder exists, then fine-tune). The reference's
  ``self_supervised`` branch crashes on a nonexistent kwarg
  (``main.py:558`` vs ``resnet.py:61``); the *intended* behavior —
  load-encoder + fresh head, per ``resnet.py:80-91`` — is what's built.

Execution model: ONE jitted train step over a ``Mesh`` — batch sharded on
the ``data`` axis, state replicated; XLA inserts the gradient all-reduce
over ICI (global-view SPMD replaces ``nn.DataParallel``). Augmentation runs
inside the step on device; compute is bf16 (the AMP equivalent) with f32
params and loss.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
    preprocess_batch,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    BalancedSampler,
    BatchIterator,
    PatchDataset,
    make_train_val_datasets,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
    ResNet18Classifier,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
    model_artifact_path,
    save_model,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
    class_weights_inv_min,
    class_weights_total_over_count,
    weighted_cross_entropy,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.state import (
    TrainState,
    create_train_state,
)

log = get_logger("train")


def make_train_step(class_weights, frozen_bn: bool = False) -> Callable:
    """Build the jitted SPMD train step (augment → fwd → weighted CE → bwd →
    Adam update, batch-stat update).

    ``frozen_bn`` pairs with a ``ResNet(frozen_bn=True)`` model: BatchNorm
    reads the stored running statistics (no mutable collection, stats kept
    verbatim), so every norm is a fusable conv epilogue instead of two
    extra HBM passes per layer."""
    cw = None if class_weights is None else jnp.asarray(class_weights)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, rng, imgs_u8, labels, valid):
        imgs = preprocess_batch(rng, imgs_u8, training=True)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if frozen_bn:
                logits = state.apply_fn(variables, imgs, train=True)
                updates = {"batch_stats": state.batch_stats}
            else:
                logits, updates = state.apply_fn(
                    variables, imgs, train=True, mutable=["batch_stats"],
                )
            loss = weighted_cross_entropy(logits, labels, cw, valid)
            return loss, (logits, updates)

        (loss, (logits, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        metrics = {
            "loss": loss,
            "correct": jnp.sum(
                (jnp.argmax(logits, -1) == labels) * valid
            ),
            "count": jnp.sum(valid),
        }
        return new_state, metrics

    return train_step


@functools.partial(jax.jit, static_argnames=("apply_fn",))
def eval_step(apply_fn, params, batch_stats, imgs_u8, labels, valid):
    imgs = preprocess_batch(jax.random.key(0), imgs_u8, training=False)
    logits = apply_fn(
        {"params": params, "batch_stats": batch_stats}, imgs, train=False
    )
    return {
        "correct": jnp.sum((jnp.argmax(logits, -1) == labels) * valid),
        "count": jnp.sum(valid),
    }


class Trainer:
    """Epoch-driven trainer around the jitted step."""

    def __init__(
        self,
        model,
        train_ds: PatchDataset,
        val_ds: PatchDataset | None,
        batch_size: int,
        learning_rate: float,
        class_weights=None,
        sampler=None,
        mesh=None,
        seed: int = 0,
        pretrained_variables: dict | None = None,
        frozen_bn: bool = False,
    ):
        self.model = model
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.mesh = mesh or make_mesh()
        self.batch_iter = BatchIterator(
            train_ds, batch_size, shuffle=True, seed=seed, sampler=sampler
        )
        self.val_iter = (
            BatchIterator(val_ds, batch_size, shuffle=False) if val_ds else None
        )
        tx = optax.adam(learning_rate)
        self.state = create_train_state(
            model,
            jax.random.key(seed),
            (1, train_ds.resize_to, train_ds.resize_to, 3),
            tx,
            pretrained_variables=pretrained_variables,
        )
        self.state = replicate(self.mesh, self.state)
        self.train_step = make_train_step(class_weights, frozen_bn=frozen_bn)
        self.rng = jax.random.key(seed + 1)
        self.history: list[dict] = []

    def train_epoch(self, epoch: int) -> dict:
        # Metrics stay on device until epoch end: a per-step float() fetch
        # would synchronize every step, serializing host batch gathering
        # with device compute (jit dispatch is async).
        from ss25_hierarchical_multiscale_image_classification_tpu.data.prefetch import (
            Prefetcher,
        )

        step_metrics: list[dict] = []
        t0 = time.perf_counter()
        for imgs, labels, valid in Prefetcher(self.batch_iter, depth=2):
            self.rng, step_rng = jax.random.split(self.rng)
            batch = shard_batch(
                self.mesh, (imgs, labels, valid)
            )
            self.state, metrics = self.train_step(
                self.state, step_rng, *batch
            )
            step_metrics.append(metrics)
        totals = jax.device_get(
            jax.tree.map(lambda *xs: sum(xs), *step_metrics)
        ) if step_metrics else {"loss": 0.0, "correct": 0.0, "count": 0.0}
        return {
            "epoch": epoch,
            "train_loss": float(totals["loss"]),
            "train_acc": float(totals["correct"]) / max(float(totals["count"]), 1.0),
            "steps": len(step_metrics),
            "seconds": time.perf_counter() - t0,
        }

    def evaluate(self) -> float:
        if self.val_iter is None:
            return float("nan")
        out = []
        for imgs, labels, valid in self.val_iter:
            batch = shard_batch(self.mesh, (imgs, labels, valid))
            out.append(
                eval_step(
                    self.model.apply,
                    self.state.params,
                    self.state.batch_stats,
                    *batch,
                )
            )
        if not out:
            return float("nan")
        totals = jax.device_get(jax.tree.map(lambda *xs: sum(xs), *out))
        return float(totals["correct"]) / max(float(totals["count"]), 1.0)

    def fit(
        self,
        num_epochs: int,
        checkpoint_every: int | None = None,
        checkpoint_prefix: str | None = None,
        history_path: str | None = None,
        save_best: bool = True,
    ) -> list[dict]:
        best_val = -1.0
        for epoch in range(num_epochs):
            stats = self.train_epoch(epoch)
            stats["val_acc"] = self.evaluate()
            self.history.append(stats)
            if (
                save_best
                and checkpoint_prefix
                and np.isfinite(stats["val_acc"])
                and stats["val_acc"] > best_val
            ):
                best_val = stats["val_acc"]
                save_model(f"{checkpoint_prefix}_best", self.variables())
            log.info(
                "Epoch %d/%d, Train Loss: %.4f, Train Acc: %.4f, Val Acc: %.4f (%.1fs)",
                epoch + 1, num_epochs, stats["train_loss"],
                stats["train_acc"], stats["val_acc"], stats["seconds"],
            )
            if history_path:
                self._write_history(history_path)
            if (
                checkpoint_every
                and checkpoint_prefix
                and (epoch + 1) % checkpoint_every == 0
            ):
                save_model(
                    f"{checkpoint_prefix}_epoch{epoch + 1}", self.variables()
                )
                log.info("Checkpoint saved: %s_epoch%d", checkpoint_prefix, epoch + 1)
        return self.history

    def _write_history(self, path: str) -> None:
        """Machine-readable per-epoch metrics (the observability the
        reference lacked beyond stdout prints, SURVEY.md §5)."""
        import json

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)

    def variables(self) -> dict:
        return {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
        }

    # -- true resume (the reference restarts training from scratch;
    #    SURVEY.md §5 notes it never checkpoints optimizer state) ---------
    def save_checkpoint(self, manager, epoch: int) -> None:
        """Persist the FULL train state (params + opt state + batch stats +
        step) via a ``checkpoints.CheckpointManager``."""
        manager.save(epoch, jax.device_get(self.state))

    def restore_checkpoint(self, manager) -> int | None:
        """Restore the latest full train state; returns the epoch restored
        from, or None when no checkpoint exists."""
        step = manager.latest_step()
        if step is None:
            return None
        restored = manager.restore(jax.device_get(self.state), step)
        self.state = replicate(self.mesh, restored)
        return step


# ---------------------------------------------------------------------------
# Reference entry points
# ---------------------------------------------------------------------------


def _load_datasets(cfg: Config, level: int):
    manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
    if len(manifest) == 0:
        raise FileNotFoundError(
            f"No patches at level {level} under {cfg.data.patches_dir}; "
            "run extraction first (--patch)."
        )
    return make_train_val_datasets(
        manifest,
        val_fraction=cfg.data.val_fraction,
        split_seed=cfg.data.split_seed,
        balance_val_seed=cfg.data.balance_val_seed,
    )


def train_resnet_classifier(
    cfg: Config, level: int = 3, epochs: int | None = None,
    pretrained_variables: dict | None = None,
) -> Trainer:
    """The default weighted-loss trainer (``src/main.py:472-534``).

    ``pretrained_variables`` overrides the torchvision ImageNet init —
    the streaming pipeline (``train/streaming.py``) warm-starts here from
    its extraction-overlapped first epoch."""
    log.info("Training ResNet18 classifier...")
    train_ds, val_ds = _load_datasets(cfg, level)
    weights = class_weights_inv_min(train_ds.labels, cfg.model.num_classes)
    log.info("Class weights (inv/min): %s", weights)

    from ss25_hierarchical_multiscale_image_classification_tpu.models.torch_import import (
        load_pretrained_resnet18,
    )

    pretrained = pretrained_variables or (
        load_pretrained_resnet18() if cfg.model.pretrained else None
    )
    if cfg.train.freeze_bn and pretrained is None:
        log.warning(
            "--freeze_bn without a warm start: BatchNorm will normalize "
            "with the INIT statistics (mean 0 / var 1) for the whole run — "
            "intended for fine-tuning from pretrained/SimCLR weights."
        )
    trainer = Trainer(
        ResNet18Classifier(num_classes=cfg.model.num_classes,
                           frozen_bn=cfg.train.freeze_bn),
        train_ds,
        val_ds,
        batch_size=cfg.train.batch_size,
        learning_rate=cfg.train.learning_rate,
        class_weights=weights,
        seed=cfg.train.seed,
        pretrained_variables=pretrained,
        frozen_bn=cfg.train.freeze_bn,
    )
    prefix = model_artifact_path(cfg.models_dir, "resnet18_patch_classifier")
    trainer.fit(
        epochs or cfg.train.epochs,
        checkpoint_every=cfg.train.checkpoint_every_epochs,
        checkpoint_prefix=prefix,
        history_path=os.path.join(cfg.log_dir, "train_history.json"),
    )
    save_model(prefix, trainer.variables())
    log.info("Training complete. Model saved %s.", prefix)
    return trainer


def train_resnet_classifier_strategic(
    cfg: Config,
    level: int = 3,
    strategy: str = "weighted_loss",
    epochs: int | None = None,
) -> Trainer:
    """The strategy trainer (``src/main.py:536-606``)."""
    if strategy not in ("balanced", "weighted_loss", "self_supervised"):
        raise ValueError(f"unknown strategy {strategy!r}")
    log.info("Training ResNet18 classifier with strategy=%s...", strategy)
    train_ds, val_ds = _load_datasets(cfg, level)

    weights = None
    sampler = None
    pretrained = None
    if strategy in ("weighted_loss", "self_supervised"):
        # The reference computes total/count weights before its strategy
        # branch and uses them in BOTH the weighted_loss and the
        # self_supervised criterion (main.py:549-552, 558-560, 571-572).
        weights = class_weights_total_over_count(
            train_ds.labels, cfg.model.num_classes
        )
        log.info("Class weights (total/count): %s", weights)
    if strategy == "balanced":
        sampler = BalancedSampler(train_ds.labels, seed=cfg.train.seed)
    elif strategy == "self_supervised":
        from ss25_hierarchical_multiscale_image_classification_tpu.train.checkpoints import (
            load_model,
        )
        from ss25_hierarchical_multiscale_image_classification_tpu.train.simclr_trainer import (
            pretrain_simclr,
        )

        encoder_path = model_artifact_path(cfg.models_dir, "simclr_encoder")
        if not os.path.exists(encoder_path):  # simclr resume gate, main.py:556
            pretrain_simclr(cfg, level=level)
        encoder_vars = load_model(encoder_path)
        # encoder variables are the SimCLR model's; its trunk lives under
        # "encoder" — lift it to top level for the classifier (the intended
        # load-encoder+new-head semantics of resnet.py:80-91)
        pretrained = {
            "params": encoder_vars["params"].get("encoder", {}),
            "batch_stats": encoder_vars.get("batch_stats", {}).get("encoder", {}),
        }

    trainer = Trainer(
        ResNet18Classifier(num_classes=cfg.model.num_classes,
                           frozen_bn=cfg.train.freeze_bn),
        train_ds,
        val_ds,
        batch_size=cfg.train.batch_size,
        learning_rate=cfg.train.learning_rate,
        class_weights=weights,
        sampler=sampler,
        seed=cfg.train.seed,
        pretrained_variables=pretrained,
        frozen_bn=cfg.train.freeze_bn,
    )
    prefix = model_artifact_path(
        cfg.models_dir, f"resnet18_patch_classifier_{strategy}"
    )
    trainer.fit(
        epochs or cfg.train.strategy_epochs,
        history_path=os.path.join(cfg.log_dir, f"train_history_{strategy}.json"),
    )
    save_model(prefix, trainer.variables())
    log.info("Training complete. Model saved %s.", prefix)
    return trainer
