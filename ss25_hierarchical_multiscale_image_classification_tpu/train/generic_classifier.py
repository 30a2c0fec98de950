"""Generic image-classification harness.

TPU-native replacement for the reference's legacy ``BaseModel`` factory
(``src/models/unet/BaseModel.py:13-236``): dataset-from-arrays with a
70/15/15 train/val/test split, normalization transforms, train/eval loops
for ANY flax image classifier (UNetClassifier, ResNet, ...), and model
export. The torch→ONNX export (``BaseModel.py:225-236``) becomes
``jax.export`` StableHLO serialization — the portable-artifact analogue in
the JAX ecosystem.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
    weighted_cross_entropy,
)

log = get_logger("train.generic")


@dataclasses.dataclass
class ArrayDataset:
    """Images (N, H, W, 3) uint8 + labels (N,), split 70/15/15 like the
    reference factory (``BaseModel.py`` random_split)."""

    train_x: np.ndarray
    train_y: np.ndarray
    val_x: np.ndarray
    val_y: np.ndarray
    test_x: np.ndarray
    test_y: np.ndarray

    @classmethod
    def from_arrays(
        cls, images: np.ndarray, labels: np.ndarray, seed: int = 0
    ) -> "ArrayDataset":
        n = len(images)
        order = np.random.default_rng(seed).permutation(n)
        n_train = int(n * 0.7)
        n_val = int(n * 0.15)
        tr = order[:n_train]
        va = order[n_train : n_train + n_val]
        te = order[n_train + n_val :]
        return cls(
            images[tr], labels[tr], images[va], labels[va], images[te], labels[te]
        )


class GenericClassifierTrainer:
    """Train/evaluate any flax classifier ``model(x, train=...) -> logits``."""

    def __init__(self, model, input_shape, num_classes: int,
                 learning_rate: float = 1e-3, seed: int = 0):
        self.model = model
        self.num_classes = num_classes
        variables = model.init(
            jax.random.key(seed), jnp.zeros(input_shape, jnp.float32),
            train=False,
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self._build_steps()

    def _build_steps(self):
        model, tx = self.model, self.tx
        has_stats = bool(self.batch_stats)

        @jax.jit
        def train_step(params, batch_stats, opt_state, x, y):
            def loss_fn(p):
                variables = {"params": p}
                if has_stats:
                    variables["batch_stats"] = batch_stats
                    logits, upd = model.apply(
                        variables, x, train=True, mutable=["batch_stats"]
                    )
                    new_stats = upd["batch_stats"]
                else:
                    logits = model.apply(variables, x, train=True)
                    new_stats = batch_stats
                return weighted_cross_entropy(logits, y), (logits, new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean(jnp.argmax(logits, -1) == y)
            return params, new_stats, opt_state, loss, acc

        @jax.jit
        def eval_step(params, batch_stats, x, y):
            variables = {"params": params}
            if has_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, x, train=False)
            return jnp.sum(jnp.argmax(logits, -1) == y)

        self._train_step = train_step
        self._eval_step = eval_step

    def fit(self, ds: ArrayDataset, epochs: int = 5, batch_size: int = 64,
            seed: int = 0) -> list[dict]:
        history = []
        n = len(ds.train_x)
        for epoch in range(epochs):
            order = np.random.default_rng(seed + epoch).permutation(n)
            total, steps = 0.0, 0
            for start in range(0, n - batch_size + 1, batch_size):
                idx = order[start : start + batch_size]
                x = jnp.asarray(ds.train_x[idx], jnp.float32) / 255.0
                y = jnp.asarray(ds.train_y[idx])
                (self.params, self.batch_stats, self.opt_state,
                 loss, _acc) = self._train_step(
                    self.params, self.batch_stats, self.opt_state, x, y
                )
                total += float(loss)
                steps += 1
            val_acc = self.evaluate(ds.val_x, ds.val_y, batch_size)
            history.append(
                {"epoch": epoch, "loss": total / max(steps, 1), "val_acc": val_acc}
            )
            log.info("epoch %d: loss %.4f val_acc %.4f", epoch,
                     history[-1]["loss"], val_acc)
        return history

    def evaluate(self, images, labels, batch_size: int = 64) -> float:
        correct, count = 0.0, 0
        for start in range(0, len(images), batch_size):
            x = jnp.asarray(
                images[start : start + batch_size], jnp.float32
            ) / 255.0
            y = jnp.asarray(labels[start : start + batch_size])
            correct += float(self._eval_step(self.params, self.batch_stats, x, y))
            count += len(y)
        return correct / max(count, 1)

    def export_stablehlo(self, path: str, input_shape) -> None:
        """Serialize the inference function as portable StableHLO bytes
        (the jax.export analogue of the reference's ONNX export)."""
        model, params, batch_stats = self.model, self.params, self.batch_stats

        def infer(x):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, x, train=False)

        exported = jax.export.export(jax.jit(infer))(
            jax.ShapeDtypeStruct(input_shape, jnp.float32)
        )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(exported.serialize())
        log.info("exported StableHLO to %s", path)
