"""SimCLR self-supervised pretraining (SPMD).

Rebuild of ``pretrain_simclr`` (``src/models/simclr.py:68-123``): 200 epochs,
batch 512, Adam lr=1e-3, NT-Xent τ=0.5, best-loss tracking with early stop
(patience 20, checked every 20 epochs), checkpoints every 50 epochs, final
``simclr_encoder`` artifact.

TPU design: the two augmented views are generated **on device** inside the
jitted step (``data/augment.simclr_two_views``); under global-view SPMD the
(2N, 2N) similarity matrix is computed on the global batch with XLA inserting
the activation all-gather over ICI — the sharded-explicit variant
(``nt_xent_loss(axis_name=...)``) is available for shard_map users.
"""

from __future__ import annotations

import functools
import time

import jax

import optax

from ss25_hierarchical_multiscale_image_classification_tpu.config import Config
from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
    simclr_two_views,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
    BatchIterator,
    PatchDataset,
)
from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
    load_or_scan_manifest,
)
from ss25_hierarchical_multiscale_image_classification_tpu.logging_utils import (
    get_logger,
)
from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
    SimCLRModel,
    nt_xent_loss,
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
from ss25_hierarchical_multiscale_image_classification_tpu.train.state import (
    create_train_state,
)

log = get_logger("train.simclr")


def make_simclr_train_step(
    temperature: float, out_size: int = 224, loss_impl: str = "xla"
):
    if loss_impl == "pallas":
        from ss25_hierarchical_multiscale_image_classification_tpu.ops.pallas.nt_xent import (
            nt_xent_loss_pallas,
        )

        loss_fn_impl = nt_xent_loss_pallas
    else:
        loss_fn_impl = nt_xent_loss

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=())
    def train_step(state, rng, imgs_u8, valid):
        v1, v2 = simclr_two_views(rng, imgs_u8, out_size=out_size)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            z1, upd = state.apply_fn(
                variables, v1, train=True, mutable=["batch_stats"]
            )
            z2, upd = state.apply_fn(
                {"params": params, "batch_stats": upd["batch_stats"]},
                v2,
                train=True,
                mutable=["batch_stats"],
            )
            # wrap-padded rows (uneven final batch) are masked out of the
            # loss mean and of every real row's NT-Xent denominator
            loss = loss_fn_impl(z1, z2, temperature, valid=valid)
            return loss, upd

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
        return new_state, loss

    return train_step


def pretrain_simclr(
    cfg: Config,
    level: int = 3,
    epochs: int | None = None,
    dataset: PatchDataset | None = None,
    input_size: int | None = None,
) -> dict:
    """Run SimCLR pretraining; returns the final encoder variables and writes
    the ``simclr_encoder`` (+``_best``, periodic) artifacts."""
    sc = cfg.simclr
    epochs = epochs or sc.epochs
    if dataset is None:
        manifest = load_or_scan_manifest(cfg.data.patches_dir, level)
        dataset = PatchDataset(manifest)
    out_size = input_size or dataset.resize_to

    mesh = make_mesh()
    model = SimCLRModel(
        projection_dim=sc.projection_dim,
        projection_hidden_dim=sc.projection_hidden_dim,
    )
    state = create_train_state(
        model,
        jax.random.key(sc.seed),
        (1, out_size, out_size, 3),
        optax.adam(sc.learning_rate),
    )
    state = replicate(mesh, state)
    train_step = make_simclr_train_step(sc.temperature, out_size, sc.loss_impl)
    batches = BatchIterator(
        dataset, sc.batch_size, shuffle=True, seed=sc.seed, drop_remainder=False
    )
    rng = jax.random.key(sc.seed + 17)

    prefix = model_artifact_path(cfg.models_dir, "simclr_encoder")
    best_loss = float("inf")
    epochs_since_best = 0

    def variables():
        return {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }

    for epoch in range(epochs):
        t0 = time.perf_counter()
        losses = []  # device scalars; fetched once per epoch (async dispatch)
        for imgs, _labels, valid in batches:
            rng, step_rng = jax.random.split(rng)
            imgs, valid = shard_batch(mesh, (imgs, valid))
            state, loss = train_step(state, step_rng, imgs, valid)
            losses.append(loss)
        epoch_loss = (
            float(sum(jax.device_get(losses))) / len(losses) if losses else 0.0
        )
        log.info(
            "SimCLR epoch %d/%d: loss %.4f (%.1fs)",
            epoch + 1, epochs, epoch_loss, time.perf_counter() - t0,
        )

        # best tracking + early stop, cadence per simclr.py:100-114
        if epoch_loss < best_loss:
            best_loss = epoch_loss
            epochs_since_best = 0
            save_model(prefix + "_best", variables())
        else:
            epochs_since_best += 1
        if (epoch + 1) % sc.checkpoint_every_epochs == 0:
            save_model(f"{prefix}_epoch{epoch + 1}", variables())
        if (
            (epoch + 1) % sc.early_stop_check_every == 0
            and epochs_since_best >= sc.early_stop_patience
        ):
            log.info("SimCLR early stop at epoch %d (best %.4f)", epoch + 1, best_loss)
            break

    final = variables()
    save_model(prefix, final)
    log.info("SimCLR pretraining complete; encoder saved %s", prefix)
    return final
