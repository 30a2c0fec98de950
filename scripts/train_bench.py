#!/usr/bin/env python
"""Training-step throughput on the real chip (device-resident batches).

Measures the two training hot loops — the weighted-CE classifier step
(reference ``src/main.py:496-511``) and the SimCLR NT-Xent step
(``src/models/simclr.py:85-98``) — as steady-state steps/s and
patches/s on one chip, with the same device-staged methodology as
``bench.py`` (the tunnel would otherwise dominate; see
docs/PERFORMANCE.md §Measurement methodology).

Usage: python scripts/train_bench.py [--batch 512] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _force(out) -> None:
    """Force device execution: fetch one scalar element of one output.

    ``jax.block_until_ready`` returns before execution completes under the
    tunneled axon platform (measured in scripts/ntxent_bench.py round 4);
    only a host fetch blocks. The device executes dispatches in order, so
    fetching from the LAST call's output implies every prior dispatch
    finished — the same methodology as bench.py.
    """
    import jax
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    if getattr(leaf, "ndim", 0):
        # device-side index first: fetching a 300 MB augmented batch over
        # the tunnel would measure the tunnel, not the kernel
        leaf = leaf.ravel()[0]
    np.asarray(leaf)

def bench_classifier(batch: int, iters: int, warmup: int = 3,
                     segments: bool = False, frozen_bn: bool = False) -> dict:
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        preprocess_batch,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.losses import (
        weighted_cross_entropy,
    )

    model = ResNet18Classifier(frozen_bn=frozen_bn)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    weights = jnp.asarray([1.0, 6.0], jnp.float32)

    def apply_train(p, bs, x):
        """fwd in training mode; frozen-BN reads stored stats verbatim."""
        if frozen_bn:
            return model.apply({"params": p, "batch_stats": bs}, x,
                               train=True), {"batch_stats": bs}
        return model.apply({"params": p, "batch_stats": bs}, x,
                           train=True, mutable=["batch_stats"])

    # donate state like the real trainer (train/trainer.py:81): without
    # donation every step writes fresh params+opt buffers (~134 MB)
    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, batch_stats, opt_state, rng, imgs_u8, labels, valid):
        def loss_fn(p):
            logits, upd = apply_train(
                p, batch_stats, preprocess_batch(rng, imgs_u8, training=True)
            )
            return weighted_cross_entropy(logits, labels, weights, valid), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), upd["batch_stats"],
            opt_state, loss,
        )

    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(
            rng.integers(0, 256, (batch, 224, 224, 3), np.uint8)
        )
        for _ in range(2)
    ]
    labels = jax.device_put((np.arange(batch) % 2).astype(np.int32))
    valid = jax.device_put(np.ones((batch,), np.float32))
    key = jax.random.key(1)

    def time_fn(fn, n):
        out = None
        for i in range(warmup):
            out = fn(i)
        _force(out)
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        _force(out)
        return (time.perf_counter() - t0) / n

    out: dict = {}
    if segments:
        # 1) augment alone
        aug = jax.jit(lambda r, x: preprocess_batch(r, x, training=True))
        dt = time_fn(lambda i: aug(key, imgs[i % 2]), iters)
        out["augment_ms"] = round(dt * 1000, 2)

        # 2) augment + fwd + loss (no bwd)
        @jax.jit
        def fwd(params, batch_stats, rng, imgs_u8, labels, valid):
            logits, _upd = apply_train(
                params, batch_stats,
                preprocess_batch(rng, imgs_u8, training=True),
            )
            return weighted_cross_entropy(logits, labels, weights, valid)

        dt = time_fn(
            lambda i: fwd(params, batch_stats, key, imgs[i % 2], labels,
                          valid),
            iters,
        )
        out["fwd_ms"] = round(dt * 1000, 2)

        # 3) + bwd (no optimizer, no donation)
        @jax.jit
        def fwd_bwd(params, batch_stats, rng, imgs_u8, labels, valid):
            def loss_fn(p):
                logits, _upd = apply_train(
                    p, batch_stats,
                    preprocess_batch(rng, imgs_u8, training=True),
                )
                return weighted_cross_entropy(logits, labels, weights, valid)

            return jax.value_and_grad(loss_fn)(params)

        dt = time_fn(
            lambda i: fwd_bwd(params, batch_stats, key, imgs[i % 2],
                              labels, valid),
            iters,
        )
        out["fwd_bwd_ms"] = round(dt * 1000, 2)

    # 4) the full donated step (steady state)
    state = [params, batch_stats, opt_state]

    def full(i):
        state[0], state[1], state[2], loss = step(
            state[0], state[1], state[2], key, imgs[i % 2], labels, valid
        )
        return loss

    dt = time_fn(full, iters)
    out["step_ms"] = round(dt * 1000, 2)
    out["patches_per_sec"] = round(batch / dt, 1)
    return out


def bench_simclr(batch: int, iters: int, warmup: int = 3,
                 segments: bool = False) -> dict:
    """Full SimCLR step: two on-device augmented views + NT-Xent fwd/bwd."""
    import jax
    import jax.numpy as jnp
    import optax

    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        simclr_two_views,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
        SimCLRModel,
        nt_xent_loss,
    )

    model = SimCLRModel()
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        train=False,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, rng, imgs_u8):
        va, vb = simclr_two_views(rng, imgs_u8)

        def loss_fn(p):
            za, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, va,
                train=True, mutable=["batch_stats"],
            )
            zb, upd = model.apply(
                {"params": p, "batch_stats": upd["batch_stats"]}, vb,
                train=True, mutable=["batch_stats"],
            )
            return nt_xent_loss(za, zb), upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), upd["batch_stats"],
            opt_state, loss,
        )

    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(
            rng.integers(0, 256, (batch, 224, 224, 3), np.uint8)
        )
        for _ in range(2)
    ]

    out: dict = {}
    if segments:
        def time_fn(fn, n):
            res = None
            for i in range(warmup):
                res = fn(i)
            _force(res)
            t0 = time.perf_counter()
            for i in range(n):
                res = fn(i)
            _force(res)
            return (time.perf_counter() - t0) / n

        key = jax.random.key(1)

        # 1) the two augmented views alone (RandomResizedCrop + flip +
        #    jitter + grayscale, twice)
        views = jax.jit(simclr_two_views)
        dt = time_fn(lambda i: views(key, imgs[i % 2]), iters)
        out["views_ms"] = round(dt * 1000, 2)

        # 2) views + both encoder/projector forwards + NT-Xent (no bwd)
        @jax.jit
        def fwd(params, batch_stats, rng, imgs_u8):
            va, vb = simclr_two_views(rng, imgs_u8)
            za, upd = model.apply(
                {"params": params, "batch_stats": batch_stats}, va,
                train=True, mutable=["batch_stats"],
            )
            zb, _ = model.apply(
                {"params": params, "batch_stats": upd["batch_stats"]}, vb,
                train=True, mutable=["batch_stats"],
            )
            return nt_xent_loss(za, zb)

        dt = time_fn(lambda i: fwd(params, batch_stats, key, imgs[i % 2]),
                     iters)
        out["fwd_ms"] = round(dt * 1000, 2)

        # 3) + bwd (no optimizer)
        @jax.jit
        def fwd_bwd(params, batch_stats, rng, imgs_u8):
            def loss_fn(p):
                va, vb = simclr_two_views(rng, imgs_u8)
                za, upd = model.apply(
                    {"params": p, "batch_stats": batch_stats}, va,
                    train=True, mutable=["batch_stats"],
                )
                zb, _ = model.apply(
                    {"params": p, "batch_stats": upd["batch_stats"]}, vb,
                    train=True, mutable=["batch_stats"],
                )
                return nt_xent_loss(za, zb)

            return jax.value_and_grad(loss_fn)(params)

        dt = time_fn(
            lambda i: fwd_bwd(params, batch_stats, key, imgs[i % 2]), iters
        )
        out["fwd_bwd_ms"] = round(dt * 1000, 2)

    for i in range(warmup):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.key(i), imgs[i % 2]
        )
    float(loss)
    t0 = time.perf_counter()
    for i in range(iters):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.key(i), imgs[i % 2]
        )
    float(loss)
    dt = time.perf_counter() - t0
    out["step_ms"] = round(dt / iters * 1000, 2)
    out["patches_per_sec"] = round(batch * iters / dt, 1)
    return out


def bench_e2e(n_patches: int, batch: int, epochs: int, root: str) -> dict:
    """END-TO-END training throughput: packed store → native OpenMP gather
    → prefetcher thread → H2D → on-device augment + fwd/bwd + Adam.

    The device-staged numbers above isolate the chip; this mode runs the
    REAL production loop (``train/trainer.Trainer``: BatchIterator over
    the packed store, depth-2 Prefetcher, sharded device_put per step) and
    reports sustained patches/s including the host feed. Epoch 1 (compile)
    is reported separately; steady state is the min over later epochs.
    Mirrors the e2e features bench (``scripts/e2e_features_bench.py``) on
    the training side — same store, same caveat: on the tunneled dev setup
    the H2D link, not the pipeline, is usually the wall (the report's
    ``approx_h2d_mb_per_s`` quantifies it per capture).
    """
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_features_bench import fabricate_store
    from ss25_hierarchical_multiscale_image_classification_tpu.data.datasets import (
        PatchDataset,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.data.manifest import (
        load_or_scan_manifest,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.train.trainer import (
        Trainer,
    )

    patches_dir = os.path.join(root, "patches")
    level = 3
    manifest = None
    if os.path.isdir(patches_dir):
        try:
            manifest = load_or_scan_manifest(patches_dir, level)
        except Exception:
            manifest = None
    if manifest is None or len(manifest) < n_patches:
        t0 = time.perf_counter()
        fabricate_store(patches_dir, n_patches, level)
        print(f"[fabricate] {n_patches} patches in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        manifest = load_or_scan_manifest(patches_dir, level)

    ds = PatchDataset(manifest)
    trainer = Trainer(
        ResNet18Classifier(),
        ds,
        None,
        batch_size=batch,
        learning_rate=1e-4,
        class_weights=np.asarray([1.0, 6.0], np.float32),
        seed=0,
    )
    epoch_stats = [trainer.train_epoch(e) for e in range(epochs)]
    steady = min(s["seconds"] for s in epoch_stats[1:]) if epochs > 1 else (
        epoch_stats[0]["seconds"]
    )
    n = len(ds)
    return {
        "n_patches": n,
        "epochs": epochs,
        "first_epoch_s": round(epoch_stats[0]["seconds"], 1),
        "steady_epoch_s": round(steady, 1),
        "sustained_patches_per_sec": round(n / steady, 1),
        "approx_h2d_mb_per_s": round(
            n * 224 * 224 * 3 / 1e6 / steady, 1
        ),
        "backend": jax.default_backend(),
        "note": "store→gather→prefetch→H2D→augment+fwd/bwd+Adam, the real "
                "Trainer loop; compare against the device-staged step rate "
                "to see the host-feed share",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--segments", action="store_true",
                    help="also time augment / fwd / fwd+bwd in isolation")
    ap.add_argument("--freeze_bn", action="store_true",
                    help="bench the frozen-BN fine-tune step (running-stat"
                         " BN in the train graph; norms fuse into conv"
                         " epilogues — the --freeze_bn CLI regime)")
    ap.add_argument("--skip_simclr", action="store_true")
    ap.add_argument("--e2e", type=int, default=0, metavar="N",
                    help="ONLY run the end-to-end mode: sustained "
                         "patches/s of the real store→train loop over a "
                         "packed store of N synthetic patches")
    ap.add_argument("--e2e_epochs", type=int, default=3)
    ap.add_argument("--e2e_root", default="/tmp/hipac_train_e2e")
    a = ap.parse_args()
    if a.e2e:
        print(json.dumps({
            "e2e_train": bench_e2e(a.e2e, a.batch, a.e2e_epochs, a.e2e_root),
            "batch": a.batch,
        }))
        return
    out = {
        "classifier_train": bench_classifier(
            a.batch, a.iters, segments=a.segments, frozen_bn=a.freeze_bn
        ),
        "batch": a.batch,
        "frozen_bn": a.freeze_bn,
    }
    if not a.skip_simclr:
        out["simclr_train"] = bench_simclr(a.batch, a.iters,
                                           segments=a.segments)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
