"""Subprocess worker for the multi-host (multi-process) DCN tests.

Each process owns 2 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 4-device runtime (the JAX multi-host model used on
real TPU slices across DCN — SURVEY.md §5 distributed backend). Run by
``tests/test_multihost.py``; not a pytest module itself.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=rank
    )

    import numpy as np
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ss25_hierarchical_multiscale_image_classification_tpu.data.augment import (
        normalize,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.resnet import (
        ResNet18Classifier,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.feed import (
        feed_global_batch,
        process_batch_slice,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
        replicate,
    )

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    mesh = make_mesh()
    model = ResNet18Classifier(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    params = replicate(mesh, variables["params"])
    batch_stats = replicate(mesh, variables["batch_stats"])
    tx = optax.sgd(1e-2)
    opt_state = replicate(mesh, tx.init(variables["params"]))

    # every process loads ONLY its slice of the global batch; the data is
    # deterministic so ranks agree on what the global batch contains
    global_bs = 8
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (global_bs, 32, 32, 3), np.uint8)
    labels = (np.arange(global_bs) % 2).astype(np.int32)
    sl = process_batch_slice(global_bs)
    batch = feed_global_batch(
        mesh, {"imgs": imgs[sl], "labels": labels[sl]}
    )

    @jax.jit
    def step(params, batch_stats, opt_state, imgs_u8, labels):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                normalize(imgs_u8), train=True, mutable=["batch_stats"],
            )
            one_hot = jax.nn.one_hot(labels, 2)
            loss = optax.softmax_cross_entropy(logits, one_hot).mean()
            return loss, upd

        (loss, upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, upd["batch_stats"], opt_state, loss

    loss = None
    for _ in range(2):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, batch["imgs"], batch["labels"]
        )

    # replicated params must be bit-identical across processes after the
    # cross-process gradient all-reduce: print a digest for the parent
    leaf = np.asarray(
        jax.device_get(jax.tree_util.tree_leaves(params)[0])
    )
    digest = float(np.sum(np.abs(leaf), dtype=np.float64))
    print(f"RESULT rank={rank} loss={float(loss):.6f} digest={digest:.10e}",
          flush=True)


if __name__ == "__main__":
    main()
