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
    mode = sys.argv[4] if len(sys.argv) > 4 else "dp"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=rank
    )
    if mode == "simclr":
        return simclr_allgather(rank, nproc)

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


def simclr_allgather(rank: int, nproc: int) -> None:
    """The SimCLR NT-Xent collective across PROCESS boundaries.

    NT-Xent needs the global (2N, 2N) similarity matrix, so under a mesh
    each device's projection shard must all-gather across every other
    device — on a production multi-host slice that collective is the one
    that crosses DCN (SURVEY.md §5, §7 "NT-Xent across devices"). Each
    process feeds only its slice of the projections; the meshed loss/grad
    must match a purely local (no-collective) evaluation of the full batch.
    """
    import jax
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.models.simclr import (
        nt_xent_loss,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.feed import (
        feed_global_batch,
        process_batch_slice,
    )
    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    assert jax.process_count() == nproc
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)

    n, d = 4 * n_dev, 32
    rng = np.random.default_rng(0)  # deterministic: all ranks agree
    z_i_full = rng.normal(size=(n, d)).astype(np.float32)
    z_j_full = rng.normal(size=(n, d)).astype(np.float32)
    sl = process_batch_slice(n)
    z = feed_global_batch(mesh, {"zi": z_i_full[sl], "zj": z_j_full[sl]})

    @jax.jit
    def loss_and_grad(zi, zj):
        return jax.value_and_grad(
            lambda a, b: nt_xent_loss(a, b, temperature=0.5), argnums=(0, 1)
        )(zi, zj)

    loss, (gi, gj) = loss_and_grad(z["zi"], z["zj"])

    # local reference: same math on process-local arrays, no mesh, no
    # collectives (every rank holds the full deterministic batch)
    ref_loss, (ref_gi, _ref_gj) = loss_and_grad(
        jnp.asarray(z_i_full), jnp.asarray(z_j_full)
    )

    # fetch THIS process's addressable shards of the distributed gradient
    gi_local = np.concatenate([
        np.asarray(s.data)
        for s in sorted(gi.addressable_shards, key=lambda s: s.index[0].start)
    ])
    ref_local = np.asarray(ref_gi)[sl]
    err = float(np.abs(gi_local - ref_local).max())
    digest = float(np.sum(np.abs(gi_local), dtype=np.float64))
    print(
        f"RESULT rank={rank} loss={float(loss):.6f} ref={float(ref_loss):.6f}"
        f" graderr={err:.3e} digest={digest:.10e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
