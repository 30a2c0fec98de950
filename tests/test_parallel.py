"""Mesh, shardings, multi-host feed helpers (virtual 8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from ss25_hierarchical_multiscale_image_classification_tpu.parallel.feed import (
    feed_global_batch,
    process_batch_slice,
)
from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_make_mesh_covers_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    sub = make_mesh(num_devices=4)
    assert sub.devices.size == 4


def test_shard_batch_places_rows():
    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharded = shard_batch(mesh, x)
    assert sharded.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)
    # each device holds 2 rows
    assert len(sharded.addressable_shards) == 8
    assert sharded.addressable_shards[0].data.shape == (2, 3)


def test_replicate():
    mesh = make_mesh()
    tree = {"w": np.ones((4, 4), np.float32)}
    rep = replicate(mesh, tree)
    assert rep["w"].sharding.is_fully_replicated


def test_process_batch_slice_single_process():
    s = process_batch_slice(64)
    assert (s.start, s.stop) == (0, 64)
    with pytest.raises(ValueError):
        process_batch_slice(63) if jax.process_count() > 1 else (_ for _ in ()).throw(ValueError())


def test_feed_global_batch_single_host():
    mesh = make_mesh()
    batch = {"imgs": np.arange(8 * 2, dtype=np.float32).reshape(8, 2),
             "labels": np.arange(8, dtype=np.int32)}
    fed = feed_global_batch(mesh, batch)
    assert fed["imgs"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(fed["labels"]), batch["labels"])
    assert len(fed["imgs"].addressable_shards) == 8


def test_make_mesh_multi_axis_shapes():
    """N-D meshes with explicit shapes and -1 inference (the fleet's
    (group, data) layout); invalid shapes raise."""
    import numpy as np
    import pytest

    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        group_submeshes,
        make_mesh,
    )

    mesh = make_mesh(axis_names=("group", "data"), shape=(2, 4))
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("group", "data")

    inferred = make_mesh(axis_names=("group", "data"), shape=(-1, 4))
    assert inferred.devices.shape == (2, 4)
    np.testing.assert_array_equal(
        np.vectorize(id)(inferred.devices), np.vectorize(id)(mesh.devices)
    )

    subs = group_submeshes(mesh)
    assert len(subs) == 2
    assert all(m.devices.shape == (4,) for m in subs)
    assert all(m.axis_names == ("data",) for m in subs)
    # disjoint cover of the full device set
    flat = [d for m in subs for d in m.devices]
    assert len(set(flat)) == 8

    with pytest.raises(ValueError):
        make_mesh(axis_names=("a", "b"))  # multi-axis needs a shape
    with pytest.raises(ValueError):
        make_mesh(axis_names=("a", "b"), shape=(3, 4))  # 12 != 8
    with pytest.raises(ValueError):
        make_mesh(axis_names=("a", "b"), shape=(-1, -1))
    with pytest.raises(ValueError):
        make_mesh(axis_names=("a", "b"), shape=(-1, 3))  # 8 % 3
    with pytest.raises(ValueError):
        group_submeshes(make_mesh())  # 1-D mesh has no groups


def test_multi_axis_mesh_collectives_per_axis():
    """psum over each axis of a (2, 4) mesh reduces only that axis —
    the sharding semantics the two-level fleet layout relies on."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from ss25_hierarchical_multiscale_image_classification_tpu.parallel.mesh import (
        make_mesh,
    )

    mesh = make_mesh(axis_names=("group", "data"), shape=(2, 4))
    x = jnp.arange(8.0).reshape(2, 4)

    def body(xs):
        return (
            jax.lax.psum(xs, "data"),
            jax.lax.psum(xs, "group"),
            jax.lax.psum(xs, ("group", "data")),
        )

    d, g, all_ = jax.shard_map(
        body, mesh=mesh,
        in_specs=P("group", "data"),
        out_specs=(P("group", None), P(None, "data"), P(None, None)),
    )(x)
    np.testing.assert_allclose(np.asarray(d)[:, 0], [6.0, 22.0])
    np.testing.assert_allclose(np.asarray(g)[0], [4.0, 6.0, 8.0, 10.0])
    np.testing.assert_allclose(float(np.asarray(all_)[0, 0]), 28.0)
