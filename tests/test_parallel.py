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
