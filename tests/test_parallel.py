"""Parallelism tests on the virtual 8-device CPU mesh: data sharding,
spatial (model-axis) sharding numerics, mesh auto-sizing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from db_text_minimal_tpu.models import DBTextModel
from db_text_minimal_tpu.parallel import (auto_data_mesh, batch_sharding,
                                          create_mesh, replicate_state,
                                          shard_batch, spatial_sharding)


def test_auto_data_mesh_divides_batch():
    assert auto_data_mesh(8).devices.size == 8
    assert auto_data_mesh(2).devices.size == 2
    assert auto_data_mesh(6).devices.size == 6
    assert auto_data_mesh(5).devices.size == 5
    assert auto_data_mesh(3).devices.size == 3
    assert auto_data_mesh(1).devices.size == 1


def test_shard_batch_split_and_replicate_fallback():
    mesh = create_mesh(num_devices=4)
    batch = {"img": np.zeros((8, 4, 4, 3), np.float32),
             "odd": np.zeros((3, 2), np.float32),
             "image_path": ["a"] * 8}
    out = shard_batch(batch, mesh)
    assert len(out["img"].sharding.device_set) == 4
    # non-divisible leading dim -> replicated, metadata untouched
    assert out["odd"].sharding.is_fully_replicated
    assert out["image_path"] == ["a"] * 8


def test_two_d_mesh_axes():
    mesh = create_mesh(model_parallel=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_spatially_sharded_forward_matches_unsharded():
    """H-dim sharding over the model axis: XLA inserts conv halo exchanges;
    outputs must match the unsharded forward to reduction-order noise."""
    mesh = create_mesh(model_parallel=4)
    m = DBTextModel()
    x = np.random.RandomState(0).rand(2, 128, 128, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
               train=False)
    ref = np.asarray(m.apply(v, jnp.asarray(x), train=False))

    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    vs = replicate_state(v, mesh)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(vs, xs)
    assert len(out.sharding.device_set) == 8
    diff = np.abs(np.asarray(out) - ref)
    assert (diff > 1e-3).mean() < 0.001
    assert diff.max() < 0.05
