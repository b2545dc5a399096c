"""Mesh + collectives tests on the virtual 8-device CPU mesh."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from advise_tpu.config import get_cfg
from advise_tpu.parallel import (
    BATCH_AXES,
    SYNC_AXIS,
    all_gather_cat,
    batch_shuffle,
    batch_unshuffle,
    bn_axis_names,
    build_mesh,
    mesh_shape,
    pmean_tree,
    replica_index,
)


def _mesh(sync=4):
    cfg = get_cfg()
    cfg.TPU.MESH_SYNC = sync
    return build_mesh(cfg)


def test_mesh_shape_resolution():
    cfg = get_cfg()
    cfg.TPU.MESH_SYNC = 4
    assert mesh_shape(cfg, 8) == (2, 4)
    cfg.TPU.MESH_SYNC = -1
    cfg.BN.NUM_SYNC_DEVICES = 2
    assert mesh_shape(cfg, 8) == (4, 2)
    cfg.BN.GLOBAL_SYNC = True
    assert mesh_shape(cfg, 8) == (1, 8)
    # non-divisible sync falls back to a divisor
    cfg.BN.GLOBAL_SYNC = False
    cfg.TPU.MESH_SYNC = 3
    assert mesh_shape(cfg, 8) == (4, 2)


def test_bn_axis_names():
    cfg = get_cfg()
    assert bn_axis_names(cfg) == (SYNC_AXIS,)
    cfg.BN.GLOBAL_SYNC = True
    assert bn_axis_names(cfg) == BATCH_AXES
    cfg.BN.GLOBAL_SYNC = False
    cfg.BN.NORM_TYPE = "batchnorm"
    assert bn_axis_names(cfg) == ()


def test_pmean_matches_global_mean():
    mesh = _mesh(sync=4)
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    f = shard_map(
        lambda v: pmean_tree(jnp.mean(v, axis=0)),
        mesh=mesh,
        in_specs=P(BATCH_AXES),
        out_specs=P(),
    )
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x.mean(0)), rtol=1e-6)


def test_all_gather_cat_order():
    """Gather over both axes must reproduce the global dim-0 order, so
    SimCLR negatives line up with precomputed index masks."""
    mesh = _mesh(sync=4)
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)

    f = shard_map(
        lambda v: all_gather_cat(v, BATCH_AXES),
        mesh=mesh,
        in_specs=P(BATCH_AXES),
        out_specs=P(BATCH_AXES),  # every shard returns the full array
    )
    out = np.asarray(f(x))
    # each of the 8 shards returns the full gathered array in global order
    assert out.shape == (64, 1)
    np.testing.assert_array_equal(out[:8, 0], np.arange(8))
    np.testing.assert_array_equal(out[-8:, 0], np.arange(8))


def test_all_gather_differentiable():
    """The gradient of a loss over all_gather'd features must accumulate
    contributions from every replica's loss — the semantics the reference
    hand-builds in AllGatherWithGradient (utils/distributed.py:131-155:
    bwd = allreduce-SUM of grads then slice own shard). With every replica
    computing sum(g*g)/2 on the gathered g, each shard's grad is
    world_size * x (8 replicas each contribute x)."""
    mesh = _mesh(sync=4)
    x = jnp.ones((8, 2), jnp.float32)

    def per_device(v):
        def loss(u):
            g = all_gather_cat(u, BATCH_AXES)
            return jnp.sum(g * g) / 2.0

        return jax.grad(loss)(v)

    f = shard_map(per_device, mesh=mesh, in_specs=P(BATCH_AXES), out_specs=P(BATCH_AXES))
    np.testing.assert_allclose(np.asarray(f(x)), 8.0 * np.ones((8, 2)), rtol=1e-6)


def test_replica_index_unique():
    mesh = _mesh(sync=4)
    f = shard_map(
        lambda v: (v * 0 + replica_index(BATCH_AXES)).astype(jnp.int32),
        mesh=mesh,
        in_specs=P(BATCH_AXES),
        out_specs=P(BATCH_AXES),
    )
    out = np.asarray(f(jnp.zeros((8, 1), jnp.int32)))
    assert sorted(out[:, 0].tolist()) == list(range(8))


def test_shuffle_unshuffle_roundtrip():
    mesh = _mesh(sync=4)
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)
    rng = jax.random.PRNGKey(3)

    def per_device(v):
        shuffled, perm = batch_shuffle(v, rng, SYNC_AXIS)
        return batch_unshuffle(shuffled, perm, SYNC_AXIS)

    f = shard_map(per_device, mesh=mesh, in_specs=P(BATCH_AXES), out_specs=P(BATCH_AXES))
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))


def test_shuffle_actually_permutes_across_replicas():
    mesh = _mesh(sync=4)
    # one distinct row per global batch element
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)
    rng = jax.random.PRNGKey(0)

    f = shard_map(
        lambda v: batch_shuffle(v, rng, SYNC_AXIS)[0],
        mesh=mesh,
        in_specs=P(BATCH_AXES),
        out_specs=P(BATCH_AXES),
    )
    out = np.asarray(f(x))[:, 0]
    # it is a permutation within each sync group of 4
    assert sorted(out[:4].tolist()) == [0.0, 1.0, 2.0, 3.0]
    assert sorted(out[4:].tolist()) == [4.0, 5.0, 6.0, 7.0]
    # and with this seed it is not the identity
    assert not np.array_equal(out, np.arange(8, dtype=np.float32))
