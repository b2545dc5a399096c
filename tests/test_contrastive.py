"""Contrastive engine tests: all five algorithms run a real SPMD train
step on the 8-device mesh; state invariants (EMA, queue ring, memory
scatter, Sinkhorn constraints) verified."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine import contrastive as C
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import BATCH_AXES, build_mesh
from advise_tpu.solver import build_tx


def _cfg(ctype, **over):
    cfg = get_cfg()
    cfg.TASK = "contrastive"
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "slow"
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.CONTRASTIVE.TYPE = ctype
    cfg.CONTRASTIVE.DIM = 16
    cfg.CONTRASTIVE.MLP_DIM = 32
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.QUEUE_LEN = 64
    cfg.CONTRASTIVE.LENGTH = 32
    cfg.CONTRASTIVE.KNN_ON = True
    cfg.CONTRASTIVE.PREDICTOR_DEPTHS = [2] if ctype == "byol" else []
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.TRAIN_CROP_NUM_TEMPORAL = 2  # = NUM_CLIP (reference tie)
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.NUM_WORLDS = 8
    for k, v in over.items():
        sec, key = k.split(".")
        cfg[sec][key] = v
    return assert_and_infer_cfg(cfg)


def _setup(cfg):
    mesh = build_mesh(cfg)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    sample = jnp.zeros((2, 2, 16, 16, 3), jnp.float32)
    variables = jax.jit(
        lambda: model_init.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            sample,
            train=False,
        )
    )()
    bundle = build_tx(cfg, variables["params"])
    ssl = C.init_ssl_state(
        cfg, variables["params"], variables.get("batch_stats", {}),
        jax.random.PRNGKey(7),
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=bundle.tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ssl=ssl,
    )
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    return mesh, model, state, step


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    clips = jnp.asarray(
        rng.normal(size=(8, 2, 2, 16, 16, 3)).astype(np.float32)
    )
    infos = {"item_id": jnp.asarray(np.arange(8, dtype=np.int64))}
    return clips, infos


@pytest.mark.parametrize("ctype", ["byol", "moco", "simclr", "swav", "mem"])
def test_algorithm_step_runs_and_loss_finite(ctype):
    cfg = _cfg(ctype)
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.5),
    )
    loss_key = [k for k in stats if k.startswith("loss")][0]
    assert np.isfinite(float(stats[loss_key])), stats
    assert int(state.step) == 1
    # params actually moved
    assert float(stats["grad_norm"]) > 0


def test_byol_ema_moves_toward_params():
    cfg = _cfg("byol")
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    p0 = jax.tree_util.tree_leaves(state.ssl["ema_params"])[0].copy()
    for i in range(2):
        state, _ = step(
            state, clips, infos, jax.random.PRNGKey(i), jnp.float32(1e-2),
            jnp.float32(0.0),
        )
    p1 = jax.tree_util.tree_leaves(state.ssl["ema_params"])[0]
    # EMA changed (momentum 0.5 default -> should track params quickly)
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_moco_queue_ring_advances():
    cfg = _cfg("moco")
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    q0 = np.asarray(state.ssl["queue_x"])
    state, _ = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.0),
    )
    q1 = np.asarray(state.ssl["queue_x"])
    assert int(state.ssl["ptr"]) == 8  # global batch of keys enqueued
    assert not np.allclose(q0[:8], q1[:8])  # first slots overwritten
    np.testing.assert_array_equal(q0[8:], q1[8:])  # rest untouched
    # enqueued keys are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(q1[:8], axis=1), 1.0, atol=1e-4
    )


def test_mem_bank_updates_at_indices():
    cfg = _cfg("mem")
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    m0 = np.asarray(state.ssl["memory"])
    state, _ = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.0),
    )
    m1 = np.asarray(state.ssl["memory"])
    changed = ~np.all(np.isclose(m0, m1), axis=(1, 2))
    assert set(np.where(changed)[0]) == set(range(8))  # exactly our items


def test_sinkhorn_constraints():
    cfg = _cfg("swav")
    mesh = build_mesh(cfg)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(np.exp(rng.normal(size=(16, 10))).astype(np.float32))

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    f = shard_map(
        lambda s: C.sinkhorn(s, iters=3, axes=BATCH_AXES),
        mesh=mesh,
        in_specs=P(BATCH_AXES),
        out_specs=P(BATCH_AXES),
        check_vma=False,
    )
    Q = np.asarray(f(scores))
    # each row is a distribution over prototypes (final col-normalization)
    np.testing.assert_allclose(Q.sum(axis=1), 1.0, atol=1e-4)
    assert (Q >= 0).all()


def test_knn_memory_updates():
    cfg = _cfg("byol")
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    k0 = np.asarray(state.ssl["knn_mem"])
    state, _ = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.0),
    )
    k1 = np.asarray(state.ssl["knn_mem"])
    changed = ~np.all(np.isclose(k0, k1), axis=1)
    assert set(np.where(changed)[0]) == set(range(8))
    # eval_knn returns topk
    yd, yi = C.eval_knn(state.ssl, jnp.asarray(k1[:4]), knn_k=5)
    assert yd.shape == (4, 5)
    # nearest neighbor of a bank vector is itself
    assert (np.asarray(yi[:, 0]) == np.arange(4)).all()


def test_knn_probe_separable_clusters():
    """knn_probe classifies cleanly separable bank clusters perfectly."""
    import jax.numpy as jnp

    bank = np.concatenate(
        [np.tile([1.0, 0.0], (10, 1)), np.tile([0.0, 1.0], (10, 1))]
    ).astype(np.float32)
    ssl = {"knn_mem": jnp.asarray(bank)}
    labels_bank = jnp.asarray([0] * 10 + [1] * 10)
    feats = jnp.asarray([[0.9, 0.1], [0.1, 0.9]], jnp.float32)
    acc = C.knn_probe(None, ssl, labels_bank, feats, jnp.asarray([0, 1]), knn_k=5)
    assert float(acc) == 1.0


def test_mem_2d_time_indexed_bank():
    """MEM_TYPE '2d' (reference Memory :937-1040 with duration>1): queries
    read/write their own time slot; other slots of the same row survive."""
    cfg = _cfg("mem", **{"CONTRASTIVE.MEM_TYPE": "2d"})
    cfg.CONTRASTIVE.DURATION = 4
    mesh, model, state, step = _setup(cfg)
    assert state.ssl["memory"].shape == (32, 4, 16)
    clips, infos = _batch(cfg)
    # items 0..7 each at time slot 2 (time01 ~ 0.67 of 3 -> slot 2)
    infos = dict(infos)
    infos["time_idx"] = jnp.full((8,), 2.0 / 3.0, jnp.float32)
    m0 = np.asarray(state.ssl["memory"])
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.0),
    )
    m1 = np.asarray(state.ssl["memory"])
    assert np.isfinite(float(stats["loss_nce"]))
    changed = ~np.all(np.isclose(m0, m1), axis=2)  # [length, duration]
    rows = set(np.where(changed.any(axis=1))[0])
    assert rows == set(range(8))
    # only time slot 2 written
    assert set(np.where(changed[:8].any(axis=0))[0]) == {2}


@pytest.mark.parametrize("ctype", ["byol", "simclr", "swav"])
def test_vmap_views_matches_sequential(ctype):
    """TPU.VMAP_VIEWS batches the per-view forwards via vmap; with no
    dropout, BN statistics are per-view under vmap, so the loss must match
    the sequential reference path to float tolerance."""
    losses = {}
    for vmap_on in (True, False):
        cfg = _cfg(ctype)
        cfg.TPU.VMAP_VIEWS = vmap_on
        mesh, model, state, step = _setup(cfg)
        clips, infos = _batch(cfg)
        _, stats = step(
            state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
            jnp.float32(0.5),
        )
        loss_key = [k for k in stats if k.startswith("loss")][0]
        losses[vmap_on] = float(stats[loss_key])
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)


def test_contrastive_sequential_byol_matches_batched_grads():
    """CONTRASTIVE.SEQUENTIAL (reference contrastive_forward :1120-1167):
    for NUM_CLIP=2 BYOL the accumulated per-clip gradients equal the
    batched symmetric loss's gradient, so one train step from the same
    state must land on the same parameters (float tolerance)."""
    params_out = {}
    for seq in (False, True):
        cfg = _cfg("byol")
        cfg.TPU.VMAP_VIEWS = False
        cfg.CONTRASTIVE.SEQUENTIAL = seq
        mesh, model, state, step = _setup(cfg)
        clips, infos = _batch(cfg)
        new_state, stats = step(
            state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2),
            jnp.float32(0.5),
        )
        params_out[seq] = (
            jax.tree_util.tree_map(np.asarray, new_state.params),
            float(stats["loss_byol"]),
        )
    pa, loss_batched = params_out[False]
    pb, loss_seq = params_out[True]
    flat_a = jax.tree_util.tree_leaves(pa)
    flat_b = jax.tree_util.tree_leaves(pb)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    # reference logging scale: partial_loss = sum / (n_clips * 2)
    np.testing.assert_allclose(loss_seq, loss_batched / 4.0, rtol=2e-4)


def test_contrastive_sequential_moco_runs_and_enqueues():
    cfg = _cfg("moco")
    cfg.TPU.VMAP_VIEWS = False
    cfg.CONTRASTIVE.SEQUENTIAL = True
    mesh, model, state, step = _setup(cfg)
    clips, infos = _batch(cfg)
    q0 = np.asarray(state.ssl["queue_x"])
    new_state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2),
        jnp.float32(0.5),
    )
    assert np.isfinite(float(stats["loss_nce"]))
    q1 = np.asarray(new_state.ssl["queue_x"])
    # global batch 8 keys enqueued at the ring head
    assert not np.allclose(q0[:8], q1[:8])
    np.testing.assert_array_equal(q0[8:], q1[8:])
    assert int(new_state.ssl["ptr"]) == 8


def test_contrastive_sequential_rejected_loudly():
    with pytest.raises(AssertionError, match="SEQUENTIAL"):
        _cfg("simclr", **{"CONTRASTIVE.SEQUENTIAL": True})
    with pytest.raises(AssertionError, match="SEQUENTIAL"):
        cfg = get_cfg()
        cfg.CONTRASTIVE.TYPE = "byol"
        cfg.CONTRASTIVE.SEQUENTIAL = True
        cfg.TPU.PARTITION_MODE = "auto"
        assert_and_infer_cfg(cfg)


def test_byol_fused_ema_stem_matches_unfused():
    """TPU.FUSE_EMA_STEM computes online+EMA SlowFast stem convs as one
    channel-concatenated conv; conv output channels are independent, so
    the BYOL loss and the post-step params must match the unfused path
    to float tolerance."""
    results = {}
    for fused in (False, True):
        cfg = _cfg("byol")
        cfg.MODEL.ARCH = "slowfast"
        cfg.SLOWFAST.ALPHA = 2
        cfg.SLOWFAST.BETA_INV = 2
        cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
        cfg.SLOWFAST.FUSION_KERNEL_SZ = 3
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1], [1, 1], [1, 1], [1, 1]]
        cfg.TPU.STEM_S2D = True
        cfg.TPU.FUSE_EMA_STEM = fused
        mesh, model, state, step = _setup(cfg)
        clips, infos = _batch(cfg)
        new_state, stats = step(
            state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2),
            jnp.float32(0.5),
        )
        results[fused] = (
            float(stats["loss_byol"]),
            jax.tree_util.tree_map(np.asarray, new_state.params),
        )
    la, pa = results[False]
    lb, pb = results[True]
    np.testing.assert_allclose(lb, la, rtol=2e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)
