"""Swin3D + TemporalModel (AdViSe) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import init_tmodeling_ssl, make_train_step
from advise_tpu.models import build_model
from advise_tpu.models.swin3d import (
    compute_mask,
    window_partition,
    window_reverse,
)
from advise_tpu.parallel import build_mesh
from advise_tpu.solver import build_tx


def test_window_partition_roundtrip():
    x = jnp.arange(1 * 4 * 8 * 8 * 6, dtype=jnp.float32).reshape(1, 4, 8, 8, 6)
    ws = (2, 4, 4)
    wins = window_partition(x, ws)
    assert wins.shape == (1 * 2 * 2 * 2, 2 * 4 * 4, 6)
    back = window_reverse(wins, ws, 1, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_compute_mask_shape_and_values():
    mask = compute_mask(4, 8, 8, (2, 4, 4), (1, 2, 2))
    nw = (4 // 2) * (8 // 4) * (8 // 4)
    assert mask.shape == (nw, 32, 32)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # unshifted mask is all zeros
    m0 = compute_mask(4, 8, 8, (2, 4, 4), (0, 0, 0))
    assert (m0 == 0).all()


def test_swin3d_forward():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SwinTransformer3D"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TPU.COMPUTE_DTYPE = "float32"
    from advise_tpu.models.swin3d import SwinTransformer3D
    from advise_tpu.config.node import CfgRef

    m = SwinTransformer3D(
        cfg=CfgRef(cfg), norm=None, embed_dim=24,
        depths=(1, 1), num_heads=(2, 4), window_size=(2, 4, 4),
    )
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))()
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (1, 6)
    assert np.isfinite(np.asarray(out)).all()


def _tm_cfg(t_arch="conv3d", task="speed_byol"):
    cfg = get_cfg()
    cfg.TASK = "tmodeling"
    cfg.MODEL.MODEL_NAME = "TemporalModel"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.SPATIAL_EMBEDDING_DIM = 32
    cfg.MODEL.TEMPORAL_NUM_LAYERS = 1  # -> 2-layer CLIP ViT
    cfg.MODEL.TEMPORAL_EMBEDDING_DIM = 16
    cfg.MODEL.TEMPORAL_HIDDEN_DIM = 8
    cfg.SSL.TASK = task
    cfg.SSL.RANGE = [1, 2]
    cfg.SSL.NUM_MLP_LAYERS = 2
    cfg.SSL.MLP_DIM = 16
    cfg.SSL.BN_MLP = False
    cfg.TM.TEMPORAL_ARCH = t_arch
    cfg.TM.NUM_BLOCKS = 1
    cfg.TM.NUM_HEADS = 2
    cfg.TM.FROM_SCRATCH = False
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.MOMENTUM = 0.5
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.AUG.TARGET_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.DONATE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "simple_adamw"
    cfg.NUM_WORLDS = 8
    if t_arch == "video_swin":
        cfg.TM.CHANNEL_POOL_DIM = 16  # must equal TEMPORAL_EMBEDDING_DIM
    return assert_and_infer_cfg(cfg)


@pytest.mark.parametrize("t_arch", ["conv3d", "tfmer_enc", "resnet3d"])
def test_temporal_model_forward(t_arch):
    cfg = _tm_cfg(t_arch, task="speed")
    m = build_model(cfg, sync_axes=())
    x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))()
    logits = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert logits.shape == (2, 2)


def test_temporal_model_frozen_spatial_encoder():
    """The CLIP tower must receive zero updates (frozen label -> lr scale 0,
    wd 0) and zero gradients (stop_gradient in spatial_forward)."""
    cfg = _tm_cfg("conv3d", task="speed")
    m = build_model(cfg, sync_axes=())
    x = jnp.ones((2, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))()
    bundle = build_tx(cfg, v["params"])
    se_scales = jax.tree_util.tree_leaves(
        bundle.lr_scales["spatial_encoder"]
    )
    assert all(s == 0.0 for s in se_scales)
    te_scales = jax.tree_util.tree_leaves(
        bundle.lr_scales["temporal_encoder"]
    )
    assert all(s == 1.0 for s in te_scales)


def test_tmodeling_byol_step_runs():
    cfg = _tm_cfg("conv3d", task="speed_byol")
    mesh = build_mesh(cfg)
    model = build_model(cfg)
    mi = build_model(cfg, sync_axes=())
    x0 = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: mi.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, train=False, method="init_all",
    ))()
    bundle = build_tx(cfg, v["params"])
    state = TrainState(
        params=v["params"],
        batch_stats=v.get("batch_stats", {}),
        opt_state=bundle.tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
        ssl=init_tmodeling_ssl(cfg, v["params"]),
    )
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 4, 32, 32, 3)).astype(np.float32))
    infos = {"spd_label": jnp.asarray(rng.integers(0, 2, size=(8, 2)))}
    se_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["spatial_encoder"])[0]
    )
    state, stats = step(state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3))
    assert np.isfinite(float(stats["loss_spd"]))
    assert np.isfinite(float(stats["loss_byol"]))
    # frozen spatial encoder unchanged
    se_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["spatial_encoder"])[0]
    )
    np.testing.assert_array_equal(se_before, se_after)
    # EMA twin moved toward the online encoder
    assert int(state.step) == 1
