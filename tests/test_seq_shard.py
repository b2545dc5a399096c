"""Sequence-parallel attention groundwork (BASELINE.json config #5):
ring-attention routing inside MultiScaleAttention matches dense attention,
and the joint contrastive+masked step runs on a ('data','sync','seq')
mesh — the pod-scale MViT-L layout at tiny width."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.config.node import CfgRef
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.mesh import SEQ_AXIS

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_seq_sharded_attention_matches_dense():
    """MultiScaleAttention with seq_axis (ring attention + gather) equals
    the dense path bit-for-bit-ish, replicated across the seq ring."""
    from advise_tpu.models.layers.attention import MultiScaleAttention

    kw = dict(
        dim_out=16,
        num_heads=2,
        input_size=(2, 4, 4),
        qkv_bias=True,
        has_cls_embed=False,
        mode="conv",
    )
    dense_attn = MultiScaleAttention(**kw, seq_axis=None)
    ring_attn = MultiScaleAttention(**kw, seq_axis=SEQ_AXIS)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 16)).astype(np.float32)
    )
    v = dense_attn.init(
        {"params": jax.random.PRNGKey(0)}, x, (2, 4, 4), True
    )
    ref, _ = dense_attn.apply(v, x, (2, 4, 4), True)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), (SEQ_AXIS,))
    f = shard_map(
        lambda p, xx: ring_attn.apply(p, xx, (2, 4, 4), True)[0],
        mesh=mesh,
        in_specs=(P(), P()),  # params + inputs replicated over the ring
        out_specs=P(),
        check_vma=False,
    )
    got = f(v, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_seq_qshard_pooled_kv_matches_dense():
    """Pooled-KV attention (stride_kv shrinks K/V so nk % nseq != 0)
    routes through the q-only sharding path — each chip keeps the full
    small K/V and computes its Q slice densely — and must equal the
    unsharded computation (the 32x312 preset's 97,344-q/1,521-kv shape
    class; r4 AOT certification)."""
    from advise_tpu.models.layers.attention import MultiScaleAttention

    kw = dict(
        dim_out=16,
        num_heads=2,
        input_size=(2, 4, 4),
        qkv_bias=True,
        has_cls_embed=False,
        mode="conv",
        kernel_kv=(3, 3, 3),
        stride_kv=(1, 2, 2),  # kv tokens: 32 -> 2*2*2=8, 8 % 4 == 0 but
        # nk != nq so the q-shard branch (not ring) is taken
    )
    dense_attn = MultiScaleAttention(**kw, seq_axis=None)
    shard_attn = MultiScaleAttention(**kw, seq_axis=SEQ_AXIS)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 16)).astype(np.float32)
    )
    v = dense_attn.init(
        {"params": jax.random.PRNGKey(0)}, x, (2, 4, 4), True
    )
    ref, _ = dense_attn.apply(v, x, (2, 4, 4), True)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), (SEQ_AXIS,))
    f = shard_map(
        lambda p, xx: shard_attn.apply(p, xx, (2, 4, 4), True)[0],
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = f(v, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def _tiny_joint_cfg():
    """The MViT-L joint preset's structure at tiny width/res."""
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(CFG_DIR, "pretrain", "MViT_L_32x312_joint.yaml")
    )
    cfg.MVIT.EMBED_DIM = 8
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DEPTH = 6
    cfg.MVIT.DIM_MUL = [[2, 2.0]]
    cfg.MVIT.HEAD_MUL = [[2, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[2, 1, 2, 2]]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 2, 2]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MVIT.SEQ_SHARD_MIN_TOKENS = 1  # every eligible block rings
    cfg.MASK.PRETRAIN_DEPTH = [5]
    cfg.MASK.PRED_HOG = False
    cfg.MASK.MAE_RND_MASK = True  # hand-built infos: no loader masks
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.MLP_DIM = 16
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.AUG.TARGET_SIZE = 16
    cfg.DATA.BATCHSIZE_PER_GPU = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 2
    cfg.TPU.MESH_SEQ = 2  # mesh: data=2 sync=2 seq=2 over 8 devices
    cfg.TPU.DONATE = False
    cfg.TPU.REMAT = False
    cfg.NUM_WORLDS = 8
    return assert_and_infer_cfg(cfg)


@pytest.mark.slow
def test_joint_contrastive_masked_step_on_seq_mesh():
    cfg = _tiny_joint_cfg()
    mesh = build_mesh(cfg)
    assert dict(mesh.shape) == {"data": 2, "sync": 2, "seq": 2}
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    from advise_tpu.solver import build_tx

    sample = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    variables = jax.jit(
        lambda: model_init.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2)},
            sample,
            train=False,
        )
    )()
    # joint projection head exists
    assert "joint_proj" in variables["params"]
    bundle = build_tx(cfg, variables["params"])
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=bundle.tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    rng = np.random.default_rng(0)
    # batch shards over data*sync=4; replicated over seq
    clips = jnp.asarray(rng.normal(size=(4, 2, 4, 16, 16, 3)).astype(np.float32))
    state, stats = step(
        state, clips, {}, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    assert np.isfinite(float(stats["loss_mask"])), stats
    assert np.isfinite(float(stats["loss_nce"])), stats
    assert float(stats["grad_norm"]) > 0
    assert int(state.step) == 1
