"""TPU.PARTITION_MODE='auto' (jit + GSPMD): partition rules, the
tensor-parallel/FSDP train step on a ('data','model') mesh, parity with
the explicit shard_map path, and the stateful MoCo machinery under
compiler-placed collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.auto_shard import param_specs, shard_tree
from advise_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from advise_tpu.solver import build_tx


def test_partition_rule_specs():
    """Column/row-parallel rules hit attention + MLP kernels; FSDP takes
    the largest divisible dim of big replicated params; tiny and
    non-divisible params stay replicated."""
    params = {
        "blocks_0": {
            "attn": {
                "qkv": {"kernel": jnp.zeros((32, 96)), "bias": jnp.zeros((96,))},
                "proj": {"kernel": jnp.zeros((32, 32)), "bias": jnp.zeros((32,))},
            },
            "mlp": {
                "fc1": {"kernel": jnp.zeros((32, 128)), "bias": jnp.zeros((128,))},
                "fc2": {"kernel": jnp.zeros((128, 32)), "bias": jnp.zeros((32,))},
            },
            "norm1": {"scale": jnp.zeros((32,))},
        },
        "patch_embed": {"kernel": jnp.zeros((3, 7, 7, 3, 512))},  # big: fsdp
        "odd": {"kernel": jnp.zeros((129, 257))},  # nothing divides
    }
    cfg = get_cfg()
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = True
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    specs = param_specs(params, mesh, fsdp=True)
    b = specs["blocks_0"]
    assert b["attn"]["qkv"]["kernel"] == P(None, MODEL_AXIS)
    assert b["attn"]["qkv"]["bias"] == P(MODEL_AXIS)
    assert b["attn"]["proj"]["kernel"] == P(MODEL_AXIS, None)
    assert b["mlp"]["fc1"]["kernel"] == P(None, MODEL_AXIS)
    assert b["mlp"]["fc2"]["kernel"] == P(MODEL_AXIS, None)
    assert b["norm1"]["scale"] == P(None)  # tiny -> replicated
    # big conv kernel: fsdp on its largest (output-channel) dim
    assert specs["patch_embed"]["kernel"] == P(None, None, None, None, DATA_AXIS)
    assert specs["odd"]["kernel"] == P(None, None)


def _tiny_masked_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = []
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MASK.ENABLE = True
    cfg.MASK.MAE_RND_MASK = True  # hand-built infos: no loader masks
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.AUG.MASK_RATIO = 0.5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.NUM_CLIP = 1
    cfg.AUG.TARGET_SIZE = 32
    cfg.TASK = "masked"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = True
    cfg.TPU.DONATE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.NUM_WORLDS = 4
    return assert_and_infer_cfg(cfg)


def _build_state(cfg, mesh, sample_shape, with_mask_rng=True):
    model = build_model(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    if with_mask_rng:
        rngs["mask"] = jax.random.PRNGKey(2)
    sample = jnp.zeros(sample_shape, jnp.float32)
    variables = jax.jit(lambda: model.init(rngs, sample, train=False))()
    bundle = build_tx(cfg, variables["params"])
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=bundle.tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, bundle, state


def test_auto_masked_mvit_step_tp_fsdp():
    """MaskMViT step on a data=4 x model=2 mesh: finite loss, params come
    back tensor-parallel-sharded, two chained steps run."""
    cfg = _tiny_masked_cfg()
    mesh = build_mesh(cfg)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    model, bundle, state = _build_state(cfg, mesh, (1, 4, 32, 32, 3))
    from advise_tpu.parallel.auto_shard import shard_train_state

    state, specs = shard_train_state(cfg, mesh, state, bundle)
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    clips = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 1, 4, 32, 32, 3))
        .astype(np.float32)
    )
    for i in range(2):
        state, stats = step(
            state, clips, {}, jax.random.PRNGKey(i), jnp.float32(1e-3)
        )
    assert np.isfinite(float(stats["loss_mask"])), stats
    assert float(stats["grad_norm"]) > 0
    assert int(state.step) == 2
    # a qkv kernel leaf must actually be laid out over the 'model' axis
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    qkv = [
        (p, x) for p, x in flat
        if "qkv" in str(p) and str(p).endswith("'kernel'),)")
        or ("qkv" in str(p) and "kernel" in str(p))
    ]
    assert qkv, "no qkv kernels found"
    assert any(
        MODEL_AXIS in jax.tree_util.tree_leaves(
            [a for a in x.sharding.spec if a is not None]
        )
        for _, x in qkv
    ), f"qkv kernels not model-sharded: {[x.sharding for _, x in qkv]}"


def _tiny_speed_cfg(mode):
    cfg = get_cfg()
    cfg.TASK = "speed"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.SSL.NUM_MLP_LAYERS = 2
    cfg.SSL.MLP_DIM = 32
    cfg.SSL.METRIC = ["bce_logit", "acc@1"]
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.GLOBAL_SYNC = True
    cfg.BN.NUM_SYNC_DEVICES = -1
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DONATE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "simple_sgd"
    cfg.NUM_WORLDS = 8
    cfg.TPU.PARTITION_MODE = mode
    if mode == "auto":
        cfg.TPU.MESH_MODEL = 1
    return assert_and_infer_cfg(cfg)


def test_auto_matches_shard_map_speed_step():
    """One speed-pretext step, global-sync BN, no dropout/aug: the GSPMD
    step must produce the same loss and updated params as the explicit
    jit(shard_map) step (the two partitionings compute the same math)."""
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 2, 16, 16, 3)).astype(np.float32))
    infos = {"spd_label": jnp.asarray(rng.integers(0, 4, size=(8, 2)))}

    results = {}
    for mode in ("shard_map", "auto"):
        cfg = _tiny_speed_cfg(mode)
        mesh = build_mesh(cfg)
        model, bundle, state = _build_state(
            cfg, mesh, (1, 2, 16, 16, 3), with_mask_rng=False
        )
        if mode == "auto":
            from advise_tpu.parallel.auto_shard import shard_train_state

            state, _ = shard_train_state(cfg, mesh, state, bundle)
        step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(5), jnp.float32(1e-2)
        )
        results[mode] = (
            float(stats["loss_spd"]),
            jax.tree_util.tree_map(np.asarray, state.params),
        )

    loss_sm, params_sm = results["shard_map"]
    loss_auto, params_auto = results["auto"]
    assert abs(loss_sm - loss_auto) < 1e-5, (loss_sm, loss_auto)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5),
        params_sm, params_auto,
    )


def test_auto_swin_moco_step():
    """Video Swin MoCo (flagship #4's structure) under auto TP: window
    attention + head BN partition via GSPMD, queue advances."""
    cfg = get_cfg()
    cfg.TASK = "contrastive"
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "swin"
    cfg.CONTRASTIVE.TYPE = "moco"
    cfg.CONTRASTIVE.DIM = 16
    cfg.CONTRASTIVE.MLP_DIM = 32
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.QUEUE_LEN = 64
    cfg.CONTRASTIVE.LENGTH = 32
    cfg.CONTRASTIVE.KNN_ON = False
    cfg.SWIN.EMBED_DIM = 8
    cfg.SWIN.DEPTHS = [1, 1]
    cfg.SWIN.NUM_HEADS = [2, 4]
    cfg.SWIN.PATCH_SIZE = [1, 2, 2]
    cfg.SWIN.WINDOW_SIZE = [2, 4, 4]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = False
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.GLOBAL_SYNC = True  # auto mode: BN spans the global batch
    cfg.BN.NUM_SYNC_DEVICES = -1
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.NUM_WORLDS = 4
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg)
    model, bundle, state = _build_state(
        cfg, mesh, (2, 2, 16, 16, 3), with_mask_rng=False
    )
    from advise_tpu.engine.contrastive import init_ssl_state
    from advise_tpu.parallel.auto_shard import shard_train_state

    state = state.replace(ssl=init_ssl_state(
        cfg, state.params, state.batch_stats, jax.random.PRNGKey(7)
    ))
    state, _ = shard_train_state(cfg, mesh, state, bundle)
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    clips = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 2, 2, 16, 16, 3))
        .astype(np.float32)
    )
    infos = {"item_id": jnp.arange(8, dtype=jnp.int32)}
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2),
        jnp.float32(0.5),
    )
    assert np.isfinite(float(stats["loss_nce"])), stats
    assert int(state.ssl["ptr"]) == 8


@pytest.mark.parametrize("ctype", ["byol", "simclr", "swav"])
def test_auto_contrastive_algorithms(ctype):
    """The remaining SSL algorithms under auto mode: vmapped multi-view
    forwards, identity 'gathers' over the global batch, Sinkhorn without
    psum — all must produce finite losses and advance state."""
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
    cfg.CONTRASTIVE.QUEUE_LEN = 32
    cfg.CONTRASTIVE.LENGTH = 64
    cfg.CONTRASTIVE.PREDICTOR_DEPTHS = [2] if ctype == "byol" else []
    cfg.CONTRASTIVE.SWAV_QEUE_LEN = 16 if ctype == "swav" else 0
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.TRAIN_CROP_NUM_TEMPORAL = 2  # = NUM_CLIP (reference tie)
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.GLOBAL_SYNC = True
    cfg.BN.NUM_SYNC_DEVICES = -1
    cfg.NUM_WORLDS = 4
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg)
    model, bundle, state = _build_state(
        cfg, mesh, (1, 2, 16, 16, 3), with_mask_rng=False
    )
    from advise_tpu.engine.contrastive import init_ssl_state
    from advise_tpu.parallel.auto_shard import shard_train_state

    state = state.replace(ssl=init_ssl_state(
        cfg, state.params, state.batch_stats, jax.random.PRNGKey(7)
    ))
    state, _ = shard_train_state(cfg, mesh, state, bundle)
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 2, 16, 16, 3)).astype(np.float32))
    infos = {"item_id": jnp.arange(8, dtype=jnp.int32)}
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2),
        jnp.float32(16.0),  # epoch_exact past the SwAV queue gate
    )
    key = {"byol": "loss_byol", "simclr": "loss_simclr", "swav": "loss_swav"}
    assert np.isfinite(float(stats[key[ctype]])), stats
    assert int(state.step) == 1
    if ctype == "byol":
        assert "ema_params" in state.ssl


def test_auto_eval_step():
    """make_eval_step under auto mode: plain jit forward with GSPMD-
    partitioned params, logits shaped [B, K, C]."""
    from advise_tpu.engine.steps import make_eval_step

    cfg = _tiny_speed_cfg("auto")
    cfg.TPU.MESH_MODEL = 2
    mesh = build_mesh(cfg)
    model, bundle, state = _build_state(
        cfg, mesh, (1, 2, 16, 16, 3), with_mask_rng=False
    )
    from advise_tpu.parallel.auto_shard import shard_train_state

    state, _ = shard_train_state(cfg, mesh, state, bundle)
    eval_step = make_eval_step(cfg, mesh, model, device_aug=None)
    clips = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 2, 2, 16, 16, 3))
        .astype(np.float32)
    )
    logits = eval_step(
        state.params, state.batch_stats, clips, {}, jax.random.PRNGKey(0)
    )
    assert logits.shape == (8, 2, 4)
    assert np.isfinite(np.asarray(logits)).all()


def test_auto_moco_queue_and_ema():
    """MoCo under auto mode: the queue enqueue (identity 'gather' over the
    global batch), pointer advance, and EMA update all work with XLA
    placing the collectives."""
    cfg = get_cfg()
    cfg.TASK = "contrastive"
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "slow"
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.CONTRASTIVE.TYPE = "moco"
    cfg.CONTRASTIVE.DIM = 16
    cfg.CONTRASTIVE.MLP_DIM = 32
    cfg.CONTRASTIVE.NUM_MLP_LAYERS = 2
    cfg.CONTRASTIVE.QUEUE_LEN = 32
    cfg.CONTRASTIVE.LENGTH = 64
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = False
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.GLOBAL_SYNC = True
    cfg.BN.NUM_SYNC_DEVICES = -1
    cfg.NUM_WORLDS = 4
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg)
    model, bundle, state = _build_state(
        cfg, mesh, (1, 2, 16, 16, 3), with_mask_rng=False
    )
    from advise_tpu.engine.contrastive import init_ssl_state
    from advise_tpu.parallel.auto_shard import shard_train_state

    state = state.replace(ssl=init_ssl_state(
        cfg, state.params, state.batch_stats, jax.random.PRNGKey(7)
    ))
    state, _ = shard_train_state(cfg, mesh, state, bundle)
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 2, 16, 16, 3)).astype(np.float32))
    infos = {"item_id": jnp.arange(8, dtype=jnp.int32)}
    ema0 = np.asarray(
        jax.tree_util.tree_leaves(state.ssl["ema_params"])[0]
    ).copy()
    for i in range(2):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(i), jnp.float32(1e-2),
            jnp.float32(0.5),
        )
    assert np.isfinite(float(stats["loss_nce"])), stats
    assert int(state.ssl["ptr"]) == 16  # 2 steps x global batch 8
    ema1 = np.asarray(jax.tree_util.tree_leaves(state.ssl["ema_params"])[0])
    assert not np.allclose(ema0, ema1)


def test_auto_tmodeling_step():
    """TemporalModel (AdViSe) under auto partition mode: the frozen CLIP
    spatial tower is pure forward (FSDP-shardable / replicated), the
    trainable temporal head partitions like the other transformers, and
    the BYOL EMA twins update — previously rejected by assert
    (round-2 VERDICT item 8)."""
    cfg = get_cfg()
    cfg.TASK = "tmodeling"
    cfg.MODEL.MODEL_NAME = "TemporalModel"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.SPATIAL_EMBEDDING_DIM = 32
    cfg.MODEL.TEMPORAL_NUM_LAYERS = 1
    cfg.MODEL.TEMPORAL_EMBEDDING_DIM = 16
    cfg.MODEL.TEMPORAL_HIDDEN_DIM = 8
    cfg.SSL.TASK = "speed_byol"
    cfg.SSL.RANGE = [1, 2]
    cfg.SSL.NUM_MLP_LAYERS = 2
    cfg.SSL.MLP_DIM = 16
    cfg.SSL.BN_MLP = False
    cfg.TM.TEMPORAL_ARCH = "conv3d"
    cfg.TM.NUM_BLOCKS = 1
    cfg.TM.NUM_HEADS = 2
    cfg.TM.FROM_SCRATCH = False
    cfg.CONTRASTIVE.DIM = 8
    cfg.CONTRASTIVE.MOMENTUM = 0.5
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.AUG.TARGET_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = True
    cfg.TPU.DONATE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "simple_adamw"
    cfg.NUM_WORLDS = 4
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg)

    from advise_tpu.engine.steps import init_tmodeling_ssl
    from advise_tpu.parallel.auto_shard import shard_train_state

    model = build_model(cfg)
    x0 = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: model.init(
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
    state, specs = shard_train_state(cfg, mesh, state, bundle)
    # temporal-head attention/MLP params actually got sharded specs
    flat_specs = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda s: isinstance(s, P)
    )
    assert any(any(a is not None for a in s) for s in flat_specs)
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 4, 32, 32, 3)).astype(np.float32))
    infos = {"spd_label": jnp.asarray(rng.integers(0, 2, size=(8, 2)))}
    ema_before = np.asarray(
        jax.tree_util.tree_leaves(state.ssl["ema_temporal"])[0]
    )
    se_before = np.asarray(
        jax.tree_util.tree_leaves(state.params["spatial_encoder"])[0]
    )
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    assert np.isfinite(float(stats["loss_spd"]))
    assert np.isfinite(float(stats["loss_byol"]))
    # frozen spatial tower untouched
    se_after = np.asarray(
        jax.tree_util.tree_leaves(state.params["spatial_encoder"])[0]
    )
    np.testing.assert_array_equal(se_before, se_after)
    # the twin starts as an exact copy of the online params, so the first
    # EMA update is a fixed point; after a second step (online params have
    # moved) the twin must drift
    state, _ = step(
        state, clips, infos, jax.random.PRNGKey(1), jnp.float32(1e-3)
    )
    ema_after = np.asarray(
        jax.tree_util.tree_leaves(state.ssl["ema_temporal"])[0]
    )
    assert not np.array_equal(ema_before, ema_after)
    assert int(state.step) == 2
