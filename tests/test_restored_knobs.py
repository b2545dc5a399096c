"""Previously-silent config knobs the reference honors, now wired:
MOCO_MULTI_VIEW_QUEUE, INTERP_MEMORY, PER_FRAME_MASKING,
ZERO_DECAY_POS_CLS, HEAD_INIT_SCALE, ZERO_INIT_FINAL_CONV,
REVERSE_INPUT_CHANNEL, TM.LINEAR_PROJ (round-3 dead-knob audit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg


def test_per_frame_masking_invariants():
    """MASK.PER_FRAME_MASKING: every frame keeps exactly
    int(hw*(1-ratio)) tokens; restore indices are a permutation that
    round-trips the flat [kept..., masked...] concat layout."""
    from advise_tpu.models.masked import random_masking

    b, t, h, w = 3, 4, 4, 4
    ratio = 0.75
    ids_keep, mask, ids_restore = random_masking(
        jax.random.PRNGKey(0), b, (t, h, w), ratio, per_frame=True
    )
    hw = h * w
    len_keep_f = int(hw * (1 - ratio))
    assert ids_keep.shape == (b, t * len_keep_f)
    m = np.asarray(mask).reshape(b, t, hw)
    # per-frame mask count is exact
    np.testing.assert_array_equal(m.sum(-1), hw - len_keep_f)
    # restore is a permutation of [0, L)
    r = np.asarray(ids_restore)
    for i in range(b):
        assert sorted(r[i]) == list(range(t * hw))
    # round trip: every KEPT token's restore slot recovers its own id;
    # every MASKED token restores from its own frame's mask-token region
    # (mask tokens are one shared embedding, so slot order is free)
    l = t * hw
    n_mask_f = hw - len_keep_f
    ik = np.asarray(ids_keep)
    for i in range(b):
        kept = list(ik[i])
        concat = np.asarray(kept + [-1] * (t * n_mask_f))
        restored = concat[r[i]]
        for tok in range(l):
            f = tok // hw
            if tok in set(kept[f * len_keep_f:(f + 1) * len_keep_f]):
                assert restored[tok] == tok
            else:
                # restore slot points into frame f's mask region
                slot = r[i][tok]
                lo = t * len_keep_f + f * n_mask_f
                assert lo <= slot < lo + n_mask_f, (tok, slot)


def test_moco_multi_view_queue():
    from advise_tpu.engine.contrastive import dequeue_and_enqueue

    ssl = {"queue_x": jnp.zeros((16, 4)), "ptr": jnp.int32(0)}
    keys = [jnp.ones((4, 4)), 2.0 * jnp.ones((4, 4))]
    out = dequeue_and_enqueue(ssl, keys, axes=(), multi_view=True)
    q = np.asarray(out["queue_x"])
    np.testing.assert_array_equal(q[:4], 1.0)
    np.testing.assert_array_equal(q[4:8], 2.0)
    assert int(out["ptr"]) == 8
    out1 = dequeue_and_enqueue(ssl, keys, axes=(), multi_view=False)
    assert int(out1["ptr"]) == 4


def test_interp_memory_reads_and_writes_adjacent_slots():
    """CONTRASTIVE.INTERP_MEMORY: the 2D bank update scatters into BOTH
    adjacent time slots of the written item (reference Memory.update
    interp branch incl. the inverted-weight quirk)."""
    from advise_tpu.engine import contrastive as C
    from advise_tpu.engine.state import TrainState
    from advise_tpu.engine.steps import make_train_step
    from advise_tpu.models import build_model
    from advise_tpu.parallel import build_mesh
    from advise_tpu.solver import build_tx

    cfg = get_cfg()
    cfg.TASK = "contrastive"
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    cfg.MODEL.ARCH = "slow"
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.CONTRASTIVE.TYPE = "mem"
    cfg.CONTRASTIVE.MEM_TYPE = "2d"
    cfg.CONTRASTIVE.DURATION = 4
    cfg.CONTRASTIVE.INTERP_MEMORY = True
    cfg.CONTRASTIVE.DIM = 16
    cfg.CONTRASTIVE.MLP_DIM = 32
    cfg.CONTRASTIVE.QUEUE_LEN = 8
    cfg.CONTRASTIVE.LENGTH = 32
    cfg.CONTRASTIVE.KNN_ON = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 2
    cfg.AUG.TARGET_SIZE = 16
    cfg.NUM_WORLDS = 8
    cfg = assert_and_infer_cfg(cfg)
    mesh = build_mesh(cfg)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    sample = jnp.zeros((2, 2, 16, 16, 3), jnp.float32)
    variables = jax.jit(lambda: model_init.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        sample, train=False,
    ))()
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
    clips = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 2, 2, 16, 16, 3))
        .astype(np.float32)
    )
    # time 0.5 -> float slot 1.5 -> slots 1 AND 2 written
    infos = {
        "item_id": jnp.arange(8, dtype=jnp.int64),
        "time_idx": jnp.full((8,), 0.5, jnp.float32),
    }
    mem0 = np.asarray(state.ssl["memory"])
    state, stats = step(
        state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
        jnp.float32(0.5),
    )
    assert np.isfinite(float(stats["loss_nce"]))
    mem1 = np.asarray(state.ssl["memory"])
    changed = (np.abs(mem1 - mem0).max(axis=2) > 0)  # [length, duration]
    assert changed[:8, 1].all() and changed[:8, 2].all()
    assert not changed[:8, 0].any() and not changed[:8, 3].any()
    assert not changed[8:].any()


def test_zero_decay_pos_cls_gate():
    from advise_tpu.solver.optimizer import classify_params

    params = {
        "pos_embed": jnp.zeros((1, 8, 4)),
        "cls_token": jnp.zeros((1, 1, 4)),
        "dense": {"kernel": jnp.zeros((4, 4))},
    }
    cfg = get_cfg()
    cfg.MVIT.ZERO_DECAY_POS_CLS = True
    labels = classify_params(cfg, params)
    assert labels["pos_embed"] == "no_decay"
    cfg.MVIT.ZERO_DECAY_POS_CLS = False
    labels = classify_params(cfg, params)
    # with the gate off, pos embeds follow the normal 1-D/default rules
    assert labels["pos_embed"] != "no_decay"
    assert labels["cls_token"] != "no_decay"


def test_head_init_scale_scales_projection():
    from advise_tpu.models.layers.heads import TransformerBasicHead

    x = jnp.ones((2, 8))
    outs = {}
    for scale in (1.0, 0.001):
        head = TransformerBasicHead(
            num_classes=4, act_func="none", head_init_scale=scale
        )
        v = head.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        outs[scale] = np.asarray(v["params"]["projection"]["kernel"])
    np.testing.assert_allclose(outs[0.001], outs[1.0] * 0.001, rtol=1e-6)


def test_zero_init_final_conv():
    from advise_tpu.models.layers.resnet import BottleneckTransform
    from advise_tpu.models.layers.norm import get_norm

    cfg = get_cfg()
    block = BottleneckTransform(
        dim_out=8, dim_inner=4, temp_kernel_size=3, stride=1,
        norm=get_norm(cfg, ()), zero_init_final_conv=True,
    )
    x = jnp.ones((1, 2, 8, 8, 8))
    v = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    np.testing.assert_array_equal(np.asarray(v["params"]["c"]["kernel"]), 0.0)


def test_reverse_input_channel():
    from advise_tpu.data import build_device_aug

    cfg = get_cfg()
    cfg.AUG.TYPE = "none"
    # symmetric normalization so the channel swap is visible as a pure
    # value swap (normalize applies per-channel AFTER the flip, like the
    # reference's post-swap tensor_normalize)
    cfg.DATA.MEAN = [0.5, 0.5, 0.5]
    cfg.DATA.STD = [0.5, 0.5, 0.5]
    batch = np.zeros((1, 1, 2, 4, 4, 3), np.uint8)
    batch[..., 0] = 255  # red
    cfg.DATA.REVERSE_INPUT_CHANNEL = False
    out = np.asarray(build_device_aug(cfg, "train")(jnp.asarray(batch),
                                                    jax.random.PRNGKey(0)))
    cfg.DATA.REVERSE_INPUT_CHANNEL = True
    out_r = np.asarray(build_device_aug(cfg, "train")(jnp.asarray(batch),
                                                      jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out[..., 0], out_r[..., 2])
    np.testing.assert_allclose(out[..., 2], out_r[..., 0])


def test_tm_linear_proj_bridge():
    from advise_tpu.models import build_model

    cfg = get_cfg()
    cfg.TASK = "tmodeling"
    cfg.MODEL.MODEL_NAME = "TemporalModel"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.SPATIAL_EMBEDDING_DIM = 32
    cfg.MODEL.TEMPORAL_NUM_LAYERS = 1
    cfg.MODEL.TEMPORAL_EMBEDDING_DIM = 16
    cfg.MODEL.TEMPORAL_HIDDEN_DIM = 8
    cfg.SSL.TASK = "speed"
    cfg.SSL.RANGE = [1, 2]
    cfg.TM.TEMPORAL_ARCH = "conv3d"
    cfg.TM.TEMPORAL_CAT = True
    cfg.TM.LINEAR_PROJ = True
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.AUG.TARGET_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg = assert_and_infer_cfg(cfg)
    m = build_model(cfg, sync_axes=())
    x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))()
    assert "bridge_proj" in v["params"]
    logits = m.apply(v, x, train=False)
    assert logits.shape == (2, 2)
    assert np.isfinite(np.asarray(logits)).all()


def _mask_cfg():
    import os
    # reuse the transformer test harness's cfg shape
    from tests.test_transformers import _mvit_cfg  # type: ignore

    cfg = _mvit_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MASK.ENABLE = True
    cfg.MASK.MAE_RND_MASK = True  # standalone model tests: in-model mask
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.AUG.MASK_RATIO = 0.5
    cfg.MVIT.POOL_Q_STRIDE = []
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    return cfg


def test_maskfeat_xformer_head():
    """MASK.HEAD_TYPE='separate_xformer' adds DECODER_DEPTH MultiScale
    transforms to each depth head (reference MSSeparateHead
    head_helper.py:507-531)."""
    from tests.test_transformers import _run  # type: ignore

    cfg = _mask_cfg()
    cfg.MASK.HEAD_TYPE = "separate_xformer"
    cfg.MASK.DECODER_DEPTH = 1
    cfg.MASK.DECODER_EMBED_DIM = 32
    m, v, out = _run(cfg)
    head = v["params"]["pred_head_3"]
    assert "transform_0" in head
    preds, labels, masks, weights = out
    assert np.isfinite(np.asarray(preds[0])).all()


def test_mae_sep_decoder_pos_embed():
    from tests.test_transformers import _run  # type: ignore

    cfg = _mask_cfg()
    cfg.MASK.MAE_ON = True
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MASK.DECODER_DEPTH = 1
    cfg.MASK.DECODER_EMBED_DIM = 32
    cfg.MASK.DECODER_SEP_POS_EMBED = True
    m, v, out = _run(cfg)
    assert "dec_pos_embed_spatial" in v["params"]
    assert "dec_pos_embed_temporal" in v["params"]
    assert "decoder_pos_embed" not in v["params"]


def test_mae_per_frame_masking_forward():
    from tests.test_transformers import _run  # type: ignore

    cfg = _mask_cfg()
    cfg.MASK.MAE_ON = True
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MASK.DECODER_DEPTH = 1
    cfg.MASK.DECODER_EMBED_DIM = 32
    cfg.MASK.PER_FRAME_MASKING = True
    m, v, out = _run(cfg)
    preds, labels, masks, weights = out
    from advise_tpu.models.masked import masked_mse

    loss = masked_mse(preds[0], labels[0], masks[0])
    assert np.isfinite(float(loss))


def test_scale_init_by_depth():
    """MASK.SCALE_INIT_BY_DEPTH (reference fix_init_weight, masked.py:130):
    block i's attn out-proj and mlp fc2 inits are divided by
    sqrt(2*(i+1)), so deeper blocks start with proportionally smaller
    residual branches."""
    from tests.test_transformers import _run  # type: ignore

    cfg = _mask_cfg()
    vs = {}
    for flag in (False, True):
        cfg.MASK.SCALE_INIT_BY_DEPTH = flag
        _, v, _ = _run(cfg)
        vs[flag] = v["params"]["encoder"]
    import math

    for i in (0, 3):
        div = math.sqrt(2.0 * (i + 1))
        base = np.asarray(vs[False][f"blocks_{i}"]["attn"]["proj"]["kernel"])
        scaled = np.asarray(vs[True][f"blocks_{i}"]["attn"]["proj"]["kernel"])
        np.testing.assert_allclose(scaled, base / div, rtol=1e-6)
        base = np.asarray(vs[False][f"blocks_{i}"]["mlp"]["fc2"]["kernel"])
        scaled = np.asarray(vs[True][f"blocks_{i}"]["mlp"]["fc2"]["kernel"])
        np.testing.assert_allclose(scaled, base / div, rtol=1e-6)


def test_rbyol_motion_shift_crop():
    """AUG.TRAIN_JITTER_MOTION_SHIFT: the crop box interpolates between
    two sampled boxes across frames, so a STATIC video yields different
    crops for the first vs last frame (reference rbyol_aug's
    random_resized_crop_with_shift)."""
    from advise_tpu.data import build_device_aug

    cfg = get_cfg()
    cfg.AUG.TYPE = "rbyol"
    cfg.AUG.TARGET_SIZE = 16
    cfg.AUG.COLOR = [0.0, 0.0, 0.0, 0.0, 0.0]
    cfg.AUG.GRAYSCALE = 0.0
    cfg.AUG.RANDOM_FLIP = False
    cfg.AUG.SSL_BLUR_SIGMA_MIN = [0.0, 0.0]
    cfg.AUG.SSL_BLUR_SIGMA_MAX = [0.0, 0.0]
    # static content: every frame identical
    frame = np.random.default_rng(0).integers(0, 256, (24, 32, 3), np.uint8)
    batch = np.broadcast_to(frame, (6, 24, 32, 3))[None, None]
    outs = {}
    for ms in (False, True):
        cfg.AUG.TRAIN_JITTER_MOTION_SHIFT = ms
        aug = build_device_aug(cfg, "train")
        outs[ms] = np.asarray(
            jax.jit(aug)(jnp.asarray(batch), jax.random.PRNGKey(3))
        )[0, 0]
    # without motion shift all frames crop identically
    np.testing.assert_allclose(outs[False][0], outs[False][-1], atol=1e-5)
    # with motion shift the box moves across frames
    assert np.abs(outs[True][0] - outs[True][-1]).max() > 1e-3


# ---------------------------------------------------------------------------
# round-4 dead-knob audit wirings
# ---------------------------------------------------------------------------


def _maskfeat_cfg():
    cfg = get_cfg()
    cfg.TASK = "masked"
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MASK.ENABLE = True
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.AUG.MASK_RATIO = 0.5
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.POOL_Q_STRIDE = []
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.AUG.TARGET_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_mae_rnd_mask_false_uses_loader_mask():
    """MASK.MAE_RND_MASK=False: the maskfeat forward consumes the
    loader's blockwise mask verbatim (reference masked.py:558-560) and
    rejects a missing one loudly."""
    import pytest

    from advise_tpu.models import build_model

    cfg = _maskfeat_cfg()
    cfg.MASK.MAE_RND_MASK = False
    m = build_model(assert_and_infer_cfg(cfg), sync_axes=())
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "mask": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    # token grid: t=4/PATCH_STRIDE_t(=2)->2, h=w=32/4=8
    lm = np.zeros((1, 2 * 8 * 8), np.float32)
    lm[:, :64] = 1.0
    v = m.init(rngs, x, train=False, loader_mask=jnp.asarray(lm))
    out = m.apply(v, x, train=False, loader_mask=jnp.asarray(lm),
                  rngs={"mask": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)})
    preds, labels, masks, weights = out
    np.testing.assert_array_equal(
        np.asarray(masks[0][0]), lm[0]
    )  # the provided mask IS the loss mask
    with pytest.raises(ValueError, match="MAE_RND_MASK"):
        # init falls back to a random mask (shapes only); APPLY without
        # loader masks must reject loudly
        m.apply(v, x, train=False,
                rngs={"mask": jax.random.PRNGKey(1),
                      "dropout": jax.random.PRNGKey(2)})


def test_mask_gen_plumbed_through_pipeline():
    """The synthetic masked pipeline ships blockwise loader masks in
    infos['mask'] with MASK.MAE_RND_MASK=False."""
    from advise_tpu.data import build_dataset

    cfg = _maskfeat_cfg()
    cfg.MASK.MAE_RND_MASK = False
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg = assert_and_infer_cfg(cfg)
    ds = build_dataset(cfg, "train")
    clips, infos = ds.get(0, np.random.default_rng(0))
    k = clips.shape[0]
    assert infos["mask"].shape == (k, 2, 8, 8)
    frac = infos["mask"].mean()
    assert 0.2 < frac < 0.8, frac  # blockwise generator hit ~MASK_RATIO


def test_vis_mask_outputs_and_dump(tmp_path):
    """VIS_MASK.ENABLE: the MAE forward returns (input, masked, recon)
    videos (reference masked.py:464-525) and the epoch-end dump writes
    comparison files named with the TEST.CHECKPOINT_FILE_PATH prefix."""
    from advise_tpu.models import build_model
    from advise_tpu.utils.visualization import dump_mask_visualization

    cfg = _maskfeat_cfg()
    cfg.MASK.MAE_ON = True
    cfg.MASK.MAE_RND_MASK = True
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MASK.DECODER_DEPTH = 1
    cfg.MASK.DECODER_EMBED_DIM = 32
    cfg.VIS_MASK.ENABLE = True
    cfg.LOGDIR = str(tmp_path)
    cfg.TEST.CHECKPOINT_FILE_PATH = "ckpt/Model_Ep20.pyth"
    cfg = assert_and_infer_cfg(cfg)
    m = build_model(cfg, sync_axes=())
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "mask": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    v = m.init(rngs, x, train=False)
    out = m.apply(v, x, train=False,
                  rngs={"mask": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)})
    assert len(out) == 5
    vis = out[-1]
    assert len(vis) == 3 and vis[0].shape[-1] == 3
    clips_u8 = jnp.zeros((1, 1, 4, 32, 32, 3), jnp.uint8)
    out_dir = dump_mask_visualization(
        cfg, m, v["params"], v.get("batch_stats", {}), clips_u8, None,
        jax.random.PRNGKey(5), epoch=0,
    )
    import os

    files = os.listdir(out_dir)
    assert any(f.endswith(".npy") for f in files), files
    assert "Model_Ep20" in out_dir


def test_mesh_data_knob_validated():
    """TPU.MESH_DATA: explicit sizes are honored-or-rejected, never
    silently ignored."""
    import pytest

    from advise_tpu.parallel.mesh import mesh_shape

    cfg = get_cfg()
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.MESH_DATA = 2
    assert mesh_shape(cfg, 8) == (2, 4)
    cfg.TPU.MESH_DATA = 3
    with pytest.raises(ValueError, match="MESH_DATA"):
        mesh_shape(cfg, 8)


def test_ssl_method_knob():
    """SSL.METHOD: 'random' is the implemented branch; anything else
    raises like the reference's stamp generators (sampling.py:49)."""
    import pytest

    from advise_tpu.data.sampling import SpeedClipSampler

    s = SpeedClipSampler(
        num_clips=1, num_frames=2, stride=1, speed_range=[1, 2],
        jitter=0.0, method="uniform",
    )
    with pytest.raises(NotImplementedError, match="SSL.METHOD"):
        s(np.random.default_rng(0), 32, {})


def test_ssl_stat_names_and_margin_metric():
    """SSL.STAT renames the logged stats and the 'margin' metric wires
    SSL.MARGIN (reference tools/train.py:94-116)."""
    from advise_tpu.engine.steps import speed_task_loss
    from advise_tpu.models import build_model

    cfg = get_cfg()
    cfg.TASK = "speed"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.SSL.STAT = ["loss_spd", "acc_spd", "margin_spd"]
    cfg.SSL.METRIC = ["ce", "acc@1", "margin"]
    cfg.SSL.MARGIN = 0.7
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg = assert_and_infer_cfg(cfg)
    model = build_model(cfg, sync_axes=())
    x = jnp.zeros((2, 2, 2, 16, 16, 3), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[0], train=False,
    )
    infos = {"spd_label": jnp.zeros((2, 2), jnp.int32)}
    loss, (_, stats) = speed_task_loss(
        cfg, model, v["params"], v.get("batch_stats", {}), x, infos,
        jax.random.PRNGKey(2), train=False,
    )
    assert set(stats) == {"loss_spd", "acc_spd", "margin_spd"}
    assert np.isfinite(float(stats["margin_spd"]))


def test_local_shuffle_bn_axes():
    """CONTRASTIVE.LOCAL_SHUFFLE_BN=False shuffles over ALL batch axes
    (global gather), True over the 'sync' subgroup only (reference
    contrastive.py:187,219)."""
    from advise_tpu.engine import contrastive as C

    src = open(C.__file__).read()
    assert "LOCAL_SHUFFLE_BN" in src  # wired, not silently ignored
    from advise_tpu.parallel.collectives import batch_shuffle, batch_unshuffle
    from advise_tpu.parallel import build_mesh
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    cfg = get_cfg()
    cfg.TPU.MESH_SYNC = 4
    cfg.NUM_WORLDS = 8
    mesh = build_mesh(cfg)
    x = jnp.arange(16.0).reshape(16, 1)

    for axes in (("sync",), ("data", "sync")):
        f = shard_map(
            lambda v: batch_unshuffle(
                *batch_shuffle(v, jax.random.PRNGKey(0), axes), axes
            ),
            mesh=mesh, in_specs=P(("data", "sync")),
            out_specs=P(("data", "sync")), check_vma=False,
        )
        np.testing.assert_allclose(np.asarray(f(x)), np.asarray(x))
