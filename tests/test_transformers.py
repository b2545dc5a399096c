"""MViT / MaskMViT tests: variants forward+grad, schedule math, masking
invariants, masked-MSE semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.models import build_model
from advise_tpu.models.masked import (
    masked_mse,
    normalize_patches,
    patchify_3d,
    random_masking,
)
from advise_tpu.models.mvit import _pooled_thw, mvit_block_schedule


def _mvit_cfg(**over):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 1
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.DIM_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0], [3, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2], [3, 1, 2, 2]]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in over.items():
        parts = k.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def _run(cfg, bs=1):
    m = build_model(cfg, sync_axes=())
    x = jnp.zeros((bs, 4, 32, 32, 3), jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "mask": jax.random.PRNGKey(2),
    }
    v = jax.jit(lambda: m.init(rngs, x, train=False))()
    out = jax.jit(lambda v, x: m.apply(
        v, x, train=False, rngs={"mask": jax.random.PRNGKey(2)}
    ))(v, x)
    return m, v, out


def test_mvit_v2_forward():
    cfg = _mvit_cfg(**{
        "MVIT.REL_POS_SPATIAL": True,
        "MVIT.REL_POS_TEMPORAL": True,
        "MVIT.RESIDUAL_POOLING": True,
        "MVIT.DIM_MUL_IN_ATT": True,
    })
    _, v, out = _run(cfg)
    assert out.shape == (1, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_mvit_reversible_forward_and_grad():
    cfg = _mvit_cfg(**{"MVIT.REV.ENABLE": True, "MVIT.CLS_EMBED_ON": False})
    m, v, out = _run(cfg)
    assert out.shape == (1, 4)
    x = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
    g = jax.jit(jax.grad(
        lambda v: m.apply(
            v, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)}
        ).sum()
    ))(v)
    leaves = jax.tree_util.tree_leaves(g["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_schedule_dim_head_multipliers():
    cfg = _mvit_cfg()
    blocks, final = mvit_block_schedule(cfg, (2, 8, 8))
    assert blocks[0]["dim"] == 24
    # dim_mul at block 1 -> block 0's dim_out doubles (rounded to head div)
    assert blocks[1]["dim"] == blocks[0]["dim_out"]
    assert final == blocks[-1]["dim_out"]
    # adaptive KV stride decays by Q strides
    assert blocks[0]["stride_kv"] == [1, 4, 4]
    # adaptive: the running KV stride divides BEFORE assignment at a
    # Q-pooling block (reference video_model_builder.py:926-936)
    assert blocks[1]["stride_kv"] == [1, 2, 2]
    assert blocks[2]["stride_kv"] == [1, 2, 2]
    assert blocks[3]["stride_kv"] == [1, 1, 1]


def test_pooled_thw_matches_conv_arithmetic():
    assert _pooled_thw((3, 9, 9), [3, 3, 3], [1, 2, 2]) == (3, 5, 5)
    assert _pooled_thw((2, 8, 8), [3, 3, 3], [1, 2, 2]) == (2, 4, 4)
    assert _pooled_thw((2, 8, 8), [], []) == (2, 8, 8)


def test_random_masking_invariants():
    ids_keep, mask, ids_restore = random_masking(
        jax.random.PRNGKey(0), 4, (2, 4, 4), 0.75
    )
    l = 32
    assert mask.shape == (4, l)
    # exactly ratio masked
    np.testing.assert_array_equal(np.asarray(mask.sum(1)), 24.0)
    # kept ids are unmasked
    kept_mask = np.take_along_axis(
        np.asarray(mask), np.asarray(ids_keep), axis=1
    )
    assert (kept_mask == 0).all()


def test_tube_masking_consistent_across_time():
    _, mask, _ = random_masking(
        jax.random.PRNGKey(0), 2, (4, 2, 2), 0.5, tube=True
    )
    m = np.asarray(mask).reshape(2, 4, 4)
    for t in range(1, 4):
        np.testing.assert_array_equal(m[:, 0], m[:, t])


def test_patchify_roundtrip_values():
    imgs = jnp.arange(2 * 4 * 8 * 8 * 3, dtype=jnp.float32).reshape(
        2, 4, 8, 8, 3
    )
    patches = patchify_3d(imgs, p=4, u=2)
    assert patches.shape == (2, 2 * 2 * 2, 2 * 4 * 4 * 3)
    # first patch contains the image's top-left 4x4 of frames 0-1
    expect = imgs[:, 0:2, 0:4, 0:4].reshape(2, -1)
    np.testing.assert_array_equal(np.asarray(patches[:, 0]), np.asarray(expect))


def test_masked_mse_only_counts_masked():
    pred = jnp.zeros((1, 4, 2))
    label = jnp.ones((1, 4, 2))
    mask = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    assert float(masked_mse(pred, label, mask)) == 1.0
    # unmasked errors don't contribute
    pred2 = pred.at[0, 1].set(100.0)
    assert float(masked_mse(pred2, label, mask)) == 1.0


@pytest.mark.parametrize("variant", ["maskfeat_pixel", "maskfeat_hog", "mae"])
def test_maskmvit_variants(variant):
    cfg = _mvit_cfg()
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MASK.ENABLE = True
    cfg.MASK.PRETRAIN_DEPTH = [3]
    cfg.AUG.MASK_RATIO = 0.5
    # exercise the in-model random-mask path here; the loader-mask path
    # (MAE_RND_MASK=False) has its own test below
    cfg.MASK.MAE_RND_MASK = True
    if variant == "mae":
        cfg.MASK.MAE_ON = True
        cfg.MVIT.CLS_EMBED_ON = False
        cfg.MVIT.POOL_Q_STRIDE = []  # MAE: no Q pooling
        cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
        cfg.MASK.DECODER_DEPTH = 1
        cfg.MASK.DECODER_EMBED_DIM = 32
    elif variant == "maskfeat_hog":
        cfg.MASK.PRED_HOG = True
        cfg.MASK.PRED_HOG_CELL_SZ = 4
        cfg.MVIT.POOL_Q_STRIDE = []
        cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    else:
        cfg.MVIT.POOL_Q_STRIDE = []
        cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    m, v, out = _run(cfg)
    preds, labels, masks, weights = out
    assert len(preds) == len(labels) == len(masks) == 1
    assert preds[0].shape[-1] == labels[0].shape[-1] or cfg.MASK.MAE_ON
    loss = sum(
        w * masked_mse(p, l, mk)
        for p, l, mk, w in zip(preds, labels, masks, weights)
    )
    assert np.isfinite(float(loss))


def test_maskmvit_rev_intermediates():
    """Reversible + masked pretrain: boundary depths materialize fused
    intermediates; a depth INSIDE a reversible segment raises the
    explanatory assert instead of silently returning wrong features."""
    base = {
        "MVIT.REV.ENABLE": True,
        "MVIT.CLS_EMBED_ON": False,
        "MVIT.DEPTH": 6,
        "MVIT.DIM_MUL": [[2, 2.0]],
        "MVIT.HEAD_MUL": [[2, 2.0]],
        "MVIT.POOL_Q_STRIDE": [[2, 1, 2, 2]],
        "MVIT.POOL_KV_STRIDE_ADAPTIVE": None,
        "MVIT.DROPPATH_RATE": 0.0,
        "MODEL.MODEL_NAME": "MaskMViT",
        "MASK.ENABLE": True,
        "MASK.MAE_RND_MASK": True,
        "AUG.MASK_RATIO": 0.5,
    }
    cfg = _mvit_cfg(**base)
    cfg.MASK.PRETRAIN_DEPTH = [5]  # last block of the final segment: ok
    m, v, out = _run(cfg)
    preds, labels, masks, weights = out
    assert len(preds) == 1 and np.isfinite(np.asarray(preds[0])).all()

    # MaskMViT truncates the schedule to the LAST requested depth, so a
    # single depth always lands on a boundary; two depths with the first
    # inside the [3,6) uniform segment must raise the explanatory assert
    cfg_bad = _mvit_cfg(**base)
    cfg_bad.MASK.PRETRAIN_DEPTH = [3, 5]
    with pytest.raises(AssertionError, match="INSIDE a reversible segment"):
        _run(cfg_bad)


def test_mvit_rev_o1_scan_gradient_parity_deep():
    """The O(1) custom-VJP reversible path must produce the same loss and
    gradients as the identical coupling under plain autodiff (same stacked
    params, same rng keys), on a deep config with two stage transitions."""
    cfg = _mvit_cfg(**{
        "MVIT.REV.ENABLE": True,
        "MVIT.CLS_EMBED_ON": False,
        "MVIT.DEPTH": 10,
        "MVIT.DIM_MUL": [[2, 2.0], [6, 2.0]],
        "MVIT.HEAD_MUL": [[2, 2.0], [6, 2.0]],
        "MVIT.POOL_Q_STRIDE": [[2, 1, 2, 2], [6, 1, 2, 2]],
        "MVIT.DROPPATH_RATE": 0.1,
    })
    from advise_tpu.config.node import CfgRef
    from advise_tpu.models.mvit import MViT

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)).astype(np.float32)
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    def build(o1):
        cfg.MVIT.REV.O1_SCAN = o1
        return MViT(cfg=CfgRef(cfg), norm=None)

    m_scan = build(True)
    v = jax.jit(lambda: m_scan.init(rngs, x, train=False))()

    def loss(model, params):
        out = model.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.sum(out**2)

    l1, g1 = jax.value_and_grad(lambda p: loss(build(True), p))(v["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(build(False), p))(v["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )
    # the deep uniform segments actually became stacked reversible params
    seg_keys = [k for k in v["params"] if k.startswith("rev_seg")]
    assert seg_keys, list(v["params"])
    seg_lens = [
        jax.tree_util.tree_leaves(v["params"][k])[0].shape[0] for k in seg_keys
    ]
    assert max(seg_lens) >= 2, seg_lens  # >=2 blocks stacked in a segment


@pytest.mark.slow
def test_mvit_rev_o1_scan_memory_win():
    """XLA memory analysis: the reversible scan's backward must allocate a
    small fraction of the plain-autodiff coupling's temp memory (O(1) vs
    O(depth) activations). Measured r2: 423MB vs 4.76GB at depth16/32f."""
    from advise_tpu.config.node import CfgRef
    from advise_tpu.models.mvit import MViT

    def make(o1):
        cfg = get_cfg()
        cfg.MODEL.MODEL_NAME = "MViT"
        cfg.MODEL.NUM_CLASSES = 4
        cfg.MVIT.EMBED_DIM = 32
        cfg.MVIT.NUM_HEADS = 2
        cfg.MVIT.DEPTH = 12
        cfg.MVIT.CLS_EMBED_ON = False
        cfg.MVIT.REV.ENABLE = True
        cfg.MVIT.REV.O1_SCAN = o1
        cfg.DATA.NUM_FRAMES = 16
        cfg.DATA.TRAIN_CROP_SIZE = 48
        cfg.TPU.COMPUTE_DTYPE = "float32"
        return MViT(cfg=CfgRef(assert_and_infer_cfg(cfg)), norm=None)

    x = jnp.zeros((1, 16, 48, 48, 3), jnp.float32)
    m = make(True)
    v = jax.eval_shape(lambda: m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))
    v = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), v)

    def temp_bytes(o1):
        mm = make(o1)

        def loss(p):
            out = mm.apply(
                {"params": p}, x, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            return jnp.sum(out**2)

        ma = jax.jit(jax.grad(loss)).lower(v["params"]).compile().memory_analysis()
        return ma.temp_size_in_bytes

    scan_b, loop_b = temp_bytes(True), temp_bytes(False)
    assert scan_b < 0.25 * loop_b, (scan_b, loop_b)


def _rev_cfg(**over):
    base = {
        "MVIT.REV.ENABLE": True,
        "MVIT.CLS_EMBED_ON": False,
        "MVIT.DEPTH": 6,
        "MVIT.DIM_MUL": [[2, 2.0]],
        "MVIT.HEAD_MUL": [[2, 2.0]],
        "MVIT.POOL_Q_STRIDE": [[2, 1, 2, 2]],
        "MVIT.DROPPATH_RATE": 0.0,
    }
    base.update(over)
    return _mvit_cfg(**base)


def test_rev_buffer_layers_force_stage_transitions():
    """MVIT.REV.BUFFER_LAYERS (reference reversible_mvit.py:89) forces a
    listed layer out of its reversible segment into a buffered
    StageTransitionBlock: the param tree gains a ``blocks_<i>`` module
    and the surrounding uniform segment splits."""
    cfg = _rev_cfg()
    _, v, out = _run(cfg)
    names = set(v["params"])
    # structural transitions: dim change at 1, Q-pool at 2
    assert "blocks_1" in names and "blocks_2" in names
    assert "blocks_4" not in names

    def seg_lens(params):
        # each reversible segment stores stacked F and G param trees
        # (rev_seg<i>_f / rev_seg<i>_g) with the block count leading
        lens = []
        for k, sub in params.items():
            if k.startswith("rev_seg"):
                lens.append(jax.tree_util.tree_leaves(sub)[0].shape[0])
        return sorted(lens)

    # baseline: uniform segments [0,1) and [3,6)
    assert seg_lens(v["params"]) == [1, 1, 3, 3]

    cfg_b = _rev_cfg(**{"MVIT.REV.BUFFER_LAYERS": [4]})
    _, v_b, out_b = _run(cfg_b)
    names_b = set(v_b["params"])
    assert "blocks_4" in names_b  # forced buffer layer
    # [3,6) split into [3,4) and [5,6): every segment now single-block
    assert seg_lens(v_b["params"]) == [1, 1, 1, 1, 1, 1]
    assert np.isfinite(np.asarray(out_b)).all()


def test_rev_res_path_and_pre_q_fusion_semantics():
    """RES_PATH 'conv' (residual pooled through the attention's own
    pool_q conv+norm, reference :343,385-410) vs 'max' (stride+1 maxpool
    skip, :345-352) and PRE_Q_FUSION 'avg' vs 'max' (:46) are parameter-
    free structural switches: identical param trees, different outputs,
    finite gradients through the transition block."""
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 4, 32, 32, 3)).astype(np.float32)
    )
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    def make(**over):
        return build_model(_rev_cfg(**over), sync_axes=())

    m_conv = make(**{"MVIT.REV.RES_PATH": "conv"})
    v = m_conv.init(rngs, x, train=False)
    out_conv = m_conv.apply(v, x, train=False)

    # same tree (both residual paths are weight-sharing / parameterless)
    m_max = make(**{"MVIT.REV.RES_PATH": "max"})
    v_max = jax.eval_shape(lambda: m_max.init(rngs, x, train=False))
    assert (
        jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_max)
    )
    out_max = m_max.apply(v, x, train=False)
    assert not np.allclose(np.asarray(out_conv), np.asarray(out_max))

    # pre-q fusion applies to the two (diverged) reversible streams
    m_avg = make(**{"MVIT.REV.PRE_Q_FUSION": "avg"})
    m_fmax = make(**{"MVIT.REV.PRE_Q_FUSION": "max"})
    o_avg = m_avg.apply(v, x, train=False)
    o_fmax = m_fmax.apply(v, x, train=False)
    assert not np.allclose(np.asarray(o_avg), np.asarray(o_fmax))

    def loss(p):
        out = m_conv.apply(
            {"params": p}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g["blocks_2"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_rev_pre_q_fusion_concat_rejected():
    """The dim-doubling 'concat*' pre-q fusion modes are rejected loudly
    (assert_and_infer_cfg) rather than silently mis-shaping the stage."""
    cfg = _rev_cfg(**{"MVIT.REV.PRE_Q_FUSION": "concat_linear"})
    with pytest.raises(AssertionError, match="PRE_Q_FUSION"):
        assert_and_infer_cfg(cfg)
