"""Pipeline parallelism over the 'pipe' mesh axis (parallel/pipeline.py).

A beyond-reference capability (SURVEY §2.2: the reference is data-parallel
only): reversible-MViT uniform segments run GPipe-style — stage s of P
holds blocks [s*L/P, (s+1)*L/P), microbatches stream between stages via
lax.ppermute. These tests certify, on the virtual 8-device CPU mesh:

- the gpipe primitive in isolation: output AND gradients exactly match
  the serial program (including the psum-broadcast transpose correction);
- a full MaskMViT (MaskFeat, REV) train step at pipe=4 reproduces the
  pipe=1 step bit-for-bit in loss and to f32-reassociation tolerance in
  grad_norm / updated params;
- config validation rejects unsupported pipe combinations loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.pipeline import (
    PIPE_AXIS,
    gpipe,
    stage_slice,
    sync_cotangents,
)
from advise_tpu.solver import build_tx


# ---------------------------------------------------------------------------
# gpipe primitive vs the serial program
# ---------------------------------------------------------------------------


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), (PIPE_AXIS,))


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_gpipe_matches_serial(n_micro):
    """y = x @ w_0 ... @ w_{L-1} pipelined == serial, values and grads."""
    n_stage, depth, b, d = 4, 8, 4, 6
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(depth, d, d)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    mesh = _pipe_mesh(n_stage)

    def serial_loss(w, x):
        def body(h, wk):
            return jnp.tanh(h @ wk), None

        y, _ = jax.lax.scan(body, x, w)
        return (y**2).sum(), y

    (ref_loss, ref_y), ref_grads = jax.value_and_grad(
        serial_loss, argnums=(0, 1), has_aux=True
    )(w, x)

    def piped_loss(w, x):
        w, x = sync_cotangents((w, x))
        w_loc = stage_slice(w, n_stage)

        def stage(h, _m):
            def body(hh, wk):
                return jnp.tanh(hh @ wk), None

            out, _ = jax.lax.scan(body, h, w_loc)
            return out

        y = gpipe(stage, x, n_stage=n_stage, n_micro=n_micro)
        return (y**2).sum(), y

    fn = shard_map(
        lambda w, x: jax.value_and_grad(
            piped_loss, argnums=(0, 1), has_aux=True
        )(w, x),
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    (got_loss, got_y), got_grads = jax.jit(fn)(w, x)

    np.testing.assert_allclose(got_y, ref_y, atol=1e-6)
    np.testing.assert_allclose(got_loss, ref_loss, rtol=1e-6)
    for g, r in zip(got_grads, ref_grads):
        np.testing.assert_allclose(g, r, atol=1e-5)


def test_gpipe_microbatch_index_reaches_every_stage():
    """Every stage must see the TRUE microbatch index m for the ticket it
    holds (stochastic layers fold m into their RNG — a wrong or shared m
    re-correlates dropout masks across microbatches). stage_fn adds its m
    each hop: row r (its own microbatch, bm=1) must come out x + P*r."""
    n_stage = 4
    mesh = _pipe_mesh(n_stage)
    x = jnp.zeros((4, 2), jnp.float32)

    def run(x):
        return gpipe(
            lambda h, m: h + m.astype(h.dtype),
            x,
            n_stage=n_stage,
            n_micro=4,
        )

    out = jax.jit(
        shard_map(run, mesh=mesh, in_specs=P(), out_specs=P(),
                  check_vma=False)
    )(x)
    expect = np.repeat(np.arange(4.0) * n_stage, 2).reshape(4, 2)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_gpipe_rejects_bad_microbatch():
    mesh = _pipe_mesh(2)

    def run(x):
        return gpipe(lambda h, _m: h, x, n_stage=2, n_micro=3)

    with pytest.raises(AssertionError, match="not divisible"):
        jax.jit(
            shard_map(run, mesh=mesh, in_specs=P(), out_specs=P(),
                      check_vma=False)
        )(jnp.ones((4, 2)))


def test_stage_slice_rejects_indivisible():
    mesh = _pipe_mesh(4)

    def run(w):
        return stage_slice(w, 4)

    with pytest.raises(AssertionError, match="not divisible"):
        jax.jit(
            shard_map(run, mesh=mesh, in_specs=P(), out_specs=P(None),
                      check_vma=False)
        )(jnp.ones((6, 2)))


# ---------------------------------------------------------------------------
# full train step: pipe=4 vs pipe=1
# ---------------------------------------------------------------------------


def _mask_cfg(pipe):
    cfg = get_cfg()
    cfg.TASK = "masked"
    cfg.MODEL.MODEL_NAME = "MaskMViT"
    cfg.MVIT.EMBED_DIM = 16
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 8
    cfg.MVIT.DIM_MUL = []
    cfg.MVIT.HEAD_MUL = []
    cfg.MVIT.POOL_Q_STRIDE = []
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = None
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.MVIT.DROPPATH_RATE = 0.0
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.MVIT.REV.ENABLE = True
    cfg.MVIT.REV.O1_SCAN = True
    cfg.MASK.ENABLE = True
    cfg.MASK.MAE_ON = False
    cfg.MASK.MAE_RND_MASK = True
    cfg.MASK.PRETRAIN_DEPTH = [7]
    cfg.MASK.PRED_HOG = False
    cfg.AUG.MASK_RATIO = 0.5
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.AUG.TARGET_SIZE = 32
    cfg.DATA.NUM_CLIP = 1
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 1
    cfg.TPU.MESH_PIPE = pipe
    cfg.TPU.DONATE = False
    cfg.SOLVER.OPTIMIZING_METHOD = "adamw"
    cfg.NUM_WORLDS = 2
    return assert_and_infer_cfg(cfg)


def _run_step(cfg, devices, clips):
    mesh = build_mesh(cfg, devices=devices)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(
        lambda: model_init.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2)},
            x,
            train=False,
        )
    )()
    bundle = build_tx(cfg, v["params"])
    state = TrainState(
        params=v["params"],
        batch_stats=v.get("batch_stats", {}),
        opt_state=bundle.tx.init(v["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(cfg, mesh, model, bundle, device_aug=None)
    state, stats = step(
        state, clips, {}, jax.random.PRNGKey(0), jnp.float32(1e-3)
    )
    return state, {k: float(val) for k, val in stats.items()}, mesh


def test_pipelined_step_matches_plain():
    """MaskFeat train step on ('data'=2,'sync'=1,'pipe'=4) == the same
    global batch on ('data'=2): identical loss, matching grads/update."""
    devs = jax.devices()[:8]
    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.normal(size=(4, 1, 4, 32, 32, 3)).astype(np.float32)
    )
    s_pipe, stats_pipe, mesh_pipe = _run_step(_mask_cfg(4), devs, clips)
    assert dict(mesh_pipe.shape) == {"data": 2, "sync": 1, "pipe": 4}
    s_ref, stats_ref, _ = _run_step(_mask_cfg(1), devs[:2], clips)

    assert stats_pipe["loss_mask"] == pytest.approx(
        stats_ref["loss_mask"], abs=1e-6
    )
    assert stats_pipe["grad_norm"] == pytest.approx(
        stats_ref["grad_norm"], rel=1e-5
    )
    for (kp, a), (kr, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_pipe.params),
        jax.tree_util.tree_leaves_with_path(s_ref.params),
    ):
        assert kp == kr
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_short_segments_fall_back():
    """A DIM_MUL transition at depth 1 leaves a 1-block segment: it must
    run the plain (replicated) path while the long segment pipelines —
    the step still matches the unpipelined reference."""
    devs = jax.devices()[:8]

    def cfg_for(pipe):
        cfg = _mask_cfg(pipe)
        cfg.MVIT.DEPTH = 5
        # dim change at block 1 -> segments [0,1) transition [1] then [2,5)
        cfg.MVIT.DIM_MUL = [[1, 2.0]]
        cfg.MVIT.HEAD_MUL = [[1, 2.0]]
        cfg.MASK.PRETRAIN_DEPTH = [4]
        return cfg

    rng = np.random.default_rng(1)
    clips = jnp.asarray(
        rng.normal(size=(4, 1, 4, 32, 32, 3)).astype(np.float32)
    )
    # pipe=3 divides the 3-block tail segment but not the 1-block head
    s_pipe, stats_pipe, _ = _run_step(
        cfg_for(3), devs[:6], clips
    )  # data=2, pipe=3
    s_ref, stats_ref, _ = _run_step(cfg_for(1), devs[:2], clips)
    assert stats_pipe["loss_mask"] == pytest.approx(
        stats_ref["loss_mask"], abs=1e-6
    )
    assert stats_pipe["grad_norm"] == pytest.approx(
        stats_ref["grad_norm"], rel=1e-5
    )


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


def test_microbatch_droppath_decorrelated():
    """With drop-path active, different microbatches must draw DIFFERENT
    stochastic masks. Feed a batch of identical clips at bm=1 (n_micro =
    rows): under the shared-key bug every microbatch reused one key and
    all rows came out identical; with the per-microbatch fold-in the rows
    must differ."""
    devs = jax.devices()[:4]
    mesh = Mesh(np.asarray(devs), (PIPE_AXIS,))
    cfg = _mask_cfg(4)
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.TASK = "speed"
    cfg.MVIT.DROPPATH_RATE = 0.5
    cfg.MODEL.NUM_CLASSES = 4
    cfg.NUM_WORLDS = 1
    cfg = assert_and_infer_cfg(cfg)

    model = build_model(cfg)  # pipeline=True (MESH_PIPE=4)
    model_init = build_model(cfg, sync_axes=())
    x1 = jnp.ones((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(
        lambda: model_init.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x1,
            train=False,
        )
    )()
    clips = jnp.ones((4, 4, 32, 32, 3), jnp.float32)  # 4 IDENTICAL rows

    def fwd(params, x):
        return model.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )

    logits = jax.jit(
        shard_map(fwd, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
                  check_vma=False)
    )(v["params"], clips)
    logits = np.asarray(logits)
    assert logits.shape[0] == 4
    deltas = [
        float(np.abs(logits[i] - logits[0]).max()) for i in range(1, 4)
    ]
    assert any(d > 1e-6 for d in deltas), (
        f"identical rows produced identical outputs under drop-path — "
        f"microbatch RNGs are correlated (deltas {deltas})"
    )


def test_pipe_divides_no_segment_is_loud():
    """If NO reversible segment length divides by MESH_PIPE, the model
    must reject at trace time instead of silently running replicated."""
    devs = jax.devices()[:8]
    cfg = _mask_cfg(4)
    cfg.MVIT.DEPTH = 7  # one 7-block segment: 7 % 4 != 0
    cfg.MASK.PRETRAIN_DEPTH = [6]
    rng = np.random.default_rng(2)
    clips = jnp.asarray(
        rng.normal(size=(4, 1, 4, 32, 32, 3)).astype(np.float32)
    )
    with pytest.raises(AssertionError, match="divides none"):
        _run_step(cfg, devs, clips)


def test_pipe_validation_rejections():
    cfg = _mask_cfg(1)
    cfg.TPU.MESH_PIPE = 2
    cfg.MVIT.REV.ENABLE = False
    with pytest.raises(AssertionError, match="MVIT.REV.ENABLE"):
        assert_and_infer_cfg(cfg)

    cfg = _mask_cfg(1)
    cfg.TPU.MESH_PIPE = 2
    cfg.MODEL.MODEL_NAME = "ContrastiveModel"
    with pytest.raises(AssertionError, match="supports MViT/MaskMViT"):
        assert_and_infer_cfg(cfg)

    cfg = _mask_cfg(1)
    cfg.TPU.MESH_PIPE = 2
    cfg.TPU.MESH_SEQ = 2
    with pytest.raises(AssertionError, match="mutually exclusive"):
        assert_and_infer_cfg(cfg)
