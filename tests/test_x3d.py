"""X3D coverage: param-count oracle at X3D-M settings, forward/grad at a
CPU-friendly width, ContrastiveModel dispatch, and the Nonlocal block
(incl. the temporal-fold group path) which no other config exercises."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.models import build_model


def _x3d_cfg(**over):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.NUM_CLASSES = 400
    cfg.MODEL.HEAD_ACT = "softmax"
    cfg.MODEL.DROPOUT_RATE = 0.5
    for k, v in over.items():
        sec, key = k.split(".")
        cfg[sec][key] = v
    return assert_and_infer_cfg(cfg)


def test_x3d_m_param_oracle():
    """X3D-M (pyslowfast X3D_M.yaml settings the reference's builder
    reads: WIDTH_FACTOR 2.0, DEPTH_FACTOR 2.2, BOTTLENECK_FACTOR 2.25,
    DIM_C1 12, DIM_C5 2048, CHANNELWISE_3x3x3, 400 classes) must land on
    the published ~3.79M parameters — the end-to-end check of the
    round_width expansion math (reference video_model_builder.py:656-664:
    dim_res2..5 doubling at divisor 8, then the width multiplier) plus
    stage depths ceil(2.2 * [1,2,5,3]) and the conv5/head dims."""
    cfg = _x3d_cfg(**{"X3D.WIDTH_FACTOR": 2.0, "X3D.DEPTH_FACTOR": 2.2})
    model = build_model(cfg, sync_axes=())
    sample = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            sample, train=False,
        )
    )
    total = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(shapes["params"])
    )
    assert total == 3_794_322, total


def test_x3d_forward_and_grad():
    cfg = _x3d_cfg(**{"MODEL.NUM_CLASSES": 6, "MODEL.HEAD_ACT": "none"})
    model = build_model(cfg, sync_axes=())
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 32, 32, 3)), jnp.float32
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 6)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(o**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the backbone actually received gradient (stem conv moves)
    g_stem = g["s1"]["conv_xy"]["kernel"]
    assert float(jnp.abs(g_stem).max()) > 0


def test_x3d_via_contrastive_model():
    """ContrastiveModel ARCH='x3d' dispatch (reference _MODEL_TYPES,
    contrastive.py:20-29)."""
    cfg = _x3d_cfg(**{"MODEL.MODEL_NAME": "ContrastiveModel"})
    cfg.MODEL.ARCH = "x3d"
    cfg.CONTRASTIVE.TYPE = "moco"
    cfg.CONTRASTIVE.DIM = 16
    cfg.CONTRASTIVE.MLP_DIM = 32
    model = build_model(cfg, sync_axes=())
    x = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False)
    proj = out[0] if isinstance(out, (list, tuple)) else out
    assert proj.shape == (2, 16)


# ---------------------------------------------------------------------------
# Nonlocal
# ---------------------------------------------------------------------------


def _resstage(nl_inds, nl_group, nl_pool, instantiation="softmax"):
    from advise_tpu.models.layers.norm import get_norm
    from advise_tpu.models.layers.resnet import ResStage

    cfg = get_cfg()
    norm = get_norm(cfg, ())
    return ResStage(
        dim_in=[8],
        dim_out=[16],
        dim_inner=[4],
        temp_kernel_sizes=[[3]],
        stride=[1],
        num_blocks=[2],
        num_groups=[1],
        num_block_temp_kernel=[2],
        nonlocal_inds=[nl_inds],
        nonlocal_group=[nl_group],
        nonlocal_pool=nl_pool,
        instantiation=instantiation,
        trans_func_name="bottleneck_transform",
        stride_1x1=False,
        dilation=[1],
        norm=norm,
    )


@pytest.mark.parametrize("group", [1, 2])
def test_nonlocal_in_resstage(group):
    """NONLOCAL.LOCATION non-empty inserts Nonlocal after the flagged
    block (reference resnet_helper.py ResStage + nonlocal_helper.py
    :10-148); group=2 exercises the temporal-fold path (fold T groups
    into batch so attention is over T/group frames)."""
    stage = _resstage((0,), group, [[1, 2, 2]])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 8, 8, 8)), jnp.float32
    )
    variables = stage.init({"params": jax.random.PRNGKey(0)}, [x], train=False)
    assert any("nonlocal" in k for k in variables["params"])
    out = stage.apply(variables, [x], train=False)[0]
    assert out.shape == (2, 4, 8, 8, 16)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        o, _ = stage.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            [x], train=True, mutable=["batch_stats"],
        )
        return jnp.sum(o[0] ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g["pathway0_nonlocal0"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at init the zero-init output BN blocks upstream grads (identity
    # start, by design) — the BN scale itself must receive gradient
    g_scale = g["pathway0_nonlocal0"]["out_bn"]["scale"]
    assert float(jnp.abs(g_scale).max()) > 0


def test_nonlocal_identity_at_init():
    """The output BN of the Nonlocal block is zero-initialized (reference
    nonlocal_helper.py:84 zero_init_final_norm), so at init the block is
    exactly the identity: y = x + 0."""
    from advise_tpu.models.layers.nonlocal_block import Nonlocal
    from advise_tpu.models.layers.norm import get_norm

    cfg = get_cfg()
    block = Nonlocal(dim_inner=4, norm=get_norm(cfg, ()), group_size=2)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 4, 6, 6, 8)), jnp.float32
    )
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = block.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_nonlocal_group_folds_time():
    """group_size=2 must restrict attention to within each temporal half:
    perturbing frame 3 cannot change frames 0-1 (they live in the other
    fold), while a global (group=1) block would."""
    from advise_tpu.models.layers.nonlocal_block import Nonlocal
    from advise_tpu.models.layers.norm import get_norm

    cfg = get_cfg()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 8)), jnp.float32)
    x2 = x.at[0, 3].add(5.0)

    outs = {}
    for g in (1, 2):
        block = Nonlocal(dim_inner=4, norm=get_norm(cfg, ()), group_size=g)
        variables = block.init(
            {"params": jax.random.PRNGKey(0)}, x, train=False
        )
        # make the block non-identity: set the zero-init BN scale to 1
        variables = jax.tree_util.tree_map(lambda v: v, variables)
        params = variables["params"]
        params = jax.tree_util.tree_map(jnp.asarray, params)
        params["out_bn"]["scale"] = jnp.ones_like(params["out_bn"]["scale"])
        v2 = {"params": params, "batch_stats": variables["batch_stats"]}
        d = np.asarray(block.apply(v2, x2, train=False)) - np.asarray(
            block.apply(v2, x, train=False)
        )
        outs[g] = np.abs(d[0, :2]).max()  # change in the first two frames
    assert outs[1] > 1e-5  # global attention propagates the perturbation
    assert outs[2] < 1e-6  # folded groups isolate the halves
