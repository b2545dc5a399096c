"""Model zoo tests: shapes, param-count oracles, BN semantics."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from jax import shard_map
from jax.sharding import PartitionSpec as P

from advise_tpu.config import get_cfg
from advise_tpu.models import build_model
from advise_tpu.models.layers.norm import SyncBatchNorm
from advise_tpu.models.layers.operators import hog_features
from advise_tpu.parallel import BATCH_AXES, SYNC_AXIS, build_mesh


def _tiny_cfg(**over):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SSL.NUM_MLP_LAYERS = 1
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.BN.NORM_TYPE = "batchnorm"
    for k, v in over.items():
        node, key = k.split(".")
        cfg[node][key] = v
    return cfg


def test_resnet50_param_count_oracle():
    """R3D-50 slow, width 64, MLP head (2048->4096->4, BN): analytic count.

    Backbone: torchvision/PySlowFast r3d-50 slow = 31,636,288 conv/bn
    params (no fc). Head: 2048*4096 + BN(2*4096) + 4096*4 + 4 + 4096(bias
    handling) — asserted against the value computed once by hand:
    40,047,684 total (see SURVEY.md §2.4 ResNet row).
    """
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SSL.NUM_MLP_LAYERS = 2
    cfg.SSL.MLP_DIM = 4096
    cfg.RESNET.DEPTH = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg, sync_axes=())
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 8, 224, 224, 3), jnp.float32),
            train=False,
        )
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes["params"]))
    assert n == 40_047_684, n


@pytest.mark.parametrize("arch", ["slow", "c2d", "i3d", "slow_c2d"])
def test_resnet_arch_variants_forward(arch):
    cfg = _tiny_cfg()
    cfg.MODEL.ARCH = arch
    model = build_model(cfg, sync_axes=())
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )()
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    assert out.shape == (1, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_syncbn_matches_torch_batchnorm():
    """Single-replica SyncBatchNorm must match torch BatchNorm1d in train
    and eval (running-stat semantics incl. unbiased running var)."""
    rng = np.random.default_rng(0)
    x1 = rng.normal(2.0, 3.0, size=(16, 8)).astype(np.float32)
    x2 = rng.normal(-1.0, 0.5, size=(16, 8)).astype(np.float32)

    bn = SyncBatchNorm(momentum=0.1, sync_axes=())
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True)
    tb = torch.nn.BatchNorm1d(8, momentum=0.1)

    state = variables
    for x in (x1, x2):
        out, mut = bn.apply(
            state, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
        tout = tb(torch.tensor(x))
        np.testing.assert_allclose(
            np.asarray(out), tout.detach().numpy(), rtol=1e-4, atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["mean"]),
        tb.running_mean.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["var"]),
        tb.running_var.numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
    # eval mode uses running stats
    tb.eval()
    out = bn.apply(state, jnp.asarray(x1), train=False)
    np.testing.assert_allclose(
        np.asarray(out), tb(torch.tensor(x1)).detach().numpy(), rtol=1e-4, atol=1e-4
    )


def test_syncbn_subgroup_semantics():
    """BN stats sync over the sync axis only: two sync groups of 4 devices
    must normalize with their own group stats (reference NaiveSyncBN with
    NUM_SYNC_DEVICES=4, batchnorm_helper.py:16-37)."""
    cfg = get_cfg()
    cfg.TPU.MESH_SYNC = 4
    mesh = build_mesh(cfg)
    # batch of 8, one item per device; group 0 items ~ N(0), group 1 ~ N(10)
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [
            rng.normal(0, 1, size=(4, 6, 3)),
            rng.normal(10, 1, size=(4, 6, 3)),
        ]
    ).astype(np.float32)

    bn = SyncBatchNorm(sync_axes=(SYNC_AXIS,))
    # init outside shard_map must use train=False (no axis bound yet)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)

    def per_device(v):
        out, _ = bn.apply(variables, v, train=True, mutable=["batch_stats"])
        return out

    f = shard_map(
        per_device, mesh=mesh, in_specs=P(BATCH_AXES), out_specs=P(BATCH_AXES),
        check_vma=False,
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(x)))
    # each group should be normalized to ~zero mean by its own stats
    assert abs(out[:4].mean()) < 1e-3
    assert abs(out[4:].mean()) < 1e-3
    # global normalization would leave group means at roughly +-1; verify
    # per-group normalization actually differs from global
    global_normed = (x - x.mean((0, 1))) / x.std((0, 1))
    assert abs(global_normed[:4].mean()) > 0.5


def test_hog_features_shape_and_norm():
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    out = hog_features(jnp.asarray(frames), nbins=9, cell_sz=8)
    assert out.shape == (2, 4, 4, 27)
    norms = np.linalg.norm(np.asarray(out).reshape(2, 4, 4, -1), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_remat_variant_matches():
    cfg = _tiny_cfg()
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    )
    m1 = build_model(cfg, sync_axes=())
    v = jax.jit(lambda: m1.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    out1 = jax.jit(lambda v, x: m1.apply(v, x, train=False))(v, x)
    cfg.TPU.REMAT = True
    m2 = build_model(cfg, sync_axes=())
    out2 = jax.jit(lambda v, x: m2.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("arch", ["slowfast", "x3d", "swin"])
def test_remat_grad_parity_slowfast_x3d(arch):
    """TPU.REMAT was a silent no-op for SlowFast/X3D/Swin until round 3;
    now that the stage wrapper honors it, remat on/off must give the same
    forward and (to float tolerance) the same gradients."""
    from advise_tpu.config import assert_and_infer_cfg, get_cfg

    def make(remat):
        cfg = get_cfg()
        cfg.MODEL.NUM_CLASSES = 4
        cfg.MODEL.HEAD_ACT = "none"
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.REMAT = remat
        if arch == "slowfast":
            cfg.MODEL.MODEL_NAME = "SlowFast"
            cfg.MODEL.ARCH = "slowfast"
            cfg.RESNET.DEPTH = 10
            cfg.RESNET.TRANS_FUNC = "basic_transform"
            cfg.RESNET.WIDTH_PER_GROUP = 8
            cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1, 1]] * 4
            cfg.SLOWFAST.ALPHA = 2
            cfg.SLOWFAST.BETA_INV = 2
            cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
            cfg.SLOWFAST.FUSION_KERNEL_SZ = 3
        elif arch == "x3d":
            cfg.MODEL.MODEL_NAME = "X3D"
        else:
            cfg.MODEL.MODEL_NAME = "SwinTransformer3D"
            cfg.SWIN.EMBED_DIM = 8
            cfg.SWIN.DEPTHS = [1, 1]
            cfg.SWIN.NUM_HEADS = [2, 4]
            cfg.SWIN.PATCH_SIZE = [1, 2, 2]
            cfg.SWIN.WINDOW_SIZE = [2, 4, 4]
            cfg.SWIN.DROP_PATH_RATE = 0.0
        return build_model(assert_and_infer_cfg(cfg), sync_axes=())

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 32, 32, 3)), jnp.float32
    )
    outs, grads = [], []
    for remat in (False, True):
        model = make(remat)
        variables = jax.jit(
            lambda m=model: m.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)},
                x, train=False,
            )
        )()

        def loss(params, m=model, bs=variables.get("batch_stats")):
            v = {"params": params}
            if bs is not None:
                v["batch_stats"] = bs
            o, _ = m.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)},
            )
            return jnp.sum(o**2), o

        (l, o), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
            variables["params"]
        )
        outs.append(np.asarray(o))
        grads.append(g)
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads[0]),
        jax.tree_util.tree_leaves(grads[1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
