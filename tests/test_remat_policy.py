"""Round-4 perf knobs: TPU.REMAT_POLICY, TPU.STEM_BARRIER,
TPU.AUG_COMPUTE_OUT.

All three are pure scheduling/layout levers — they must not change any
computed value:
- REMAT_POLICY picks what the per-stage nn.remat scopes save
  ('block_outs' pairs with ResStage's checkpoint_name tags).
- STEM_BARRIER pins stem conv outputs behind optimization_barrier.
- AUG_COMPUTE_OUT casts the aug output to compute dtype INSIDE the
  per-clip map body; with the knob off the engine casts after the map,
  so on == off.astype(bf16) exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.models import build_model


def _slowfast_cfg(**tpu):
    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.HEAD_ACT = "none"
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
    cfg.TPU.COMPUTE_DTYPE = "float32"
    for k, v in tpu.items():
        setattr(cfg.TPU, k, v)
    return assert_and_infer_cfg(cfg)


def _loss_and_grads(cfg, x):
    model = build_model(cfg, sync_axes=())
    variables = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False,
        )
    )()

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(o ** 2), o

    (l, o), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        variables["params"]
    )
    return np.asarray(o), g


@pytest.mark.parametrize(
    "tpu",
    [
        {"REMAT": True, "REMAT_POLICY": "block_outs"},
        {"REMAT": True, "REMAT_POLICY": "dots"},
        {"STEM_BARRIER": True},
        {"REMAT": True, "REMAT_POLICY": "block_outs", "STEM_BARRIER": True},
        {"REMAT": True, "REMAT_GRANULARITY": "block"},
    ],
    ids=["block_outs", "dots", "barrier", "block_outs+barrier",
         "block_granularity"],
)
def test_policy_and_barrier_grad_parity(tpu):
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 32, 32, 3)), jnp.float32
    )
    o_ref, g_ref = _loss_and_grads(_slowfast_cfg(), x)
    o, g = _loss_and_grads(_slowfast_cfg(**tpu), x)
    np.testing.assert_allclose(o_ref, o, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_unknown_policy_raises():
    from advise_tpu.models.utils import remat_policy

    cfg = get_cfg()
    cfg.TPU.REMAT_POLICY = "bogus"
    with pytest.raises(ValueError, match="REMAT_POLICY"):
        remat_policy(cfg)


@pytest.mark.parametrize("aug_type", ["aa", "rbyol", "simple"])
def test_aug_compute_out_bitexact(aug_type):
    """knob on == (knob off).astype(bf16): the cast only moves from after
    the per-clip map to inside it."""
    from advise_tpu.data import build_device_aug

    def make(knob):
        cfg = get_cfg()
        cfg.AUG.TYPE = aug_type
        cfg.AUG.TARGET_SIZE = 16
        cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.AUG_COMPUTE_OUT = knob
        return build_device_aug(assert_and_infer_cfg(cfg), "train")

    batch = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (2, 2, 4, 24, 20, 3)),
        jnp.uint8,
    )
    key = jax.random.PRNGKey(7)
    off = jax.jit(make(False))(batch, key)
    on = jax.jit(make(True))(batch, key)
    assert off.dtype == jnp.float32
    assert on.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(off.astype(jnp.bfloat16), np.float32),
        np.asarray(on, np.float32),
    )


def test_syncbn_bf16_normalize_parity():
    """The r4 BN dtype change (stats in f32, normalize FMA in the input
    dtype) must stay within one bf16 rounding of the all-f32 reference
    formulation, and be BIT-identical for f32 inputs."""
    from advise_tpu.models.layers.norm import SyncBatchNorm

    rng = np.random.default_rng(0)
    x64 = rng.normal(2.0, 3.0, (4, 2, 6, 6, 8))
    bn = SyncBatchNorm()
    v = bn.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x64, jnp.float32), True)

    def run(xdt):
        y, _ = bn.apply(
            v, jnp.asarray(x64, xdt), True, mutable=["batch_stats"]
        )
        return np.asarray(y, np.float64)

    y32 = run(jnp.float32)
    # f32 reference computed fully in f64 for ground truth
    mean = x64.mean((0, 1, 2, 3))
    var = x64.var((0, 1, 2, 3))
    ref = (x64 - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(y32, ref, rtol=2e-5, atol=2e-5)
    y16 = run(jnp.bfloat16)
    # bf16 has ~2^-8 relative precision; the FMA adds one rounding
    np.testing.assert_allclose(y16, ref, rtol=0.03, atol=0.03)
