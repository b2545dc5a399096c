"""TRAIN.SEQUENTIAL (clip micro-batching) parity with the batched step."""

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.solver import build_tx


def _cfg(seq):
    cfg = get_cfg()
    cfg.TASK = "speed"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.SSL.NUM_MLP_LAYERS = 1
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "batchnorm"
    cfg.TRAIN.SEQUENTIAL = seq
    cfg.NUM_WORLDS = 8
    return assert_and_infer_cfg(cfg)


def test_sequential_matches_batched():
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.normal(size=(8, 2, 2, 16, 16, 3)).astype(np.float32))
    infos = {"spd_label": jnp.asarray(rng.integers(0, 4, size=(8, 2)))}
    results = {}
    for seq in (False, True):
        cfg = _cfg(seq)
        mesh = build_mesh(cfg)
        model = build_model(cfg)
        mi = build_model(cfg, sync_axes=())
        v = jax.jit(lambda: mi.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 2, 16, 16, 3), jnp.float32), train=False,
        ))()
        bundle = build_tx(cfg, v["params"])
        st = TrainState(
            params=v["params"], batch_stats=v.get("batch_stats", {}),
            opt_state=bundle.tx.init(v["params"]), step=jnp.zeros((), jnp.int32),
        )
        step = make_train_step(cfg, mesh, model, bundle, None)
        st, stats = step(st, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-2))
        results[seq] = (
            float(stats["loss_spd"]),
            np.asarray(jax.tree_util.tree_leaves(st.params)[0]),
        )
    # losses agree up to BN-batch-granularity differences (the reference's
    # sequential mode has the same property)
    assert abs(results[False][0] - results[True][0]) < 0.05
    np.testing.assert_allclose(
        results[False][1], results[True][1], atol=5e-3
    )
