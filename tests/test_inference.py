"""Action inference engine test (multi-clip x multi-crop)."""

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.inference import inference
from advise_tpu.engine.state import TrainState
from advise_tpu.models import build_model


def test_inference_multiview():
    cfg = get_cfg()
    cfg.TASK = "action_recog"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.HEAD_ACT = "none"
    cfg.SSL.NUM_MLP_LAYERS = 1
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.BN.NORM_TYPE = "batchnorm"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.DATA.SYNTHETIC_SIZE = 4
    cfg.DATA.SYNTHETIC_LENGTH = 100
    cfg.DATA.SYNTHETIC_NUM_CLASSES = 5
    cfg.INFER.NUM_CLIPS = 2
    cfg.INFER.NUM_CROPS = 2
    cfg.INFER.NUM_FRAMES = 4
    cfg.INFER.STRIDE = 2
    cfg.INFER.RES = 32
    cfg.INFER.BATCHSIZE_PER_GPU = 1
    cfg = assert_and_infer_cfg(cfg)

    model = build_model(cfg, sync_axes=())
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    ))()
    state = TrainState(
        params=v["params"], batch_stats=v.get("batch_stats", {}),
        opt_state=(), step=jnp.zeros((), jnp.int32),
    )
    acc, correct, total = inference(cfg, build_model(cfg), state, max_videos=4)
    assert total == 4
    assert 0.0 <= acc <= 1.0
