"""Learning-capability test: the full SPMD train step must memorize one
fixed batch (labels <-> clips alignment, gradient flow, optimizer, SyncBN
— any wiring bug breaks this)."""

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.data import build_device_aug, build_loader
from advise_tpu.engine.state import TrainState
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.solver import build_tx


def test_speed_task_memorizes_fixed_batch():
    cfg = get_cfg()
    cfg.TASK = "speed"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SSL.NUM_MLP_LAYERS = 2
    cfg.SSL.MLP_DIM = 64
    cfg.SSL.METRIC = ["ce", "acc@1"]
    cfg.RESNET.DEPTH = 10
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[1], [1], [1], [1]]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = 4
    cfg.TPU.DONATE = False
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.DATA.SYNTHETIC_SIZE = 8
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.BATCHSIZE_PER_GPU = 1
    cfg.AUG.TYPE = "none"  # no aug randomness: pure memorization
    cfg.AUG.TARGET_SIZE = 40
    cfg.AUG.RESIZE = [40, 40]
    cfg.NUM_WORLDS = 8
    cfg = assert_and_infer_cfg(cfg)

    mesh = build_mesh(cfg)
    loader = build_loader(cfg, "train")
    clips_np, infos_np = next(iter(loader.epoch(0)))
    clips = jnp.asarray(clips_np)
    infos = {"spd_label": jnp.asarray(infos_np["spd_label"])}

    model = build_model(cfg)
    mi = build_model(cfg, sync_axes=())
    v = jax.jit(lambda: mi.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4, 40, 40, 3), jnp.float32), train=False,
    ))()
    bundle = build_tx(cfg, v["params"])
    st = TrainState(
        params=v["params"], batch_stats=v.get("batch_stats", {}),
        opt_state=bundle.tx.init(v["params"]), step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(cfg, mesh, model, bundle, build_device_aug(cfg, "train"))
    acc = 0.0
    for i in range(40):
        st, stats = step(st, clips, infos, jax.random.PRNGKey(0), jnp.float32(0.02))
        acc = float(stats["acc_spd"])
        if acc == 1.0 and i > 5:
            break
    assert acc >= 0.9, f"failed to memorize a fixed batch (acc={acc})"
