"""End-to-end trainer under TPU.PARTITION_MODE='auto': the full
`trainer()` loop (loader -> device_put over the ('data','model') mesh ->
GSPMD step -> checkpoint) with tensor-parallel + FSDP param shardings,
plus auto-resume keeping restored optimizer moments."""

import os

import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.train import trainer


def _auto_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "smoke",
                     "maskfeat_synth.yaml")
    )
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.SAVE_FREQ = 1
    cfg.DATA.SYNTHETIC_SIZE = 8
    cfg.DATA.BATCHSIZE_PER_GPU = 1
    cfg.TPU.PARTITION_MODE = "auto"
    cfg.TPU.MESH_MODEL = 2
    cfg.TPU.FSDP = True
    cfg.TPU.DONATE = False
    cfg.LOGDIR = str(tmp_path)
    cfg.RANK = 0
    return assert_and_infer_cfg(cfg)


@pytest.mark.slow
def test_auto_trainer_end_to_end(tmp_path):
    cfg = _auto_cfg(tmp_path)
    state = trainer(cfg)
    assert int(state.step) > 0
    # params still carry the tensor-parallel layout after training
    import jax

    from advise_tpu.parallel.mesh import MODEL_AXIS

    sharded = [
        x for x in jax.tree_util.tree_leaves(state.params)
        if MODEL_AXIS in [a for a in getattr(x.sharding, "spec", ()) if a]
    ]
    assert sharded, "no tensor-parallel params after auto-mode training"
    # checkpoints written; a fresh trainer auto-resumes past epoch 0
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert any(c.startswith("Model_Epoch") for c in ckpts), ckpts
    cfg2 = _auto_cfg(tmp_path)
    cfg2.SOLVER.MAX_EPOCH = 2
    state2 = trainer(cfg2)
    assert int(state2.step) > int(state.step)
