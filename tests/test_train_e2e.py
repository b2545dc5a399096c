"""End-to-end integration: the SURVEY.md §4 'minimum slice' smoke —
train on synthetic videos through the real trainer, loss decreases,
checkpoint round-trips, auto-resume works, validation produces a
confusion matrix."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.checkpoint import CheckpointManager, auto_resume
from advise_tpu.engine.train import trainer
from advise_tpu.engine.validate import validation
from advise_tpu.models import build_model


def _smoke_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "smoke",
                     "speed_r18_synth.yaml")
    )
    # shrink further for test speed: depth 10, 1 epoch x few steps
    cfg.RESNET.DEPTH = 10
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.SAVE_FREQ = 1
    cfg.DATA.SYNTHETIC_SIZE = 16
    cfg.LOGDIR = str(tmp_path)
    cfg.RANK = 0
    return assert_and_infer_cfg(cfg)


@pytest.mark.slow
def test_train_checkpoint_resume_validate(tmp_path):
    cfg = _smoke_cfg(tmp_path)
    state = trainer(cfg)
    assert int(state.step) == 2  # 16 items / global batch 8 = 2 steps

    # checkpoint written
    ckpt_dir = os.path.join(cfg.LOGDIR, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "Model_Epoch_0000"))
    assert os.path.isdir(os.path.join(ckpt_dir, "Model_Best"))

    # restore round-trip: params identical
    mgr = CheckpointManager(cfg)
    restored = mgr.restore(os.path.join(ckpt_dir, "Model_Epoch_0000"), state)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # auto-resume picks up epoch 0 -> start at 1 (== MAX_EPOCH, so trainer
    # would do nothing more)
    cfg.TRAIN.AUTO_RESUME = True
    _, start, resumed = auto_resume(cfg, mgr, state)
    assert start == 1 and resumed

    # validation over a couple of videos produces a dense confusion matrix
    model = build_model(cfg)
    conf = validation(cfg, model, state, max_videos=2)
    assert conf.shape == (4, 4)
    assert conf.sum() > 0
    assert os.path.exists(os.path.join(cfg.LOGDIR, "Metrics.csv"))
