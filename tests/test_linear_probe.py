"""E2E pretrain -> linear-probe protocol (the framework's north-star eval
path): BYOL pretrain on synthetic videos -> filtered checkpoint init of an
action-recog probe (cfg.RESUME, reference tools/train.py:316-319 +
utils/misc.py:117-152 semantics) -> frozen-backbone head training ->
multi-view action inference producing an accuracy."""

import os

import jax
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.inference import inference
from advise_tpu.engine.train import trainer
from advise_tpu.models import build_model

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _pretrain_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CFG_DIR, "smoke", "byol_r10_synth.yaml"))
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.LOGDIR = str(tmp_path / "pretrain")
    cfg.RANK = 0
    return assert_and_infer_cfg(cfg)


def _probe_cfg(tmp_path, resume):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CFG_DIR, "smoke", "byol_r10_synth.yaml"))
    # same backbone dims as pretrain; classification task, frozen backbone
    cfg.TASK = "action_recog"
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.LINEAR_PROBING = True
    cfg.RESUME = resume
    cfg.SSL.NUM_MLP_LAYERS = 1  # plain linear probe head
    cfg.DATA.NUM_CLIP = 1
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.INFER.NUM_CLIPS = 2
    cfg.INFER.NUM_CROPS = 1
    cfg.INFER.NUM_FRAMES = cfg.DATA.NUM_FRAMES
    cfg.INFER.RES = 24
    cfg.INFER.SEED = 0
    cfg.LOGDIR = str(tmp_path / "probe")
    cfg.RANK = 0
    return assert_and_infer_cfg(cfg)


@pytest.mark.slow
def test_pretrain_then_linear_probe_then_infer(tmp_path):
    # ---- phase 1: BYOL pretrain (ContrastiveModel wraps the backbone) ----
    pre_cfg = _pretrain_cfg(tmp_path)
    pre_state = trainer(pre_cfg)
    ckpt = os.path.join(pre_cfg.LOGDIR, "checkpoints", "Model_Epoch_0000")
    assert os.path.isdir(ckpt)

    # ---- phase 2: linear probe init'd from the pretrain checkpoint ----
    probe_cfg = _probe_cfg(tmp_path, ckpt)
    probe_state = trainer(probe_cfg)
    assert int(probe_state.step) > 0

    # backbone was LOADED from pretrain (backbone/ prefix stripped) and
    # FROZEN during probe training: stem conv must equal the pretrained one
    pre_backbone = pre_state.params["backbone"]
    stem_key = [k for k in pre_backbone if k not in ("head",)][0]
    pre_leaves = jax.tree_util.tree_leaves(pre_backbone[stem_key])
    probe_leaves = jax.tree_util.tree_leaves(probe_state.params[stem_key])
    assert len(pre_leaves) == len(probe_leaves)
    for a, b in zip(pre_leaves, probe_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the head did NOT come from the checkpoint and DID train: it must
    # differ from a fresh same-seed init
    from advise_tpu.engine.train import _TxProxy, build_train_state

    model_init = build_model(probe_cfg, sync_axes=())
    init_state = build_train_state(
        probe_cfg, model_init, _TxProxy(),
        jax.random.PRNGKey(probe_cfg.TRAIN.SEED),
    )
    head0 = jax.tree_util.tree_leaves(init_state.params["head"])
    head1 = jax.tree_util.tree_leaves(probe_state.params["head"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(head0, head1)
    ), "probe head never trained"

    # ---- phase 3: multi-view action inference yields an accuracy ----
    model = build_model(probe_cfg)
    acc, correct, total = inference(
        probe_cfg, model, probe_state, max_videos=4
    )
    assert total == 4
    assert 0.0 <= acc <= 1.0


@pytest.mark.slow
def test_maskfeat_pretrain_then_mvit_probe(tmp_path):
    """MaskFeat pretrain -> linear probe of the plain MViT (the
    transformer-flagship protocol): MaskMViT's trunk params live under
    'encoder/' (models/masked.py) and must flow into the bare-key MViT
    probe via load_pretrained's prefix strip — the reference gets the
    same mapping by MaskMViT SUBCLASSING MViT (reference masked.py:24)."""
    pre_cfg = get_cfg()
    pre_cfg.merge_from_file(
        os.path.join(CFG_DIR, "smoke", "maskfeat_synth.yaml")
    )
    pre_cfg.SOLVER.MAX_EPOCH = 1
    pre_cfg.LOGDIR = str(tmp_path / "pretrain")
    pre_cfg.RANK = 0
    pre_cfg = assert_and_infer_cfg(pre_cfg)
    pre_state = trainer(pre_cfg)
    ckpt = os.path.join(pre_cfg.LOGDIR, "checkpoints", "Model_Epoch_0000")
    assert os.path.isdir(ckpt)

    probe_cfg = get_cfg()
    probe_cfg.merge_from_file(
        os.path.join(CFG_DIR, "smoke", "maskfeat_synth.yaml")
    )
    probe_cfg.TASK = "action_recog"
    probe_cfg.MODEL.MODEL_NAME = "MViT"
    probe_cfg.MODEL.NUM_CLASSES = 4
    probe_cfg.MASK.ENABLE = False
    probe_cfg.LINEAR_PROBING = True
    probe_cfg.RESUME = ckpt
    probe_cfg.DATA.NUM_CLIP = 1
    probe_cfg.SOLVER.MAX_EPOCH = 1
    probe_cfg.INFER.NUM_CLIPS = 2
    probe_cfg.INFER.NUM_CROPS = 1
    probe_cfg.INFER.NUM_FRAMES = probe_cfg.DATA.NUM_FRAMES
    probe_cfg.INFER.RES = probe_cfg.AUG.TARGET_SIZE
    probe_cfg.INFER.SEED = 0
    probe_cfg.LOGDIR = str(tmp_path / "probe")
    probe_cfg.RANK = 0
    probe_cfg = assert_and_infer_cfg(probe_cfg)
    probe_state = trainer(probe_cfg)
    assert int(probe_state.step) > 0

    # trunk LOADED from the masked pretrain ('encoder/' stripped) and
    # FROZEN during the probe: patch_embed must match exactly
    pre_pe = jax.tree_util.tree_leaves(
        pre_state.params["encoder"]["patch_embed"]
    )
    probe_pe = jax.tree_util.tree_leaves(probe_state.params["patch_embed"])
    assert len(pre_pe) == len(probe_pe)
    for a, b in zip(pre_pe, probe_pe):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # multi-view inference runs end-to-end on the probed model
    model = build_model(probe_cfg)
    acc, correct, total = inference(
        probe_cfg, model, probe_state, max_videos=2
    )
    assert total == 2
    assert 0.0 <= acc <= 1.0
