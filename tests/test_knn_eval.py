"""Online kNN monitor e2e: the trainer fills the label bank from the
train dataset, the train step keeps writing knn_mem, and the epoch-end
probe (reference eval_knn protocol, models/contrastive.py:143-149 +
:233-241) reports a top-1 accuracy above chance on the synthetic set."""

import logging
import os
import re

import jax
import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.train import trainer


def _knn_cfg(tmp_path):
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(
            os.path.dirname(__file__), "..", "configs", "smoke",
            "byol_r10_synth.yaml",
        )
    )
    cfg.SOLVER.MAX_EPOCH = 3
    cfg.CONTRASTIVE.KNN_ON = True
    cfg.CONTRASTIVE.KNN_EVAL_BATCHES = 2
    cfg.DATA.SYNTHETIC_NUM_CLASSES = 4  # labels i % 4, chance 0.25
    # class-coded content: object colors derive from cls_id, so classes
    # are visually separable and bank neighbors cluster by class even
    # with a barely-trained encoder
    cfg.DATA.SYNTHETIC_CLASS_CODED = True
    # batch-stat probe: at this scale the BN running stats are barely
    # updated while the bank holds train-mode features, so the eval-mode
    # probe hovers at chance (measured; see CONTRASTIVE.KNN_BATCH_STATS)
    cfg.CONTRASTIVE.KNN_BATCH_STATS = True
    cfg.AUG.COLOR = [0.0, 0.0, 0.0, 0.0, 0.0]
    cfg.LOGDIR = str(tmp_path)
    cfg.RANK = 0
    return assert_and_infer_cfg(cfg)


@pytest.mark.slow
def test_knn_monitor_e2e(tmp_path, caplog):
    cfg = _knn_cfg(tmp_path)
    with caplog.at_level(logging.INFO, logger="advise_tpu.engine.train"):
        state = trainer(cfg)

    # the label bank was built from the dataset (classes i % 4, -1 pad)
    assert "knn_labels" in state.ssl
    labels = np.asarray(state.ssl["knn_labels"])
    assert labels.shape == (cfg.CONTRASTIVE.LENGTH,)
    np.testing.assert_array_equal(labels[:16], np.arange(16) % 4)

    # the epoch-end probe ran and logged an accuracy each epoch
    accs = [
        float(m) for m in re.findall(r"online kNN top-1: ([\d.]+)", caplog.text)
    ]
    assert len(accs) == cfg.SOLVER.MAX_EPOCH
    # after the bank has been written (epoch 0 visits every item), the
    # probe must beat 4-class chance: nearly-deterministic views of item
    # i retrieve bank row i, whose label is correct by construction
    assert accs[-1] > 0.3, accs
