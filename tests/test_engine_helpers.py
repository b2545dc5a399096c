"""Engine helpers: plateau LR controller, checkpoint best-criteria, meters."""

import numpy as np

from advise_tpu.config import get_cfg
from advise_tpu.engine.meters import AverageMeter, TrainingHelper
from advise_tpu.solver.lr_policy import PlateauController, get_lr_at_epoch


def test_plateau_controller_torch_semantics():
    """mode=min, factor=0.5, patience=5, threshold=1e-4 (reference
    utils/solver.py:71-99 ReduceLROnPlateau wiring)."""
    pc = PlateauController(base_lr=1.0)
    # improving metrics: lr stays
    for m in [1.0, 0.9, 0.8]:
        assert pc.step(m) == 1.0
    # stall for patience+1 epochs -> halve
    for _ in range(5):
        assert pc.step(0.8) == 1.0
    assert pc.step(0.8) == 0.5
    # counter reset after reduction
    for _ in range(5):
        assert pc.step(0.8) == 0.5
    assert pc.step(0.8) == 0.25
    # improvement must beat the relative threshold
    pc2 = PlateauController(base_lr=1.0, threshold=1e-2)
    pc2.step(1.0)
    for _ in range(5):
        pc2.step(0.995)  # within threshold -> counts as stall
    assert pc2.step(0.995) == 0.5


def test_plateau_warmup_lr():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "plateau"
    cfg.SOLVER.WARMUP_EPOCHS = 10.0
    cfg.SOLVER.WARMUP_START_LR = 0.0
    cfg.SOLVER.BASE_LR = 1.0
    assert abs(get_lr_at_epoch(cfg, 5.0) - 0.5) < 1e-9
    assert get_lr_at_epoch(cfg, 15.0) == 1.0  # post-warmup handled by controller


def test_average_meter_window():
    m = AverageMeter(window=3)
    for v in [1, 2, 3, 4]:
        m.update(v)
    assert m.avg == 2.5
    assert m.local_avg == 3.0  # last 3: 2,3,4
    assert m.val == 4


def test_training_helper_summary_has_pipeline_share():
    import time

    cfg = get_cfg()
    cfg.TRAIN.LOG_FREQ = 100
    h = TrainingHelper(cfg)
    h.epoch_start(0, 2)
    for it in range(2):
        h.iter_start()
        time.sleep(0.01)
        h.update_stats({"loss_spd": 1.0 - 0.1 * it})
        h.iter_end(it)
    s = h.epoch_end()
    assert "loss_spd" in s and "ep_time" in s
    assert 0.0 <= s.get("input_pipeline_share", 0.0) <= 1.0


def test_default_criteria_tracks_ssl_losses():
    """Best-checkpoint criteria must follow the task's own loss, not return
    a constant for SSL/masked tasks (round-1 advisor finding)."""
    from advise_tpu.engine.checkpoint import default_criteria

    assert default_criteria({"loss_spd": 0.3, "acc_spd": 0.5}) == 0.3
    assert default_criteria({"loss_nce": 1.2, "acc_ins": 0.1}) == 1.2
    assert default_criteria({"loss_byol": -0.8}) == -0.8
    assert default_criteria({"loss_mask": 0.05}) == 0.05
    assert default_criteria({"acc@1": 0.9}) == 0.0  # no loss at all


def test_save_freq_zero_disables_all_writes(tmp_path):
    """TRAIN.SAVE_FREQ <= 0 suppresses periodic AND best checkpoint writes
    (bench affordance: one Orbax save costs ~195 s over the relay tunnel)."""
    import jax.numpy as jnp

    from advise_tpu.engine.checkpoint import CheckpointManager
    from advise_tpu.engine.state import TrainState

    cfg = get_cfg()
    cfg.LOGDIR = str(tmp_path)
    cfg.TRAIN.SAVE_FREQ = 0
    cfg.SOLVER.MAX_EPOCH = 1
    state = TrainState(
        params={"w": jnp.ones((2,))}, batch_stats={}, opt_state=(),
        step=jnp.zeros((), jnp.int32),
    )
    mgr = CheckpointManager(cfg)
    mgr.save(state, 0, {"loss_nce": 0.5})  # last epoch + best-improving
    import os

    assert not os.path.exists(mgr._path("Model_Best"))
    assert not os.path.exists(mgr._path("Model_Epoch_0000"))


def test_best_criteria_survives_restart(tmp_path):
    """Model_Best's criteria value persists in the meta sidecar so a
    restarted run does not clobber a historically better checkpoint."""
    import jax
    import jax.numpy as jnp

    from advise_tpu.engine.checkpoint import CheckpointManager
    from advise_tpu.engine.state import TrainState

    cfg = get_cfg()
    cfg.LOGDIR = str(tmp_path)
    cfg.TRAIN.SAVE_FREQ = 100
    cfg.SOLVER.MAX_EPOCH = 100
    state = TrainState(
        params={"w": jnp.ones((2,))}, batch_stats={}, opt_state=(),
        step=jnp.zeros((), jnp.int32),
    )
    mgr = CheckpointManager(cfg)
    mgr.save(state, 0, {"loss_nce": 0.5})
    assert mgr.best == 0.5
    # fresh manager (simulated restart) reloads the best value
    mgr2 = CheckpointManager(cfg)
    assert mgr2.best == 0.5
    mgr2.save(state, 1, {"loss_nce": 0.7})  # worse: must NOT become best
    assert mgr2.best == 0.5
    meta = CheckpointManager._load_meta(mgr2._path("Model_Best"))
    assert meta["epoch"] == 0
