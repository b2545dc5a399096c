"""Remote-storage backend (fsspec) behind video IO and checkpointing —
the reference's megfile/s3 smart_open surface (utils/misc.py:311-349,
datasets/video_dataset.py:30-34) exercised against memory://."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.engine.checkpoint import CheckpointManager, auto_resume
from advise_tpu.engine.state import TrainState
from advise_tpu.utils import storage


def test_smart_open_and_exists_memory_fs():
    with storage.smart_open("memory://st/a.txt", "wb") as f:
        f.write(b"hello")
    assert storage.smart_exists("memory://st/a.txt")
    with storage.smart_open("memory://st/a.txt", "rb") as f:
        assert f.read() == b"hello"
    assert not storage.smart_exists("memory://st/missing.txt")


def test_open_video_from_remote_npy(tmp_path):
    """A remote .npy video fetches through the cache and decodes."""
    from advise_tpu.data.video_io import open_video

    frames = np.random.default_rng(0).integers(
        0, 255, (5, 8, 8, 3), dtype=np.uint8
    )
    local = tmp_path / "vid.npy"
    np.save(local, frames)
    with storage.smart_open("memory://vids/vid.npy", "wb") as f:
        f.write(open(local, "rb").read())

    # clear the media cache so the fetch really happens
    import tempfile

    cache = os.path.join(tempfile.gettempdir(), "advise_tpu_media_cache")
    shutil.rmtree(cache, ignore_errors=True)

    reader = open_video("memory://vids/vid.npy")
    got = reader.get_frames([0, 2, 4])
    np.testing.assert_array_equal(got, frames[[0, 2, 4]])


def _state():
    return TrainState(
        params={"w": jnp.arange(4.0)},
        batch_stats={},
        opt_state=(),
        step=jnp.zeros((), jnp.int32),
    )


def test_checkpoint_remote_mirror_roundtrip(tmp_path):
    """Save mirrors to the remote URL; a cold restart (empty local dir)
    auto-resumes by fetching the newest epoch from the remote."""
    cfg = get_cfg()
    cfg.LOGDIR = str(tmp_path / "run")
    cfg.TRAIN.SAVE_FREQ = 1
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TRAIN.CHECKPOINT_REMOTE = "memory://ckpts/run1"
    cfg.SOLVER.MAX_EPOCH = 5

    state = _state()
    mgr = CheckpointManager(cfg)
    mgr.save(state, 0, {"loss_spd": 1.0})
    state2 = state.replace(params={"w": jnp.arange(4.0) * 2}, step=jnp.ones((), jnp.int32))
    mgr.save(state2, 1, {"loss_spd": 0.5})
    assert storage.smart_exists("memory://ckpts/run1/Model_Epoch_0001")

    # cold restart: wipe local checkpoints entirely
    shutil.rmtree(os.path.join(cfg.LOGDIR, "checkpoints"))
    mgr2 = CheckpointManager(cfg)
    restored, start, resumed = auto_resume(cfg, mgr2, _state())
    assert resumed and start == 2
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.arange(4.0) * 2
    )
