"""Config system tests: YACS-compatible surface, reference YAML parity."""

import math
import os
import tempfile

import pytest

from advise_tpu.config import (
    CfgNode,
    assert_and_infer_cfg,
    get_cfg,
    load_config,
    parse_args,
)


def test_defaults_reference_keys():
    """The key surface the reference recipes rely on must exist with the
    reference's default values (reference configs/defaults.py)."""
    cfg = get_cfg()
    assert cfg.NUM_GPUS == 4
    assert cfg.PIPELINE == ["train"]
    assert cfg.TASK == "tmodeling"
    assert cfg.SSL.RANGE == [1, 2, 4, 8]
    assert cfg.CONTRASTIVE.T == 0.07
    assert cfg.CONTRASTIVE.QUEUE_LEN == 65536
    assert cfg.CONTRASTIVE.DELTA_CLIPS_MIN == -math.inf
    assert cfg.SOLVER.WARMUP_EPOCHS == 10.0
    assert cfg.AUG.RAND_CROP_RATIO == (3.0 / 4.0, 4.0 / 3.0)
    assert cfg.RESNET.NUM_BLOCK_TEMP_KERNEL == [[3], [4], [6], [3]]
    assert cfg.BN.NUM_SYNC_DEVICES == 4
    assert cfg.MVIT.PATCH_STRIDE == [2, 4, 4]


def test_restored_nodes():
    """Nodes the reference fork dropped but its models read must be
    first-class here (SURVEY.md §0)."""
    cfg = get_cfg()
    assert cfg.SLOWFAST.ALPHA == 8
    assert cfg.SLOWFAST.BETA_INV == 8
    assert cfg.X3D.BOTTLENECK_FACTOR == 2.25
    assert cfg.MASK.PRETRAIN_DEPTH == [15]
    assert cfg.MVIT.REV.ENABLE is False
    assert cfg.DATA.TRAIN_CROP_SIZE == 224
    assert cfg.TRAIN.BATCH_SIZE == -1
    assert cfg.NUM_SHARDS == 1


def test_clone_isolation():
    a = get_cfg()
    b = get_cfg()
    a.SSL.RANGE.append(16)
    a.MODEL.NUM_CLASSES = 7
    assert b.SSL.RANGE == [1, 2, 4, 8]
    assert b.MODEL.NUM_CLASSES == 5


def test_merge_from_yaml(tmp_path):
    yaml_text = """
TASK: speed
MODEL:
    MODEL_NAME: ResNet
    NUM_CLASSES: 4
SOLVER:
    BASE_LR: 4e-2
    COSINE_AFTER_WARMUP: true
DATA:
    NUM_CLIP: 2
"""
    p = tmp_path / "test.yaml"
    p.write_text(yaml_text)
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.TASK == "speed"
    assert cfg.MODEL.NUM_CLASSES == 4
    assert cfg.SOLVER.BASE_LR == 0.04
    assert cfg.SOLVER.COSINE_AFTER_WARMUP is True
    assert cfg.DATA.NUM_CLIP == 2
    # untouched keys keep defaults
    assert cfg.MODEL.ARCH == "Slow"


def test_merge_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("NOT_A_KEY: 1\n")
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(p))


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(
        [
            "TASK", "speed",
            "SOLVER.BASE_LR", "0.01",
            "SSL.RANGE", "[1,2]",
            "TRAIN.AUTO_RESUME", "True",
            "DATA.DATADIR", "/data/videos",
        ]
    )
    assert cfg.TASK == "speed"
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.SSL.RANGE == [1, 2]
    assert cfg.TRAIN.AUTO_RESUME is True
    assert cfg.DATA.DATADIR == "/data/videos"


def test_merge_type_mismatch_raises():
    cfg = get_cfg()
    with pytest.raises(TypeError):
        cfg.merge_from_list(["SOLVER.BASE_LR", "'a-string'"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NOT_A_KEY", "1"])


def test_assert_and_infer_batch():
    cfg = get_cfg()
    cfg.DATA.BATCHSIZE_PER_GPU = 8
    cfg.NUM_GPUS = 4
    cfg = assert_and_infer_cfg(cfg)
    assert cfg.TRAIN.BATCH_SIZE == 32


def test_flash_relpos_fallback_is_loud(caplog):
    # TPU.FLASH_ATTENTION with rel-pos tables on: the rel-pos blocks are
    # flash-INELIGIBLE (attention.py runs them dense). The knob must not
    # be silently ignored — assert_and_infer_cfg warns.
    import logging

    cfg = get_cfg()
    cfg.TPU.FLASH_ATTENTION = True
    cfg.MVIT.REL_POS_SPATIAL = True
    with caplog.at_level(logging.WARNING, "advise_tpu.config.defaults"):
        assert_and_infer_cfg(cfg)
    assert any("flash-INELIGIBLE" in r.message for r in caplog.records)

    # rel-pos off: no warning
    cfg2 = get_cfg()
    cfg2.TPU.FLASH_ATTENTION = True
    caplog.clear()
    with caplog.at_level(logging.WARNING, "advise_tpu.config.defaults"):
        assert_and_infer_cfg(cfg2)
    assert not any("flash-INELIGIBLE" in r.message for r in caplog.records)


def test_parse_args_surface(tmp_path):
    p = tmp_path / "a.yaml"
    p.write_text("TASK: speed\n")
    args = parse_args(
        ["--cfg", str(p), "--output", "/tmp/run1", "SOLVER.BASE_LR", "0.5"]
    )
    cfg = load_config(args)
    assert cfg.TASK == "speed"
    assert cfg.LOGDIR == "/tmp/run1"
    assert cfg.SOLVER.BASE_LR == 0.5


def test_repo_yaml_presets_load():
    """Every YAML we ship must merge cleanly into the defaults."""
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True)
    assert files, "no preset configs found"
    for f in files:
        cfg = get_cfg()
        cfg.merge_from_file(f)
        assert_and_infer_cfg(cfg)


def test_pickle_roundtrip():
    import pickle

    cfg = get_cfg()
    cfg2 = pickle.loads(pickle.dumps(cfg))
    assert cfg2.SSL.RANGE == [1, 2, 4, 8]
    assert isinstance(cfg2.SSL, CfgNode)


def test_dead_knob_scan_clean():
    """Every config key has a reader or a written waiver — the mechanical
    scan (scripts/scan_dead_knobs.py) must stay green so new knobs can't
    silently go dead (the round-2/3 CONTRASTIVE.SEQUENTIAL failure mode)."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "scan_dead_knobs.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def _run_aot(args, timeout=1200):
    """Run the AOT certifier subprocess; retry once if another process
    holds the libtpu multi-process lockfile (concurrent pod compiles —
    the topology init is a machine-wide critical section)."""
    import subprocess
    import sys
    import os
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    cmd = [sys.executable, os.path.join(root, "scripts", "aot_mvitl.py")]
    for attempt in range(2):
        proc = subprocess.run(
            cmd + args, capture_output=True, text=True, timeout=timeout,
            env=env, cwd=root,
        )
        if proc.returncode == 0 or "libtpu multi-process lockfile" not in (
            proc.stdout + proc.stderr
        ):
            return proc
        if attempt == 0:
            time.sleep(60)
    return proc


def test_aot_mvitl_tiny_lowers():
    """The chipless TPU-AOT certification plumbing (scripts/aot_mvitl.py)
    stays green at tiny shape: topology devices, abstract-state tracing
    and StableHLO lowering (the stage that caught 4 of the 5 r4 geometry
    bugs). The REAL-shape compile + memory analysis (260.8M params,
    32x312: 13.26G/chip, FITS — BASELINE r4) runs the same code path
    without --tiny/--lower-only."""
    proc = _run_aot(["--tiny", "--lower-only"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "LOWERED OK" in proc.stdout, proc.stdout


def test_aot_certifier_speed_task_lowers():
    """The generalized certifier's task-specific infos (spd_label for
    TASK=speed — the branch that certified SpeedPro/X3D/AdViSe at pod
    scale, BASELINE r4) lower against a chipless topology using the tiny
    speed smoke preset."""
    proc = _run_aot(["--cfg", "configs/smoke/speed_r18_synth.yaml",
                     "--seq", "1", "--lower-only"])
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "LOWERED OK" in proc.stdout, proc.stdout
