"""Real-file path: mp4 files + CSV label list -> cv2 decode -> loader ->
trainer. The synthetic backend bypasses label parsing and decode; this
covers the production ingest path end-to-end."""

import os

import numpy as np
import pytest

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.data import build_loader
from advise_tpu.data.dataset import parse_label_list
from advise_tpu.engine.train import trainer


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("ucf_mini")
    data = root / "videos"
    labels = root / "lists"
    data.mkdir()
    labels.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        name = f"class{i % 2}/vid_{i:02d}.mp4"
        (data / f"class{i % 2}").mkdir(exist_ok=True)
        wr = cv2.VideoWriter(
            str(data / name), cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48)
        )
        phase = rng.uniform(0, 50)
        for t in range(60):
            f = np.zeros((48, 64, 3), np.uint8)
            x = int(phase + t * (1 + i % 2) * 2) % 60
            f[:, x : x + 4] = (255, 128, 0)
            wr.write(f)
        wr.release()
        lines.append(f"{name} {i % 2}")
    (labels / "train.csv").write_text("\n".join(lines) + "\n")
    return str(data), str(labels)


def test_parse_label_list(video_dir):
    data_dir, label_dir = video_dir
    items = parse_label_list("ucf", label_dir, "train.csv")
    assert len(items) == 8
    assert items[0] == ("class0/vid_00.mp4", 0)


def _cfg(video_dir):
    data_dir, label_dir = video_dir
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs", "smoke",
                     "speed_r18_synth.yaml")
    )
    cfg.RESNET.DEPTH = 10
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TRAIN.SAVE_FREQ = 1
    cfg.PIPELINE = ["train"]
    cfg.DATA.DECODE_BACKEND = "auto"
    cfg.DATA.DATASET = "ucf"
    cfg.DATA.DATADIR = data_dir
    cfg.DATA.LABELDIR = label_dir
    cfg.DATA.SPLITFILE = "train.csv"
    cfg.RANK = 0
    return cfg


def test_loader_decodes_real_mp4s(video_dir):
    cfg = _cfg(video_dir)
    cfg = assert_and_infer_cfg(cfg)
    loader = build_loader(cfg, "train")
    clips, infos = next(iter(loader.epoch(0)))
    assert clips.dtype == np.uint8
    # ingest geometry from AUG.RESIZE [48, 40]
    assert clips.shape[2:] == (4, 40, 48, 3)
    assert set(np.asarray(infos["cls_id"]).tolist()) <= {0, 1}
    # content decoded (moving bar -> nonzero variance)
    assert clips.astype(np.float32).std() > 1.0


@pytest.mark.slow
def test_trainer_on_real_files(video_dir, tmp_path):
    cfg = _cfg(video_dir)
    cfg.LOGDIR = str(tmp_path)
    cfg = assert_and_infer_cfg(cfg)
    state = trainer(cfg)
    assert int(state.step) == 1  # 8 videos / global batch 8
