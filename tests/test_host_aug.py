"""Host PIL aug path (TPU.DEVICE_AUG=False): reference-exact semantics."""

import numpy as np
from PIL import Image, ImageEnhance

from advise_tpu.config import assert_and_infer_cfg, get_cfg
from advise_tpu.data import build_loader
from advise_tpu.data.host_aug import SimpleHostAug


def _cfg():
    cfg = get_cfg()
    cfg.TASK = "speed"
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.DATA.SYNTHETIC_SIZE = 8
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.BATCHSIZE_PER_GPU = 1
    cfg.DATA.WORKERS = 2
    cfg.AUG.TYPE = "simple"
    cfg.AUG.RESIZE = [48, 40]
    cfg.AUG.TARGET_SIZE = 32
    cfg.TPU.DEVICE_AUG = False
    return assert_and_infer_cfg(cfg)


def test_loader_yields_normalized_floats_when_host_aug():
    cfg = _cfg()
    loader = build_loader(cfg, "train")
    clips, infos = next(iter(loader.epoch(0)))
    assert clips.dtype == np.float32
    assert clips.shape[2:] == (2, 32, 32, 3)
    assert clips.min() > -3.0 and clips.max() < 3.5


def test_per_clip_seed_shared_across_frames():
    """Static clip -> identical augmented frames (the reference's fixed
    per-clip seed, sampling.py:316-325)."""
    cfg = _cfg()
    aug = SimpleHostAug(cfg)
    frame = np.random.default_rng(0).integers(0, 256, (40, 48, 3), np.uint8)
    clip = np.stack([frame] * 3)
    out = aug(clip, seed=123)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], out[2])
    # different seeds -> different crops/colors
    out2 = aug(clip, seed=124)
    assert not np.array_equal(out[0], out2[0])


def test_host_aug_matches_manual_pil():
    """Full-chain oracle: recompute one frame with raw PIL calls and the
    same RNG stream; must match exactly."""
    import random

    cfg = _cfg()
    cfg.AUG.COLOR = [1.1, 0.4, 0.4, 0.4, 0.2]  # always apply color
    aug = SimpleHostAug(cfg)
    frame = np.random.default_rng(1).integers(0, 256, (40, 48, 3), np.uint8)
    out = aug(frame[None], seed=42)[0]

    rng = random.Random(42)
    img = Image.fromarray(frame).resize((48, 40), resample=Image.BILINEAR)
    k = 32
    top = rng.randint(1, 40 - k) - 1
    left = rng.randint(1, 48 - k) - 1
    img = img.crop((left, top, left + k, top + k))
    b = rng.uniform(0.6, 1.4)
    c = rng.uniform(0.6, 1.4)
    s = rng.uniform(0.6, 1.4)
    _h = rng.uniform(-0.2, 0.2)
    order = [0, 1, 2, 3]
    rng.shuffle(order)
    assert rng.random() < 1.1
    for op in order:
        if op == 0:
            img = ImageEnhance.Brightness(img).enhance(b)
        elif op == 1:
            img = ImageEnhance.Contrast(img).enhance(c)
        elif op == 2:
            img = ImageEnhance.Color(img).enhance(s)
    ref = (np.asarray(img, np.float32) / 255.0 - np.array(cfg.DATA.MEAN)) / np.array(
        cfg.DATA.STD
    )
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-6)
