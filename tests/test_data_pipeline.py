"""Dataset + loader + device-aug tests, including PIL golden parity for the
color ops (the reference's PIL semantics are the fidelity oracle,
SURVEY.md §7 hard part #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from advise_tpu.config import get_cfg
from advise_tpu.data import (
    build_dataset,
    build_device_aug,
    build_loader,
    ingest_geometry,
)
from advise_tpu.data import device_aug as da
from advise_tpu.data.video_io import ArrayReader, SyntheticReader


def _cfg(task="speed"):
    cfg = get_cfg()
    cfg.TASK = task
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.DATA.SYNTHETIC_SIZE = 12
    cfg.DATA.SYNTHETIC_LENGTH = 120
    cfg.DATA.NUM_CLIP = 2
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.BATCHSIZE_PER_GPU = 1  # 8 virtual devices -> global batch 8
    cfg.DATA.WORKERS = 2
    return cfg


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


def test_synthetic_reader_determinism():
    r1 = SyntheticReader(seed=7, length=50, res=64)
    r2 = SyntheticReader(seed=7, length=50, res=64)
    f1 = r1.get_frames([0, 10, 49])
    f2 = r2.get_frames([0, 10, 49])
    assert f1.shape == (3, 64, 64, 3) and f1.dtype == np.uint8
    np.testing.assert_array_equal(f1, f2)
    assert not np.array_equal(f1[0], f1[1])  # motion


def test_synthetic_reader_resize():
    r = SyntheticReader(seed=0, length=10, res=64)
    f = r.get_frames([0, 1], resize_wh=(48, 32))
    assert f.shape == (2, 32, 48, 3)


def test_array_reader():
    arr = np.random.default_rng(0).integers(0, 255, (20, 32, 40, 3), np.uint8)
    r = ArrayReader(arr)
    assert len(r) == 20
    np.testing.assert_array_equal(r.get_frames([3, 5]), arr[[3, 5]])


# ---------------------------------------------------------------------------
# dataset + loader
# ---------------------------------------------------------------------------


def test_cv2_reader_seek_matches_sequential(tmp_path):
    """CV2Reader's pre-roll seek + grab() skipping must return frames
    bit-identical to a plain frame-0..N sequential decode (the fallback
    guards codecs with unreliable seeks; mp4v here seeks accurately)."""
    cv2 = pytest.importorskip("cv2")
    from advise_tpu.data.video_io import CV2Reader

    path = str(tmp_path / "seek.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
    rng = np.random.default_rng(3)
    base = rng.integers(0, 255, (48, 64, 3), np.uint8)
    for t in range(120):
        f = np.roll(base, t * 3, axis=1).copy()
        f[:8, :8] = t  # frame index painted into a corner
        wr.write(f)
    wr.release()

    # ground truth: plain sequential decode with the same cv2 build
    cap = cv2.VideoCapture(path)
    seq = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        seq.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    assert len(seq) >= 100

    # strided read far into the file: exercises seek (min 70 >= threshold)
    idx = [70, 72, 74, 76, 94]
    got = CV2Reader(path).get_frames(idx)
    np.testing.assert_array_equal(got, np.stack([seq[i] for i in idx]))

    # near-start read: exercises the grab() path without seeking
    idx2 = [2, 5, 9]
    got2 = CV2Reader(path).get_frames(idx2)
    np.testing.assert_array_equal(got2, np.stack([seq[i] for i in idx2]))

    # a second get_frames on the same reader (probe capture consumed)
    got3 = CV2Reader(path)
    got3.get_frames(idx2)
    np.testing.assert_array_equal(
        got3.get_frames(idx), np.stack([seq[i] for i in idx])
    )


def test_dataset_item_shapes():
    cfg = _cfg()
    ds = build_dataset(cfg, "train")
    clips, infos = ds.get(0, np.random.default_rng(0))
    w, h = ingest_geometry(cfg, "train")
    assert clips.shape == (2, 4, h, w, 3)
    assert clips.dtype == np.uint8
    assert infos["spd_label"].shape == (2,)


def test_loader_batches_and_determinism():
    cfg = _cfg()
    loader = build_loader(cfg, "train")
    batches = list(loader.epoch(0))
    assert len(batches) == loader.steps_per_epoch()
    clips, infos = batches[0]
    assert clips.shape[0] == loader.batch_size
    assert clips.dtype == np.uint8
    assert infos["spd_label"].shape == (loader.batch_size, 2)

    # same epoch twice -> identical
    clips2, infos2 = next(iter(loader.epoch(0)))
    np.testing.assert_array_equal(clips, clips2)
    np.testing.assert_array_equal(infos["spd_label"], infos2["spd_label"])
    # different epoch -> different randomness (SURVEY.md §8.9 fix)
    clips3, _ = next(iter(loader.epoch(1)))
    assert not np.array_equal(clips, clips3)


def test_loader_multihost_sharding_covers_dataset():
    cfg = _cfg()
    loaders = [build_loader(cfg, "train") for _ in range(2)]
    for i, ld in enumerate(loaders):
        ld.rank, ld.world = i, 2
    idx0 = loaders[0].epoch_indices(0)
    idx1 = loaders[1].epoch_indices(0)
    assert len(idx0) == len(idx1)
    assert set(idx0.tolist()) | set(idx1.tolist()) == set(range(12))


# ---------------------------------------------------------------------------
# device aug: PIL golden parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rand_frame():
    return np.random.default_rng(0).integers(0, 256, (48, 64, 3), np.uint8)


def test_brightness_matches_pil(rand_frame):
    for factor in (0.6, 1.0, 1.4):
        pil = np.asarray(
            ImageEnhance.Brightness(Image.fromarray(rand_frame)).enhance(factor)
        )
        ours = np.asarray(
            da.adjust_brightness(jnp.asarray(rand_frame, jnp.float32)[None], factor)
        )[0]
        assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0


def test_contrast_matches_pil(rand_frame):
    for factor in (0.6, 1.0, 1.4):
        pil = np.asarray(
            ImageEnhance.Contrast(Image.fromarray(rand_frame)).enhance(factor)
        )
        ours = np.asarray(
            da.adjust_contrast(jnp.asarray(rand_frame, jnp.float32)[None], factor)
        )[0]
        assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0


def test_saturation_matches_pil(rand_frame):
    for factor in (0.6, 1.0, 1.4):
        pil = np.asarray(
            ImageEnhance.Color(Image.fromarray(rand_frame)).enhance(factor)
        )
        ours = np.asarray(
            da.adjust_saturation(jnp.asarray(rand_frame, jnp.float32)[None], factor)
        )[0]
        assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0


def test_grayscale_matches_pil(rand_frame):
    pil = np.asarray(
        ImageOps.grayscale(Image.fromarray(rand_frame)).convert("RGB")
    )
    gray = np.asarray(
        da.grayscale_clip(
            jnp.asarray(rand_frame, jnp.float32)[None],
            jax.random.PRNGKey(0),
            p=1.1,  # always apply
        )
    )[0]
    assert np.abs(gray - pil.astype(np.float32)).max() <= 1.0


def test_hsv_roundtrip():
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (8, 8, 3)), jnp.float32
    )
    back = da.hsv_to_rgb(da.rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_random_crop_within_bounds():
    clip = jnp.arange(2 * 16 * 20 * 3, dtype=jnp.float32).reshape(2, 16, 20, 3)
    out = da.random_crop_clip(clip, jax.random.PRNGKey(0), 8)
    assert out.shape == (2, 8, 8, 3)
    # values must exist in source
    assert np.isin(np.asarray(out), np.asarray(clip)).all()


def test_rrc_box_valid():
    for seed in range(20):
        box = da.sample_rrc_box(
            jax.random.PRNGKey(seed), 128, 160, (0.2, 1.0), (0.75, 4.0 / 3)
        )
        top, left, bh, bw = [float(v) for v in box]
        assert 0 <= top and top + bh <= 128 + 1e-3
        assert 0 <= left and left + bw <= 160 + 1e-3
        area_frac = (bh * bw) / (128 * 160)
        assert 0.15 <= area_frac <= 1.01


def test_simple_train_aug_end_to_end():
    cfg = _cfg()
    aug = build_device_aug(cfg, "train")
    w, h = ingest_geometry(cfg, "train")
    batch = np.random.default_rng(0).integers(0, 256, (2, 2, 4, h, w, 3), np.uint8)
    out = jax.jit(aug)(jnp.asarray(batch), jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 4, 224, 224, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    # ImageNet-normalized uint8 range
    assert o.min() > -3.0 and o.max() < 3.5
    # frames within a clip share crop+color params: crops of a static clip
    # must be identical across frames
    static = np.repeat(batch[:, :, :1], 4, axis=2)
    out2 = np.asarray(jax.jit(aug)(jnp.asarray(static), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(out2[:, :, 0], out2[:, :, 3], atol=1e-5)


def test_rrc_aug_shapes():
    cfg = _cfg()
    aug = build_device_aug(cfg, "speed")
    w, h = ingest_geometry(cfg, "speed")
    batch = np.random.default_rng(0).integers(0, 256, (1, 4, 4, h, w, 3), np.uint8)
    out = jax.jit(aug)(jnp.asarray(batch), jax.random.PRNGKey(0))
    assert out.shape == (1, 4, 4, 224, 224, 3)


def test_threaded_items_matches_serial_order_and_seeding():
    """Eval-phase threaded prefetch must be bit-identical to the serial
    dataset.get loop (same per-item SeedSequence, same order)."""
    import numpy as np

    from advise_tpu.data.loader import threaded_items

    class FakeDataset:
        def get(self, idx, rng):
            return np.full((2, 2), idx) + rng.integers(0, 1000), {"i": idx}

    ds = FakeDataset()
    serial = []
    for idx in range(17):
        rng = np.random.default_rng(np.random.SeedSequence([5, 0, idx]))
        serial.append(ds.get(idx, rng))
    threaded = list(
        threaded_items(ds, 17, lambda i: [5, 0, i], num_workers=4, lookahead=3)
    )
    assert [i for i, _ in threaded] == list(range(17))
    for (clips_s, infos_s), (_, (clips_t, infos_t)) in zip(serial, threaded):
        np.testing.assert_array_equal(clips_s, clips_t)
        assert infos_s == infos_t
