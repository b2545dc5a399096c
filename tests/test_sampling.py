"""Stamp-generator math parity with the reference formulas
(reference datasets/sampling.py)."""

import numpy as np
import pytest

from advise_tpu.data import sampling as spl


def test_uniform_stamps_properties():
    rng = np.random.default_rng(0)
    for _ in range(50):
        st = spl.uniform_stamps(rng, 200, num_frames=8, stride=2)
        assert st.shape == (8,)
        assert st.dtype == np.int64
        # linspace(start, start+16, 8, endpoint=False) has stride exactly 2
        assert np.all(np.diff(st) == 2)
        assert st[0] >= 0 and st[-1] < 200


def test_speed_stamps_formula_matches_reference_math():
    """Reproduce the exact reference formula (sampling.py:166-186) for a
    pinned (start, jit) and compare."""
    video_length, T, stride, speed = 220, 8, 1, 4
    start, jit = 37, 1.13
    expected = np.mod(
        np.linspace(
            start, start + T * stride * speed * jit, num=T, endpoint=False,
            dtype=np.int64,
        ),
        video_length,
    )
    rng = np.random.default_rng(0)
    got = spl.speed_stamps(
        rng, video_length, T, stride, speed, jitter=0.2, start=start, speed_jit=jit
    )
    np.testing.assert_array_equal(got, expected)


def test_speed_stamps_negative_speed_reverses():
    rng = np.random.default_rng(1)
    fwd = spl.speed_stamps(np.random.default_rng(1), 220, 8, 1, 4, 0.0, start=10)
    rev = spl.speed_stamps(np.random.default_rng(1), 220, 8, 1, -4, 0.0, start=10)
    np.testing.assert_array_equal(rev, fwd[::-1])


def test_speed_stamps_wrap_modulo():
    rng = np.random.default_rng(2)
    st = spl.speed_stamps(rng, 50, 8, 1, 8, 0.0, start=45)
    assert st.max() < 50
    assert st.min() >= 0


def test_speed_jitter_bounds():
    """With jitter j, the last stamp spans at most T*stride*speed*(1+j)."""
    T, stride, speed, j = 8, 1, 8, 0.2
    for seed in range(200):
        rng = np.random.default_rng(seed)
        st = spl.speed_stamps(rng, 10_000, T, stride, speed, j, start=0)
        max_span = (T - 1) / T * T * stride * speed * (1 + j)
        assert st.max() <= max_span + 1


def test_speed_clip_sampler_labels():
    s = spl.SpeedClipSampler(
        num_clips=4, num_frames=8, stride=1, speed_range=[1, 2, 4, 8], jitter=0.2
    )
    rng = np.random.default_rng(3)
    stamps, infos = s(rng, 250, {})
    assert stamps.shape == (4, 8)
    assert infos["spd_label"].shape == (4,)
    assert np.all(infos["spd_label"] >= 0) and np.all(infos["spd_label"] < 4)


def test_tmodeling_sampler_returns_clips():
    """The reference TemporalModelingSampling forgets its return statement
    (SURVEY.md §8.1); ours must not."""
    s = spl.TemporalModelingSampler(
        num_clips=2, num_frames=8, stride=2, speed_range=[1, 2], jitter=0.1
    )
    rng = np.random.default_rng(4)
    stamps, infos = s(rng, 250, {})
    assert stamps is not None and stamps.shape == (2, 8)
    assert infos["starts"].shape == (2,)
    assert infos["stamps"].shape == (2, 8)
    assert infos["speeds"].shape == (2,)
    # too-short video -> (None, None), triggering the retry path
    assert s(rng, 10, {}) == (None, None)


def test_val_sampler_density():
    """One start per fps frames, each swept over all labels
    (reference sampling.py:238-278)."""
    s = spl.SpeedValSampler(
        num_frames=8, stride=1, speed_range=[1, 2, 4, 8], jitter=0.2, fps=25
    )
    rng = np.random.default_rng(5)
    stamps, infos = s(rng, 250, {})
    assert stamps.shape == (10 * 4, 8)
    np.testing.assert_array_equal(infos["spd_label"][:4], [0, 1, 2, 3])
    # short video still yields one start
    stamps, infos = s(rng, 10, {})
    assert stamps.shape == (4, 8)


def test_inference_sampler_views():
    s = spl.InferenceClipSampler(
        num_clips=10, num_crops=3, num_frames=8, stride=8, jitter=0.0,
        method="uniform",
    )
    rng = np.random.default_rng(6)
    stamps, _ = s(rng, 400, {})
    assert stamps.shape == (30, 8)
    # crops of the same clip share stamps (same start, same jit)
    np.testing.assert_array_equal(stamps[0], stamps[1])
    np.testing.assert_array_equal(stamps[0], stamps[2])
    # different clips differ
    assert not np.array_equal(stamps[0], stamps[3])


def test_interval_stamps():
    rng = np.random.default_rng(7)
    start, stamps = spl.interval_stamps(rng, 200, 8, 1, intervals=[1, 2, 4])
    assert len(stamps) == 8
    assert stamps[0] == start
    diffs = np.diff(stamps)
    assert set(diffs.tolist()) <= {1, 2, 4}
    assert stamps[-1] < 200
