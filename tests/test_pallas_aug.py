"""Pallas fused-aug kernel: interpret-mode correctness vs a manual
reference of the same semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from advise_tpu.ops.pallas.fused_aug import fused_simple_aug

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def test_crop_normalize_exact_when_color_off():
    """With color probability 0 the kernel is crop+normalize; the crop
    offsets are recomputable from the same rng stream."""
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.integers(0, 256, (2, 3, 40, 48, 3), np.uint8))
    key = jax.random.PRNGKey(7)
    with pltpu.force_tpu_interpret_mode():
        out = fused_simple_aug(clips, key, size=32, color=(0.0, 0, 0, 0, 0))
    # reproduce the parameter stream
    keys = jax.random.split(key, 6)
    tops = np.asarray(jax.random.randint(keys[0], (2,), 0, 8))
    lefts = np.asarray(jax.random.randint(keys[1], (2,), 0, 16))
    ref = np.zeros((2, 3, 32, 32, 3), np.float32)
    c_np = np.asarray(clips, np.float32)
    for n in range(2):
        win = c_np[n, :, tops[n] : tops[n] + 32, lefts[n] : lefts[n] + 32]
        ref[n] = (win - np.array(MEAN) * 255) / (np.array(STD) * 255)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_color_path_bounded_and_param_shared_across_frames():
    rng = np.random.default_rng(1)
    # static clip: all frames identical -> augmented frames must match
    frame = rng.integers(0, 256, (40, 48, 3), np.uint8)
    clips = jnp.asarray(np.stack([np.stack([frame] * 3)] * 2))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            fused_simple_aug(
                clips, jax.random.PRNGKey(0), size=32,
                color=(1.1, 0.4, 0.4, 0.4, 0.2),
            )
        )
    assert np.isfinite(out).all()
    # same per-clip params for every frame (contrast mean identical on a
    # static clip)
    np.testing.assert_allclose(out[:, 0], out[:, 2], atol=1e-5)
    # ImageNet-normalized range
    assert out.min() > -3.0 and out.max() < 3.5


def test_bf16_emission_matches_f32_rounded():
    """out_dtype=bf16 (TPU.AUG_COMPUTE_OUT) is the f32 result rounded to
    bf16 — math stays f32 inside the kernel."""
    rng = np.random.default_rng(2)
    clips = jnp.asarray(rng.integers(0, 256, (2, 2, 40, 48, 3), np.uint8))
    key = jax.random.PRNGKey(11)
    with pltpu.force_tpu_interpret_mode():
        f32 = fused_simple_aug(clips, key, size=32)
        b16 = fused_simple_aug(clips, key, size=32, out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(b16), np.asarray(f32.astype(jnp.bfloat16))
    )
