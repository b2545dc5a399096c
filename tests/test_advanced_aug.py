"""RandAugment / RandomErasing / blur / camera-dynamics aug tests, with PIL
golden parity for the geometric and histogram ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageOps

from advise_tpu.config import get_cfg
from advise_tpu.data import build_device_aug
from advise_tpu.data import rand_augment as ra
from advise_tpu.data.erasing import (
    clip_random_resized_crop,
    gaussian_blur_clip,
    random_erasing_clip,
)
from advise_tpu.data.masking import MaskingGenerator, MaskingGenerator3D


@pytest.fixture(scope="module")
def frame():
    return np.random.default_rng(0).integers(0, 256, (32, 40, 3), np.uint8)


def _ours(fn, frame, *args):
    return np.asarray(fn(jnp.asarray(frame, jnp.float32)[None], *args))[0]


def test_invert_matches_pil(frame):
    pil = np.asarray(ImageOps.invert(Image.fromarray(frame)))
    ours = _ours(ra.invert, frame)
    np.testing.assert_allclose(ours, pil.astype(np.float32), atol=1.0)


def test_autocontrast_matches_pil(frame):
    pil = np.asarray(ImageOps.autocontrast(Image.fromarray(frame)))
    ours = _ours(ra.autocontrast, frame)
    assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0


def test_equalize_matches_pil(frame):
    pil = np.asarray(ImageOps.equalize(Image.fromarray(frame)))
    ours = _ours(ra.equalize, frame)
    assert np.abs(ours - pil.astype(np.float32)).max() <= 1.0


def test_posterize_matches_pil(frame):
    for bits in (1, 2, 4, 7):
        pil = np.asarray(ImageOps.posterize(Image.fromarray(frame), bits))
        ours = _ours(ra.posterize, frame, jnp.float32(bits))
        np.testing.assert_array_equal(ours, pil.astype(np.float32))


def test_solarize_matches_pil(frame):
    for th in (64, 128, 200):
        pil = np.asarray(ImageOps.solarize(Image.fromarray(frame), th))
        ours = _ours(ra.solarize, frame, float(th))
        np.testing.assert_array_equal(ours, pil.astype(np.float32))


def test_rotate_matches_pil(frame):
    pil = np.asarray(
        Image.fromarray(frame).rotate(
            -17.0, resample=Image.BILINEAR, fillcolor=(128, 128, 128)
        )
    )
    ours = _ours(ra.rotate, frame, jnp.float32(17.0))
    # bilinear edge/fill blending differs at rotation boundaries (PIL
    # blends partially-covered border pixels with fillcolor)
    close = np.abs(ours - pil.astype(np.float32)) <= 2.0
    assert close.mean() > 0.95


def test_translate_shifts_content(frame):
    ours = _ours(ra.translate_x, frame, jnp.float32(0.25))
    shift = int(0.25 * frame.shape[1])
    np.testing.assert_allclose(
        ours[:, : frame.shape[1] - shift],
        frame.astype(np.float32)[:, shift:],
        atol=1.0,
    )
    assert (ours[:, -shift:] == 128.0).all()


def test_sharpness_identity_at_factor_one(frame):
    ours = _ours(ra.sharpness, frame, jnp.float32(1.0))
    np.testing.assert_allclose(ours, frame.astype(np.float32), atol=1.0)


def test_rand_augment_pipeline_runs(frame):
    apply = ra.make_rand_augment("rand-m7-n4-mstd0.5-inc1")
    clip = jnp.asarray(np.stack([frame] * 4), jnp.float32)
    out = jax.jit(apply)(clip, jax.random.PRNGKey(0))
    assert out.shape == clip.shape
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 255
    # different keys -> different policies
    out2 = jax.jit(apply)(clip, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_random_erasing_region_and_prob(frame):
    clip = jnp.asarray(np.stack([frame] * 2), jnp.float32)
    out = np.asarray(
        random_erasing_clip(clip, jax.random.PRNGKey(0), probability=1.1)
    )
    changed = (out != np.asarray(clip)).any(axis=-1)
    assert changed.any()
    # cube mode: same region across frames
    np.testing.assert_array_equal(changed[0], changed[1])
    # probability 0 -> no-op
    out0 = np.asarray(
        random_erasing_clip(clip, jax.random.PRNGKey(0), probability=-1.0)
    )
    np.testing.assert_array_equal(out0, np.asarray(clip))


def test_gaussian_blur_smooths(frame):
    clip = jnp.asarray(np.stack([frame] * 2), jnp.float32)
    out = np.asarray(gaussian_blur_clip(clip, jax.random.PRNGKey(0)))
    assert out.shape == clip.shape
    # variance reduced by smoothing
    assert out[0].std() < frame.astype(np.float32).std()


def test_clip_random_resized_crop_dynamics(frame):
    clip = jnp.asarray(np.stack([frame] * 6), jnp.float32)
    out = clip_random_resized_crop(
        clip, jax.random.PRNGKey(0), size=24,
        scale=(0.4, 0.9), jitter=0.05, shift=0.2, zoom=0.2,
        brightness=0.2, saturation=0.2, white_balance=0.1,
    )
    o = np.asarray(out)
    assert o.shape == (6, 24, 24, 3)
    # camera motion: identical source frames produce different crops per t
    assert not np.allclose(o[0], o[-1])


@pytest.mark.parametrize("fused", [True, False])
def test_aa_device_aug_end_to_end(fused):
    cfg = get_cfg()
    cfg.AUG.TYPE = "aa"
    cfg.AUG.TARGET_SIZE = 32
    cfg.AUG.AA_TYPE = "rand-m7-n2-mstd0.5-inc1"
    cfg.AUG.RE_PROB = 0.25
    cfg.AUG.FUSED_RA = fused
    aug = build_device_aug(cfg, "train")
    batch = np.random.default_rng(0).integers(0, 256, (2, 2, 4, 40, 48, 3), np.uint8)
    out = jax.jit(aug)(jnp.asarray(batch), jax.random.PRNGKey(0))
    assert out.shape == (2, 2, 4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # normalized output should not be constant (degenerate warp would be)
    assert np.asarray(out).std() > 0.1


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ra_batched_bit_exact_vs_serial_fused(seed):
    """AUG.RA_BATCHED (vmapped warp + slot-phase color + while-loop
    equalize) must be BIT-EXACT vs the per-clip serial fused path: same
    key -> identical plans -> identical output. Elementwise ops are
    IEEE-deterministic and every reduction feeding a result is either
    order-free (min/max) or an exact integer sum in f32 (contrast mean,
    equalize histogram)."""
    cfg = get_cfg()
    cfg.AUG.TYPE = "aa"
    cfg.AUG.TARGET_SIZE = 32
    # n8 makes each clip draw 8 slots: high op coverage per key
    cfg.AUG.AA_TYPE = "rand-m7-n8-mstd0.5-inc1"
    cfg.AUG.RE_PROB = 0.25
    cfg.AUG.FUSED_RA = True
    batch = np.random.default_rng(seed).integers(
        0, 256, (3, 2, 4, 40, 48, 3), np.uint8
    )
    key = jax.random.PRNGKey(seed)
    outs = {}
    for batched in (False, True):
        cfg.AUG.RA_BATCHED = batched
        aug = build_device_aug(cfg, "train")
        outs[batched] = np.asarray(jax.jit(aug)(jnp.asarray(batch), key))
    np.testing.assert_array_equal(outs[True], outs[False])


def test_ra_batched_covers_equalize():
    """Force every slot to be equalize-heavy (n1, several clips) and check
    the while-loop path actually equalizes: with magnitude tables the op
    draw is uniform, so over enough clips/keys at least one equalize runs
    and the output differs from a no-color-op warp."""
    from advise_tpu.data import rand_augment as ra_mod

    apply = ra_mod.make_batched_color_apply("rand-m7-n2-mstd0.5-inc1")
    n_clips, n_slots = 6, 2
    clips = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (n_clips, 2, 16, 16, 3)),
        jnp.float32,
    )
    # hand-built plan: every clip's slot 0 = equalize, slot 1 = identity(rot)
    keys = jnp.stack(
        [jax.random.split(jax.random.PRNGKey(i), n_slots) for i in range(n_clips)]
    )
    plan = {
        "sel": jnp.tile(
            jnp.asarray([[ra_mod.OP_EQUALIZE, ra_mod.GEO_ROTATE]]), (n_clips, 1)
        ),
        "keys": keys,
        "m_eff": jnp.full((n_clips, n_slots), 7.0),
    }
    out = np.asarray(jax.jit(apply)(clips, plan))
    for b in range(n_clips):
        expect = np.asarray(ra_mod.equalize(clips[b]))
        np.testing.assert_array_equal(out[b], expect)


def test_fused_warp_single_rotate_matches_exact():
    """With an identity RRC box, no flip, and a plan holding exactly one
    rotate slot, the fused composed warp IS a single bilinear rotate — it
    must match the exact-path `rotate` wherever all 4 sampling corners are
    in bounds (border pixels differ by fill-vs-clamp blending)."""
    size = 32
    clip = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (3, size, size, 3)),
        jnp.float32,
    )
    m_eff = jnp.float32(7.0)
    sign = jnp.float32(1.0)
    mat = ra._slot_inv_matrix(
        jnp.int32(ra.GEO_ROTATE), sign, m_eff, 0.3, 0.45, 30.0, size
    )
    ident = ra._slot_inv_matrix(
        jnp.int32(0), sign, m_eff, 0.3, 0.45, 30.0, size
    )
    plan = {
        "mats": jnp.stack([mat, ident]),
        "is_geo": jnp.asarray([True, False]),
    }
    box = (jnp.float32(0), jnp.float32(0), jnp.float32(size), jnp.float32(size))
    sx, sy, valid = ra.fused_warp_coords(plan, box, jnp.asarray(False), size)
    fused = np.asarray(ra.warp_gather(clip, sx, sy, valid))
    exact = np.asarray(ra.rotate(clip, 21.0))  # lvl(7, 30) = 21 degrees
    interior = (
        (np.asarray(sx) >= 0) & (np.asarray(sx) <= size - 2)
        & (np.asarray(sy) >= 0) & (np.asarray(sy) <= size - 2)
    )
    mask = np.broadcast_to(interior[None, :, :, None], fused.shape)
    np.testing.assert_allclose(fused[mask], exact[mask], atol=1.0)


def test_fused_warp_shear_translate_compose():
    """Composing shear_x then translate_x in one warp matches the
    sequential exact ops away from the border (single resample vs double:
    shear/translate with integer-free offsets interpolate twice in the
    exact path, so tolerance is wider but structure must align)."""
    size = 24
    rng = np.random.default_rng(2)
    base = np.zeros((1, size, size, 3), np.float32)
    base[:, 8:16, 8:16, :] = 200.0  # a block whose motion is easy to check
    clip = jnp.asarray(base)
    m_eff = jnp.float32(5.0)
    mat_shear = ra._slot_inv_matrix(
        jnp.int32(ra.GEO_SHEAR_X), jnp.float32(1.0), m_eff, 0.3, 0.45, 30.0, size
    )
    mat_trans = ra._slot_inv_matrix(
        jnp.int32(ra.GEO_TRANS_X), jnp.float32(1.0), m_eff, 0.3, 0.45, 30.0, size
    )
    plan = {
        "mats": jnp.stack([mat_shear, mat_trans]),
        "is_geo": jnp.asarray([True, True]),
    }
    box = (jnp.float32(0), jnp.float32(0), jnp.float32(size), jnp.float32(size))
    sx, sy, valid = ra.fused_warp_coords(plan, box, jnp.asarray(False), size)
    fused = np.asarray(ra.warp_gather(clip, sx, sy, valid))
    seq = np.asarray(
        ra.translate_x(ra.shear_x(clip, 0.15), 0.225)
    )  # lvl(5,0.3)=0.15, lvl(5,0.45)=0.225
    # block centroid must land in the same place (sub-pixel agreement)
    fy, fx = np.nonzero(fused[0, :, :, 0] > 100)[0], np.nonzero(fused[0, :, :, 0] > 100)[1]
    sy_, sx_ = np.nonzero(seq[0, :, :, 0] > 100)[0], np.nonzero(seq[0, :, :, 0] > 100)[1]
    assert abs(fy.mean() - sy_.mean()) < 1.0
    assert abs(fx.mean() - sx_.mean()) < 1.0


def test_rbyol_device_aug():
    cfg = get_cfg()
    cfg.AUG.TYPE = "rbyol"
    cfg.AUG.TARGET_SIZE = 32
    aug = build_device_aug(cfg, "train")
    batch = np.random.default_rng(0).integers(0, 256, (1, 2, 4, 40, 48, 3), np.uint8)
    out = jax.jit(aug)(jnp.asarray(batch), jax.random.PRNGKey(0))
    assert out.shape == (1, 2, 4, 32, 32, 3)


def test_masking_generators():
    gen = MaskingGenerator((8, 8), num_masking_patches=20)
    m = gen(np.random.default_rng(0))
    assert m.shape == (8, 8)
    assert 0 < m.sum() <= 24
    gen3 = MaskingGenerator3D((2, 8, 8), num_masking_patches=40)
    m3 = gen3(np.random.default_rng(0))
    assert m3.shape == (2, 8, 8)
    assert m3.sum() > 0


def test_rotate_bicubic_matches_pil(frame):
    """AUG.INTERPOLATION='bicubic': PIL's TRANSFORM bicubic is the keys
    kernel with a = -1.0 (Geometry.c — not the a=-0.5 its resize uses;
    reverse-engineered from delta images). Away from the fill boundary
    (the 4-tap support blends with fill over a wider band than bilinear)
    the warp matches PIL to the rounding digit."""
    pil = np.asarray(
        Image.fromarray(frame).rotate(
            -17.0, resample=Image.BICUBIC, fillcolor=(128, 128, 128)
        )
    )
    ours = _ours(lambda c: ra.rotate(c, jnp.float32(17.0), method="bicubic"), frame)
    d = np.abs(ours - pil.astype(np.float32))
    assert (d[6:-6, 6:-6] <= 2.0).mean() == 1.0
    assert (d <= 2.0).mean() > 0.88  # fill-boundary band excluded
