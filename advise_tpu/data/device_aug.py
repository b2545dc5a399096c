"""On-device augmentation: fused, batched, per-clip-parameterized.

The TPU replacement for the reference's per-frame PIL host pipeline
(reference ``datasets/augmentation.py`` + the hot loop in
``datasets/sampling.py:313-336``, SURVEY.md §3.5). Host workers deliver
uint8 ``[B, K, T, H, W, C]`` at a fixed ingest geometry; one jitted call
produces normalized compute-dtype clips. XLA fuses the whole chain into a
few kernels over VMEM-resident tiles; there is no per-frame Python.

Reference-semantics notes (the fidelity contract, BASELINE.json):

- ``aug_mode='frame'`` with a fixed per-clip seed (reference
  ``sampling.py:316-325``) means ALL frames of a clip share the same crop
  box / flip / color factors — reproduced here by drawing parameters per
  clip and broadcasting over T. Frame-dependent quantities (PIL contrast
  uses each frame's own luma mean) stay per-frame, as in PIL.
- Brightness/contrast/saturation follow PIL ImageEnhance exactly:
  ``b*img``; ``mean_L + c*(img-mean_L)`` with the L-mean computed like
  ``ImageStat`` (luma 299/587/114, per-frame, +0.5 rounding);
  ``L + s*(img-L)``. Values round+clip to uint8 range after each op, in a
  random order per clip, applied with probability p — matching
  ``RandomColorJitter`` (reference ``augmentation.py:24-56``).
- The reference's hue jitter is a silent no-op (uint8 truncation bug,
  ``augmentation.py:50-52``); we implement a real HSV hue rotation with
  the same parameter scale (PIL uint8 hue units), which at the default
  h<=0.2 is visually identical.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def _map_batch(cfg) -> dict:
    """kwargs for the per-clip aug `lax.map`: AUG.RA_MAP_BATCH > 1 chunks
    the map into vmapped batches (identical semantics; see defaults.py)."""
    n = int(getattr(cfg.AUG, "RA_MAP_BATCH", 1) or 1)
    return {"batch_size": n} if n > 1 else {}


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL stores after each enhance op as uint8: round half away from zero,
    clip to [0, 255]. Stay in float to keep the op chain fused."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _luma(x: jnp.ndarray) -> jnp.ndarray:
    """PIL 'L' conversion: truncating integer luma."""
    return jnp.floor(x @ LUMA)


# ---------------------------------------------------------------------------
# color ops on a single clip [T, H, W, C] in float [0, 255]
# ---------------------------------------------------------------------------


def adjust_brightness(clip, factor):
    return _round_u8(clip * factor)


def adjust_contrast(clip, factor):
    mean = jnp.floor(jnp.mean(_luma(clip), axis=(1, 2), keepdims=True) + 0.5)
    return _round_u8(mean[..., None] + factor * (clip - mean[..., None]))


def adjust_saturation(clip, factor):
    l = _luma(clip)[..., None]
    return _round_u8(l + factor * (clip - l))


def rgb_to_hsv(x: jnp.ndarray) -> jnp.ndarray:
    """x in [0,1] -> (h,s,v) in [0,1]."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r,
        (g - b) / safe_d % 6.0,
        jnp.where(mx == g, (b - r) / safe_d + 2.0, (r - g) / safe_d + 4.0),
    )
    h = jnp.where(d == 0, 0.0, h / 6.0)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(clip, shift_u8):
    """Rotate hue by shift_u8/255 of a turn (PIL uint8 HSV scale)."""
    hsv = rgb_to_hsv(clip / 255.0)
    h = (hsv[..., 0] + shift_u8 / 255.0) % 1.0
    out = hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return _round_u8(out * 255.0)


def color_jitter_clip(clip, key, p, b, c, s, h):
    """RandomColorJitter on one clip (reference augmentation.py:24-56):
    one factor set + one op order per clip, applied with probability p.

    When h == 0 the hue branch compiles to identity — and note the
    reference's hue op is ALWAYS effectively identity (uint8 truncation
    bug, SURVEY.md §8); set COLOR[4]=0 for reference-exact + faster aug."""
    k_apply, k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 6)
    bf = jax.random.uniform(k_b, (), minval=max(0.0, 1.0 - b), maxval=1.0 + b)
    cf = jax.random.uniform(k_c, (), minval=max(0.0, 1.0 - c), maxval=1.0 + c)
    sf = jax.random.uniform(k_s, (), minval=max(0.0, 1.0 - s), maxval=1.0 + s)
    hf = jax.random.uniform(k_h, (), minval=-h, maxval=h)
    order = jax.random.permutation(k_perm, 4)

    hue_branch = (
        (lambda x: x) if h == 0.0 else (lambda x: adjust_hue(x, hf))
    )
    branches = [
        lambda x: adjust_brightness(x, bf),
        lambda x: adjust_contrast(x, cf),
        lambda x: adjust_saturation(x, sf),
        hue_branch,
    ]

    def body(i, x):
        out = jax.lax.switch(order[i], branches, x)
        # materialize each stage: under vmap the switch lowers to selects
        # over all branches, and letting XLA fuse the 4-stage select tree
        # makes it recompute producers multiplicatively (measured 100x
        # blowup composing this with RRC+blur on TPU, BASELINE.md)
        return jax.lax.optimization_barrier(out)

    jittered = jax.lax.fori_loop(0, 4, body, clip)
    apply = jax.random.uniform(k_apply, ()) < p
    return jnp.where(apply, jittered, clip)


def grayscale_clip(clip, key, p):
    """RandomGrayscale (reference augmentation.py:13-21): PIL L conversion
    replicated to 3 channels."""
    l = _luma(clip)[..., None]
    gray = jnp.broadcast_to(l, clip.shape)
    return jnp.where(jax.random.uniform(key, ()) < p, gray, clip)


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def random_crop_clip(clip, key, size: int):
    """Fixed-size random crop, same box for all frames (reference
    RandomCrop, augmentation.py:67-80: offset uniform in [0, dim-size-1])."""
    t, h, w, c = clip.shape
    k1, k2 = jax.random.split(key)
    top = jnp.where(
        h == size, 0, jax.random.randint(k1, (), 0, max(h - size, 1))
    )
    left = jnp.where(
        w == size, 0, jax.random.randint(k2, (), 0, max(w - size, 1))
    )
    return jax.lax.dynamic_slice(clip, (0, top, left, 0), (t, size, size, c))


def hflip_clip(clip, key, p=0.5):
    return jnp.where(jax.random.uniform(key, ()) < p, clip[:, :, ::-1, :], clip)


def resized_crop_clip(
    clip, box, size: Tuple[int, int], method: str = "linear", antialias: bool = True
):
    """Crop `box` = (top, left, height, width) (float, traced) and resize to
    `size` via scale_and_translate — the XLA analog of PIL's antialiased
    resize. Applied frame-wise with the same box (vmapped over T)."""
    top, left, bh, bw = box
    oh, ow = size
    scale = jnp.stack([oh / bh, ow / bw])
    translation = jnp.stack([-top * oh / bh, -left * ow / bw])

    def one(frame):
        return jax.image.scale_and_translate(
            frame,
            (oh, ow, frame.shape[-1]),
            (0, 1),
            scale,
            translation,
            method=method,
            antialias=antialias,
        )

    return jax.vmap(one)(clip)


def sample_rrc_box(key, h: int, w: int, scale, ratio, n_attempts: int = 10):
    """torchvision RandomResizedCrop box sampling (reference
    transform.py RandomResizedCropAndInterpolation / torchvision
    get_params), vectorized over the 10 attempts with a mask-select instead
    of data-dependent control flow."""
    k_area, k_ratio, k_top, k_left = jax.random.split(key, 4)
    area = h * w
    target_area = area * jax.random.uniform(
        k_area, (n_attempts,), minval=scale[0], maxval=scale[1]
    )
    log_ratio = (jnp.log(ratio[0]), jnp.log(ratio[1]))
    aspect = jnp.exp(
        jax.random.uniform(
            k_ratio, (n_attempts,), minval=log_ratio[0], maxval=log_ratio[1]
        )
    )
    ws = jnp.round(jnp.sqrt(target_area * aspect))
    hs = jnp.round(jnp.sqrt(target_area / aspect))
    ok = (ws <= w) & (hs <= h)
    # random offsets for every attempt; valid ranges differ per attempt so
    # scale a single uniform draw.
    u_top = jax.random.uniform(k_top, (n_attempts,))
    u_left = jax.random.uniform(k_left, (n_attempts,))
    tops = jnp.floor(u_top * (h - hs + 1))
    lefts = jnp.floor(u_left * (w - ws + 1))
    # first valid attempt, else center-crop fallback (torchvision semantics)
    idx = jnp.argmax(ok)
    any_ok = jnp.any(ok)
    in_ratio = w / h
    fb_w = jnp.where(
        in_ratio < ratio[0], w, jnp.where(in_ratio > ratio[1], jnp.round(h * ratio[1]), w)
    )
    fb_h = jnp.where(
        in_ratio < ratio[0], jnp.round(w / ratio[0]), jnp.where(in_ratio > ratio[1], h, h)
    )
    fb_top = jnp.round((h - fb_h) / 2.0)
    fb_left = jnp.round((w - fb_w) / 2.0)
    top = jnp.where(any_ok, tops[idx], fb_top)
    left = jnp.where(any_ok, lefts[idx], fb_left)
    bh = jnp.where(any_ok, hs[idx], fb_h)
    bw = jnp.where(any_ok, ws[idx], fb_w)
    return (top, left, bh, bw)


def normalize(x, mean, std):
    """[0,255] -> ImageNet-normalized float (reference AugsWarper norm)."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    std = jnp.asarray(std, jnp.float32) * 255.0
    return (x - mean) / std


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def _per_clip(fn):
    """Lift a (clip [T,H,W,C], key) -> clip function over [N,T,H,W,C]."""
    return jax.vmap(fn, in_axes=(0, 0))


def _aug_out_dtype(cfg):
    """Emission dtype for the aug pipelines (TPU.AUG_COMPUTE_OUT).

    Casting INSIDE the per-clip map body (not after the map) makes the
    serial lax.map's dynamic-update-slice accumulator — the largest
    single resident of the flagship step — materialize at compute width;
    per-clip math still runs in float32, so with the knob on the result
    is bit-identical to the previous aug->astype(compute) sequence."""
    if (
        getattr(cfg.TPU, "AUG_COMPUTE_OUT", False)
        and cfg.TPU.COMPUTE_DTYPE == "bfloat16"
    ):
        return jnp.bfloat16
    return jnp.float32


def make_simple_train_aug(cfg):
    """AUG.TYPE='simple': fixed Resize (done at ingest) -> RandomCrop ->
    RandomColorJitter -> Normalize (reference datasets/__init__.py:18-26).
    Input u8 [B,K,T,H,W,C] at ingest geometry; output float32 target-size.

    With TPU.PALLAS_AUG the chain runs as one Pallas kernel (crop-window-
    only HBM reads, single VMEM residency)."""
    size = int(cfg.AUG.TARGET_SIZE)
    od = _aug_out_dtype(cfg)
    p, b, c, s, h = cfg.AUG.COLOR
    if cfg.AUG.REFERENCE_EXACT_HUE:
        h = 0.0  # reference hue is a no-op; identity branch is 3x faster
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD

    if cfg.TPU.PALLAS_AUG:
        from advise_tpu.ops.pallas.fused_aug import fused_simple_aug

        def apply_pallas(batch_u8, key):
            bsz, k = batch_u8.shape[:2]
            flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
            out = fused_simple_aug(
                flat, key, size, color=tuple(cfg.AUG.COLOR),
                mean=tuple(mean), std=tuple(std), out_dtype=od,
            )
            return out.reshape(bsz, k, *out.shape[1:])

        return apply_pallas

    def one_clip(clip_u8, key):
        k_crop, k_col = jax.random.split(key)
        clip = clip_u8.astype(jnp.float32)
        clip = random_crop_clip(clip, k_crop, size)
        clip = color_jitter_clip(clip, k_col, p, b, c, s, h)
        return normalize(clip, mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        out = _per_clip(one_clip)(flat, keys)
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def make_rrc_aug(cfg, target_size: Optional[int] = None, scale=None, ratio=None,
                 random_flip: bool = False):
    """RandomResizedCrop(+Normalize) pipeline — AUG.TYPE='OnlyCrop' and the
    validation aug (reference datasets/__init__.py:28-35, 88-90)."""
    size = int(target_size if target_size is not None else cfg.AUG.TARGET_SIZE)
    scale = tuple(scale if scale is not None else (cfg.AUG.MIN_AREA, 1.0))
    ratio = tuple(ratio if ratio is not None else cfg.AUG.RAND_CROP_RATIO)
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    od = _aug_out_dtype(cfg)

    def one_clip(clip_u8, key):
        k_box, k_flip = jax.random.split(key)
        t, h, w, c = clip_u8.shape
        clip = clip_u8.astype(jnp.float32)
        box = sample_rrc_box(k_box, h, w, scale, ratio)
        clip = resized_crop_clip(clip, box, (size, size))
        if random_flip:
            clip = hflip_clip(clip, k_flip)
        return normalize(jnp.clip(clip, 0.0, 255.0), mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        out = _per_clip(one_clip)(flat, keys)
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def make_infer_aug(cfg):
    """Short-side scale to INFER.RES then random square crop (reference
    datasets/__init__.py:95-97). Ingest already resizes to a fixed geometry
    whose short side is INFER.RES, so only the crop remains."""
    size = int(cfg.INFER.RES)
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    od = _aug_out_dtype(cfg)

    def one_clip(clip_u8, key):
        clip = clip_u8.astype(jnp.float32)
        clip = random_crop_clip(clip, key, size)
        return normalize(clip, mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        out = _per_clip(one_clip)(flat, keys)
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def make_aa_aug(cfg):
    """AUG.TYPE='aa': RandomResizedCrop -> RandAugment -> Normalize
    (-> RandomErasing when AUG.RE_PROB > 0)
    (reference datasets/__init__.py:55-68 + rand_augment.py).

    With AUG.FUSED_RA (default) the RRC resample, every sampled geometric
    RandAugment op, and the horizontal flip compose into ONE bilinear
    gather per clip (see make_fused_rand_augment for the exact/fused
    semantics delta); AUG.FUSED_RA=False keeps the sequential op-exact
    path."""
    from advise_tpu.data.erasing import random_erasing_clip
    from advise_tpu.data.rand_augment import (
        fused_warp_coords,
        make_batched_color_apply,
        make_fused_rand_augment,
        make_rand_augment,
        warp_gather,
    )

    size = int(cfg.AUG.TARGET_SIZE)
    od = _aug_out_dtype(cfg)
    scale = (cfg.AUG.MIN_AREA, cfg.AUG.MAX_AREA)
    ratio = tuple(cfg.AUG.RAND_CROP_RATIO)
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    # the op-exact path honors AUG.INTERPOLATION for its geometric warps
    # (the reference's timm create_random_augment resample; PIL default
    # bicubic). The fused path stays bilinear — its single-resample
    # composition is already a documented approximation.
    ra = make_rand_augment(
        cfg.AUG.AA_TYPE, interpolation=cfg.AUG.INTERPOLATION
    )
    re_prob = cfg.AUG.RE_PROB

    if cfg.AUG.FUSED_RA:
        ra_plan, ra_color = make_fused_rand_augment(cfg.AUG.AA_TYPE)

        if getattr(cfg.AUG, "RA_BATCHED", False):
            # Batched execution: the warp coordinates/plans are vmapped
            # (cheap scalar math), the gather itself runs as ONE flat
            # take with per-clip row offsets (warp_gather_batch — a
            # vmapped gather lowers 3.3x slower on TPU, see its
            # docstring), and the color ops run as slot phases over the
            # whole batch (make_batched_color_apply) — replacing the
            # serial per-clip lax.map, bit-exact (parity test in
            # tests/test_advanced_aug).
            from advise_tpu.data.rand_augment import warp_gather_batch

            ra_color_batched = make_batched_color_apply(cfg.AUG.AA_TYPE)

            def plan_one(clip_shape_hw, sub):
                h, w = clip_shape_hw
                k_box, k_ra, k_flip, k_re = sub[0], sub[1], sub[2], sub[3]
                box = sample_rrc_box(k_box, h, w, scale, ratio)
                p = ra_plan(k_ra, size)
                flip = (
                    jax.random.uniform(k_flip, ()) < 0.5
                    if cfg.AUG.RANDOM_FLIP
                    else jnp.asarray(False)
                )
                sx, sy, valid = fused_warp_coords(p, box, flip, size)
                return sx, sy, valid, p, k_re

            def apply_batched(batch_u8, key):
                bsz, k = batch_u8.shape[:2]
                flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
                hh, ww = flat.shape[2], flat.shape[3]
                keys = jax.random.split(key, bsz * k)
                # same per-clip sub-key derivation as one_clip_fused
                subs = jax.vmap(lambda kk: jax.random.split(kk, 4))(keys)
                sx, sy, valid, plans, k_res = jax.vmap(
                    lambda sub: plan_one((hh, ww), sub)
                )(subs)
                clips = warp_gather_batch(
                    flat.astype(jnp.float32), sx, sy, valid
                )
                clips = ra_color_batched(clips, plans)
                if re_prob > 0:
                    clips = jax.vmap(
                        lambda cl, kk: random_erasing_clip(
                            cl, kk, probability=re_prob,
                            mode=cfg.AUG.RE_MODE, count=cfg.AUG.RE_COUNT,
                        )
                    )(clips, k_res)
                out = normalize(clips, mean, std).astype(od)
                return out.reshape(bsz, k, *out.shape[1:])

            return apply_batched

        def one_clip_fused(clip_u8, key):
            k_box, k_ra, k_flip, k_re = jax.random.split(key, 4)
            t, h, w, c = clip_u8.shape
            box = sample_rrc_box(k_box, h, w, scale, ratio)
            p = ra_plan(k_ra, size)
            flip = (
                jax.random.uniform(k_flip, ()) < 0.5
                if cfg.AUG.RANDOM_FLIP
                else jnp.asarray(False)
            )
            sx, sy, valid = fused_warp_coords(p, box, flip, size)
            clip = warp_gather(clip_u8.astype(jnp.float32), sx, sy, valid)
            clip = ra_color(clip, p)
            if re_prob > 0:
                clip = random_erasing_clip(
                    clip, k_re, probability=re_prob, mode=cfg.AUG.RE_MODE,
                    count=cfg.AUG.RE_COUNT,
                )
            return normalize(clip, mean, std).astype(od)

        def apply_fused(batch_u8, key):
            bsz, k = batch_u8.shape[:2]
            flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
            keys = jax.random.split(key, bsz * k)
            # lax.map (not vmap) keeps the color-phase lax.switch a true
            # runtime branch — see the note in the exact path below.
            # AUG.RA_MAP_BATCH > 1 vmaps chunks (latency/traffic trade).
            out = jax.lax.map(
                lambda args: one_clip_fused(*args), (flat, keys),
                **_map_batch(cfg),
            )
            return out.reshape(bsz, k, *out.shape[1:])

        return apply_fused

    def one_clip(clip_u8, key):
        k_box, k_ra, k_flip, k_re = jax.random.split(key, 4)
        t, h, w, c = clip_u8.shape
        clip = clip_u8.astype(jnp.float32)
        box = sample_rrc_box(k_box, h, w, scale, ratio)
        clip = jnp.clip(resized_crop_clip(clip, box, (size, size)), 0, 255)
        clip = ra(clip, k_ra)
        if cfg.AUG.RANDOM_FLIP:
            clip = hflip_clip(clip, k_flip)
        if re_prob > 0:
            clip = random_erasing_clip(
                clip, k_re, probability=re_prob, mode=cfg.AUG.RE_MODE,
                count=cfg.AUG.RE_COUNT,
            )
        return normalize(clip, mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        # lax.map, not vmap: under vmap the RandAugment op-selection
        # lax.switch lowers to selects that EXECUTE all 15 branches per
        # slot (measured ~100x blowup); a sequential map keeps the switch
        # a true runtime branch, so each clip runs only its sampled ops.
        # AUG.RA_MAP_BATCH > 1 vmaps chunks (latency/traffic trade).
        out = jax.lax.map(
            lambda args: one_clip(*args), (flat, keys), **_map_batch(cfg)
        )
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def make_clip_aug(cfg):
    """AUG.TYPE='clip_aug': ClipRandomResizedCrop with camera dynamics
    (reference datasets/__init__.py:37-50)."""
    from advise_tpu.data.erasing import clip_random_resized_crop

    size = int(cfg.AUG.TARGET_SIZE)
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    od = _aug_out_dtype(cfg)

    def one_clip(clip_u8, key):
        clip = clip_random_resized_crop(
            clip_u8.astype(jnp.float32),
            key,
            size=size,
            scale=(cfg.AUG.MIN_AREA, 1.0),
            ratio=tuple(cfg.AUG.RAND_CROP_RATIO),
            jitter=cfg.AUG.CAMERA_SHAKE,
            shift=cfg.AUG.CAMERA_SHIFT,
            zoom=cfg.AUG.ZOOM,
            brightness=cfg.AUG.COLOR_BRI,
            saturation=cfg.AUG.COLOR_SAT,
            white_balance=cfg.AUG.WHITE_BALANCE,
        )
        return normalize(clip, mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        out = _per_clip(one_clip)(flat, keys)
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def resized_crop_clip_boxes(clip, boxes, size: Tuple[int, int],
                            method: str = "linear", antialias: bool = True):
    """Per-frame boxes variant of :func:`resized_crop_clip`: boxes
    [T, 4] = (top, left, height, width) per frame (the motion-shift RRC,
    reference transform.py random_resized_crop_with_shift :615-657)."""
    oh, ow = size

    def one(frame, box):
        top, left, bh, bw = box[0], box[1], box[2], box[3]
        scale = jnp.stack([oh / bh, ow / bw])
        translation = jnp.stack([-top * oh / bh, -left * ow / bw])
        return jax.image.scale_and_translate(
            frame, (oh, ow, frame.shape[-1]), (0, 1), scale, translation,
            method=method, antialias=antialias,
        )

    return jax.vmap(one)(clip, boxes)


def motion_shift_boxes(key, t: int, h: int, w: int, scale, ratio):
    """Two RRC boxes for the first/last frame, linearly interpolated (and
    floored to the integer grid like the reference's int(linspace))
    across frames (reference random_resized_crop_with_shift :638-643)."""
    k1, k2 = jax.random.split(key)
    b1 = jnp.stack(sample_rrc_box(k1, h, w, scale, ratio))
    b2 = jnp.stack(sample_rrc_box(k2, h, w, scale, ratio))
    alpha = jnp.linspace(0.0, 1.0, t)[:, None]
    return jnp.floor(b1[None] * (1 - alpha) + b2[None] * alpha)


def make_rbyol_aug(cfg):
    """AUG.TYPE='rbyol': the MoCo-v2/BYOL stack — RRC, strong color jitter,
    grayscale, gaussian blur, flip (reference datasets/__init__.py:70-76 +
    transform.py color_jitter_video_ssl / GaussianBlurVideo). With
    AUG.TRAIN_JITTER_MOTION_SHIFT the crop box interpolates between two
    sampled boxes across frames (reference rbyol_aug -> spatial_sampling
    motion_shift path, datasets/__init__.py:326 + transform.py:615-657)."""
    from advise_tpu.data.erasing import gaussian_blur_clip

    size = int(cfg.AUG.TARGET_SIZE)
    mean, std = cfg.DATA.MEAN, cfg.DATA.STD
    od = _aug_out_dtype(cfg)
    p, b, c, s, h = cfg.AUG.COLOR

    def one_clip(clip_u8, key):
        k_box, k_col, k_gray, k_blur, k_bp, k_flip = jax.random.split(key, 6)
        t, hh, ww, _ = clip_u8.shape
        clip = clip_u8.astype(jnp.float32)
        if cfg.AUG.TRAIN_JITTER_MOTION_SHIFT:
            boxes = motion_shift_boxes(
                k_box, t, hh, ww, (cfg.AUG.MIN_AREA, 1.0),
                tuple(cfg.AUG.RAND_CROP_RATIO),
            )
            clip = jnp.clip(
                resized_crop_clip_boxes(clip, boxes, (size, size)), 0, 255
            )
        else:
            box = sample_rrc_box(
                k_box, hh, ww, (cfg.AUG.MIN_AREA, 1.0),
                tuple(cfg.AUG.RAND_CROP_RATIO),
            )
            clip = jnp.clip(resized_crop_clip(clip, box, (size, size)), 0, 255)
        clip = color_jitter_clip(clip, k_col, p, b, c, s, h)
        clip = grayscale_clip(clip, k_gray, cfg.AUG.GRAYSCALE)
        blurred = gaussian_blur_clip(
            clip, k_blur,
            sigma_min=tuple(cfg.AUG.SSL_BLUR_SIGMA_MIN),
            sigma_max=tuple(cfg.AUG.SSL_BLUR_SIGMA_MAX),
        )
        clip = jnp.where(jax.random.uniform(k_bp, ()) < 0.5, blurred, clip)
        if cfg.AUG.RANDOM_FLIP:
            clip = hflip_clip(clip, k_flip)
        return normalize(clip, mean, std).astype(od)

    def apply(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)
        out = _per_clip(one_clip)(flat, keys)
        return out.reshape(bsz, k, *out.shape[1:])

    return apply


def build_device_aug(cfg, mode: str = "train"):
    """Dispatch matching reference build_aug (datasets/__init__.py:16-103).

    DATA.REVERSE_INPUT_CHANNEL (reference datasets/utils.py:51-52: frames
    RGB->BGR before the model) flips the channel axis of the raw ingest
    batch before any aug, so luma-dependent color ops see the swapped
    channels exactly like the reference's post-decode swap."""
    inner = _build_device_aug(cfg, mode)
    if not cfg.DATA.REVERSE_INPUT_CHANNEL or inner is None:
        return inner

    def reversed_channels(batch_u8, key):
        return inner(batch_u8[..., ::-1], key)

    return reversed_channels


def _build_device_aug(cfg, mode: str = "train"):
    if mode == "train":
        if cfg.AUG.TYPE == "simple":
            return make_simple_train_aug(cfg)
        if cfg.AUG.TYPE == "OnlyCrop":
            return make_rrc_aug(cfg, scale=(cfg.AUG.MIN_AREA, 1.0))
        if cfg.AUG.TYPE == "aa":
            return make_aa_aug(cfg)
        if cfg.AUG.TYPE == "clip_aug":
            return make_clip_aug(cfg)
        if cfg.AUG.TYPE == "rbyol":
            return make_rbyol_aug(cfg)
        if cfg.AUG.TYPE == "none":
            mean, std = cfg.DATA.MEAN, cfg.DATA.STD
            od = _aug_out_dtype(cfg)

            def apply(batch_u8, key):
                return normalize(
                    batch_u8.astype(jnp.float32), mean, std
                ).astype(od)

            return apply
        raise NotImplementedError(f"AUG.TYPE={cfg.AUG.TYPE}")
    if mode == "speed":
        return make_rrc_aug(
            cfg,
            target_size=cfg.VAL.TARGET_SIZE,
            scale=(cfg.VAL.MIN_AREA, 1.0),
            ratio=cfg.VAL.RAND_CROP_RATIO,
        )
    if mode == "action":
        return make_infer_aug(cfg)
    raise NotImplementedError(mode)


def ingest_geometry(cfg, mode: str = "train") -> Tuple[int, int]:
    """Fixed (W, H) decode geometry per mode. 'simple' uses AUG.RESIZE
    verbatim (the reference resizes to this exact fixed size,
    augmentation.py:58-64). RRC modes ingest at a 4:3 canvas around the
    target so crops have material to sample."""
    if mode == "train" and cfg.AUG.TYPE == "simple":
        return (int(cfg.AUG.RESIZE[0]), int(cfg.AUG.RESIZE[1]))
    if mode == "speed":
        s = int(cfg.VAL.TARGET_SIZE)
        return (s * 4 // 3, s)
    if mode == "action":
        s = int(cfg.INFER.RES)
        return (s * 4 // 3, s)
    s = int(cfg.AUG.TARGET_SIZE)
    return (s * 4 // 3, s)
