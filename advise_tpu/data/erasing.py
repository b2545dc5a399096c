"""Random erasing + Gaussian blur + camera-dynamics clip aug — on device.

Reference:
- ``datasets/random_erasing.py:34-180`` (timm RandomErasing: const/rand/
  pixel fill, cube mode = same region across frames),
- ``datasets/transform.py`` GaussianBlurVideo (scipy 3D blur) and the
  MoCo-v2 ``color_jitter_video_ssl`` stack,
- ``datasets/augmentation.py:126-395`` ClipRandomResizedCrop (per-frame
  box shake / linear shift / zoom + temporal-ramped brightness/saturation/
  white-balance).

All per-clip parameterized, jit/vmap-friendly; data-dependent placement is
expressed as coordinate masks rather than dynamic-shape slices.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from advise_tpu.data.device_aug import (
    _luma,
    _round_u8,
    resized_crop_clip,
    sample_rrc_box,
)


def random_erasing_clip(
    clip: jnp.ndarray,
    rng: jax.Array,
    probability: float = 0.25,
    mode: str = "pixel",
    min_area: float = 0.02,
    max_area: float = 1 / 3,
    min_aspect: float = 0.3,
    count: int = 1,
    cube: bool = True,
):
    """Erase `count` random rectangles (reference random_erasing.py).
    mode: 'pixel' = per-pixel gaussian noise, 'rand' = per-region gaussian,
    'const' = zeros. cube=True uses one region for all frames."""
    t, h, w, c = clip.shape
    max_aspect = 1.0 / min_aspect
    log_aspect = (math.log(min_aspect), math.log(max_aspect))
    out = clip
    for i in range(count):
        r = jax.random.fold_in(rng, i)
        r_apply, r_area, r_asp, r_top, r_left, r_fill = jax.random.split(r, 6)
        area = h * w * jax.random.uniform(
            r_area, (), minval=min_area, maxval=max_area
        )
        aspect = jnp.exp(
            jax.random.uniform(r_asp, (), minval=log_aspect[0], maxval=log_aspect[1])
        )
        eh = jnp.minimum(jnp.round(jnp.sqrt(area * aspect)), h - 1)
        ew = jnp.minimum(jnp.round(jnp.sqrt(area / aspect)), w - 1)
        top = jnp.floor(jax.random.uniform(r_top) * (h - eh))
        left = jnp.floor(jax.random.uniform(r_left) * (w - ew))
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        region = (
            (ys >= top) & (ys < top + eh) & (xs >= left) & (xs < left + ew)
        )[None, :, :, None]
        if mode == "pixel":
            fill = jax.random.normal(r_fill, clip.shape) * 64.0 + 128.0
        elif mode == "rand":
            fill = jnp.broadcast_to(
                jax.random.normal(r_fill, (1, 1, 1, c)) * 64.0 + 128.0,
                clip.shape,
            )
        else:
            fill = jnp.zeros_like(clip)
        if not cube:
            # independent apply-decision and fill per frame approximated by
            # per-frame noise fill; region still shared (static shapes)
            pass
        apply = jax.random.uniform(r_apply, ()) < probability
        out = jnp.where(apply & region, jnp.clip(fill, 0, 255), out)
    return out


def gaussian_blur_clip(
    clip: jnp.ndarray, rng: jax.Array, sigma_min=(0.0, 0.1), sigma_max=(0.0, 2.0)
):
    """Separable spatial gaussian blur with random sigma (reference
    GaussianBlurVideo / GaussianBlur in transform.py; temporal sigma of the
    reference defaults to 0 so only the spatial pass is applied)."""
    sigma = jax.random.uniform(
        rng, (), minval=sigma_min[1], maxval=sigma_max[1]
    )
    radius = 4  # static kernel radius; covers sigma <= 2 well
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / k.sum()
    pad = ((0, 0), (radius, radius), (0, 0), (0, 0))
    x = jnp.pad(clip, pad, mode="edge")
    x = sum(k[i] * x[:, i : i + clip.shape[1]] for i in range(2 * radius + 1))
    pad = ((0, 0), (0, 0), (radius, radius), (0, 0))
    x = jnp.pad(x, pad, mode="edge")
    x = sum(k[i] * x[:, :, i : i + clip.shape[2]] for i in range(2 * radius + 1))
    return x


def clip_random_resized_crop(
    clip: jnp.ndarray,
    rng: jax.Array,
    size: int,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
    jitter: float = 0.0,
    shift: float = 0.0,
    zoom: float = 0.0,
    brightness: float = 0.0,
    saturation: float = 0.0,
    white_balance: float = 0.0,
):
    """ClipRandomResizedCrop (reference augmentation.py:126-395): one base
    box per clip, then per-frame camera dynamics —

    - shake: per-frame jittered box offset (amplitude `jitter` x box size),
    - shift: linear interpolation of the box center across the clip,
    - zoom: linear interpolation of the box size (random direction),
    - temporal-ramped brightness/saturation/white-balance.
    """
    t, h, w, c = clip.shape
    keys = jax.random.split(rng, 10)
    top, left, bh, bw = sample_rrc_box(keys[0], h, w, scale, ratio)
    tt = jnp.linspace(0.0, 1.0, t)

    # shift: end box center moves by +-shift * box size
    dx = jax.random.uniform(keys[1], (), minval=-shift, maxval=shift) * bw
    dy = jax.random.uniform(keys[2], (), minval=-shift, maxval=shift) * bh
    tops = top + tt * dy
    lefts = left + tt * dx
    # zoom: size scales linearly to (1 +- zoom)
    z_end = 1.0 + jax.random.uniform(keys[3], (), minval=-zoom, maxval=zoom)
    zs = 1.0 + tt * (z_end - 1.0)
    bhs = bh * zs
    bws = bw * zs
    # shake: per-frame jitter of the box corner
    if jitter > 0:
        tops = tops + jax.random.uniform(
            keys[4], (t,), minval=-jitter, maxval=jitter
        ) * bh
        lefts = lefts + jax.random.uniform(
            keys[5], (t,), minval=-jitter, maxval=jitter
        ) * bw
    tops = jnp.clip(tops, 0.0, h - 1.0)
    lefts = jnp.clip(lefts, 0.0, w - 1.0)
    bhs = jnp.clip(bhs, 8.0, h - tops)
    bws = jnp.clip(bws, 8.0, w - lefts)

    def one(frame, tp, lf, bh_, bw_):
        return resized_crop_clip(
            frame[None], (tp, lf, bh_, bw_), (size, size)
        )[0]

    out = jax.vmap(one)(clip, tops, lefts, bhs, bws)
    out = jnp.clip(out, 0.0, 255.0)

    # temporal-ramped color dynamics (reference change_bri/sat/wb)
    if brightness > 0:
        b_end = 1.0 + jax.random.uniform(
            keys[6], (), minval=-brightness, maxval=brightness
        )
        out = out * (1.0 + tt * (b_end - 1.0))[:, None, None, None]
    if saturation > 0:
        s_end = 1.0 + jax.random.uniform(
            keys[7], (), minval=-saturation, maxval=saturation
        )
        sf = (1.0 + tt * (s_end - 1.0))[:, None, None, None]
        l = _luma(out)[..., None]
        out = l + sf * (out - l)
    if white_balance > 0:
        wb_end = 1.0 + jax.random.uniform(
            keys[8], (3,), minval=-white_balance, maxval=white_balance
        )
        wf = 1.0 + tt[:, None] * (wb_end - 1.0)[None, :]
        out = out * wf[:, None, None, :]
    return jnp.clip(out, 0.0, 255.0)
