"""RandAugment on device.

Reference: ``datasets/rand_augment.py:339-533`` (the timm port: 15 ops,
``rand-mN-nM-mstdS-incI`` magnitude parsing, increasing-severity variants).
Rebuilt as pure jnp ops over float [0,255] frames with per-clip parameters:
geometric ops are one fused inverse-affine bilinear gather; histogram ops
(equalize) use a 256-bin one-hot matmul instead of PIL's per-image loop.

Op selection is data-independent control flow: per clip, N ops are chosen
by index and dispatched with ``lax.switch`` — one compiled program
regardless of the sampled policy.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from advise_tpu.data.device_aug import (
    LUMA,
    _luma,
    _round_u8,
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
)

_LEVEL_DENOM = 10.0


def warp_affine(clip: jnp.ndarray, inv: jnp.ndarray, fill: float = 128.0):
    """Apply the inverse affine matrix `inv` [2, 3] to every frame of
    [T, H, W, C] with bilinear sampling and constant fill (PIL
    transform(AFFINE) semantics: output(x,y) = input(a x + b y + c, ...))."""
    t, h, w, c = clip.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = clip[:, yi_c, xi_c, :]  # [T, H, W, C]
        return jnp.where(valid[None, :, :, None], vals, fill)

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[None, :, :, None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[None, :, :, None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[None, :, :, None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[None, :, :, None]
    )
    return _round_u8(out)


def _affine(clip, a, b, c, d, e, f):
    return warp_affine(clip, jnp.asarray([[a, b, c], [d, e, f]], jnp.float32))


def shear_x(clip, v):
    return _affine(clip, 1.0, v, 0.0, 0.0, 1.0, 0.0)


def shear_y(clip, v):
    return _affine(clip, 1.0, 0.0, 0.0, v, 1.0, 0.0)


def translate_x(clip, pct):
    return _affine(clip, 1.0, 0.0, pct * clip.shape[2], 0.0, 1.0, 0.0)


def translate_y(clip, pct):
    return _affine(clip, 1.0, 0.0, 0.0, 0.0, 1.0, pct * clip.shape[1])


def rotate(clip, degrees):
    """PIL rotate about the center."""
    h, w = clip.shape[1], clip.shape[2]
    theta = -degrees * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # inverse mapping: rotate output coords back around the center
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return warp_affine(
        clip, jnp.stack([jnp.stack([a, b, c]), jnp.stack([d, e, f])])
    )


def posterize(clip, bits):
    """Keep top `bits` bits (PIL posterize). bits is traced -> mask math."""
    bits = jnp.clip(bits.astype(jnp.int32), 0, 8)
    shift = 8 - bits
    q = jnp.right_shift(clip.astype(jnp.int32), shift)
    return (jnp.left_shift(q, shift)).astype(jnp.float32)


def solarize(clip, thresh):
    return jnp.where(clip >= thresh, 255.0 - clip, clip)


def solarize_add(clip, add, thresh=128.0):
    return jnp.where(clip < thresh, jnp.clip(clip + add, 0, 255), clip)


def invert(clip, _v=None):
    return 255.0 - clip


def autocontrast(clip, _v=None):
    """Per-frame per-channel min/max stretch (PIL autocontrast, cutoff 0)."""
    lo = jnp.min(clip, axis=(1, 2), keepdims=True)
    hi = jnp.max(clip, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    out = (clip - lo) * scale
    return jnp.where(hi > lo, _round_u8(out), clip)


def equalize(clip, _v=None):
    """Histogram equalization per frame+channel (PIL equalize), using a
    256-bin bincount histogram -> cumulative LUT -> gather. (bincount, not
    one-hot: a one-hot histogram materializes T*C*H*W*256 floats — ~5 GB at
    32x224x224 — and was the dominant cost of the RandAugment pipeline.)"""
    t, h, w, c = clip.shape
    x = jnp.clip(clip, 0, 255).astype(jnp.int32)
    flat = x.transpose(0, 3, 1, 2).reshape(t * c, h * w)
    hist = jax.vmap(lambda row: jnp.bincount(row, length=256))(flat).astype(
        jnp.float32
    )  # [TC, 256]
    # PIL: step = (total - last_nonzero_count) // 255
    nonzero = hist > 0
    last_idx = 255 - jnp.argmax(nonzero[:, ::-1], axis=1)
    last_count = jnp.take_along_axis(hist, last_idx[:, None], axis=1)[:, 0]
    step = jnp.floor((h * w - last_count) / 255.0)
    cum = jnp.cumsum(hist, axis=1)
    # lut[i] = (cumsum[i-1] + step//2) / step
    cum_prev = jnp.concatenate(
        [jnp.zeros((t * c, 1), jnp.float32), cum[:, :-1]], axis=1
    )
    lut = jnp.clip(
        jnp.floor((cum_prev + jnp.floor(step / 2)[:, None]) / jnp.maximum(step, 1)[:, None]),
        0,
        255,
    )
    out = jnp.take_along_axis(lut, flat, axis=1)
    out = out.reshape(t, c, h, w).transpose(0, 2, 3, 1)
    return jnp.where((step > 0)[:, None].reshape(t, 1, 1, c), out, clip)


def sharpness(clip, factor):
    """PIL ImageEnhance.Sharpness: blend with a 3x3 smoothing filter
    ([[1,1,1],[1,5,1],[1,1,1]]/13), borders kept."""
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    pad = jnp.pad(clip, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = sum(
        k[i, j] * pad[:, i : i + clip.shape[1], j : j + clip.shape[2], :]
        for i in range(3)
        for j in range(3)
    )
    # PIL keeps the original border pixels
    mask = jnp.zeros(clip.shape[1:3], bool).at[1:-1, 1:-1].set(True)
    smooth = jnp.where(mask[None, :, :, None], smooth, clip)
    return _round_u8(smooth + factor * (clip - smooth))


# --- magnitude -> argument conversion (timm _LEVEL_TO_ARG) ------------------


def _signed(rng, v):
    return v * jnp.where(jax.random.bernoulli(rng, 0.5), 1.0, -1.0)


def make_rand_augment(config_str: str, num_ops: Optional[int] = None):
    """Parse 'rand-m7-n4-mstd0.5-inc1' (reference rand_augment_transform
    :445-533) and return apply(clip_u8f [T,H,W,C], rng) -> clip."""
    magnitude, n, mstd, inc = 10.0, 2, 0.0, False
    for part in config_str.split("-")[1:]:
        m = re.match(r"([a-z]+)([\d.]+)", part)
        if not m:
            continue
        key, val = m.group(1), m.group(2)
        if key == "m":
            magnitude = float(val)
        elif key == "n":
            n = int(val)
        elif key == "mstd":
            mstd = float(val)
        elif key == "inc":
            inc = bool(int(val))
    if num_ops is not None:
        n = num_ops

    def lvl(m_eff, frac):
        return m_eff / _LEVEL_DENOM * frac

    # op table: (fn taking (clip, rng, m_eff))
    def op_shear_x(c, r, m):
        return shear_x(c, _signed(r, lvl(m, 0.3)))

    def op_shear_y(c, r, m):
        return shear_y(c, _signed(r, lvl(m, 0.3)))

    def op_trans_x(c, r, m):
        return translate_x(c, _signed(r, lvl(m, 0.45)))

    def op_trans_y(c, r, m):
        return translate_y(c, _signed(r, lvl(m, 0.45)))

    def op_rotate(c, r, m):
        return rotate(c, _signed(r, lvl(m, 30.0)))

    def op_posterize(c, r, m):
        # timm: bits = 4 - int(lvl*4) (increasing) or int(lvl*4); bits == 0
        # is guarded as identity
        bits = jnp.floor(4.0 - lvl(m, 4.0)) if inc else jnp.floor(lvl(m, 4.0))
        return jnp.where(bits >= 1, posterize(c, bits), c)

    def op_solarize(c, r, m):
        th = 256.0 - lvl(m, 256.0) if inc else lvl(m, 256.0)
        return solarize(c, th)

    def op_solarize_add(c, r, m):
        return solarize_add(c, lvl(m, 110.0))

    def op_color(c, r, m):
        return adjust_saturation(c, 1.0 + _signed(r, lvl(m, 0.9)) if inc else lvl(m, 1.8) + 0.1)

    def op_contrast(c, r, m):
        return adjust_contrast(c, 1.0 + _signed(r, lvl(m, 0.9)) if inc else lvl(m, 1.8) + 0.1)

    def op_brightness(c, r, m):
        return adjust_brightness(c, 1.0 + _signed(r, lvl(m, 0.9)) if inc else lvl(m, 1.8) + 0.1)

    def op_sharpness(c, r, m):
        return sharpness(c, 1.0 + _signed(r, lvl(m, 0.9)) if inc else lvl(m, 1.8) + 0.1)

    def op_autocontrast(c, r, m):
        return autocontrast(c)

    def op_equalize(c, r, m):
        return equalize(c)

    def op_invert(c, r, m):
        return invert(c)

    ops = [
        op_autocontrast,
        op_equalize,
        op_invert,
        op_rotate,
        op_posterize,
        op_solarize,
        op_solarize_add,
        op_color,
        op_contrast,
        op_brightness,
        op_sharpness,
        op_shear_x,
        op_shear_y,
        op_trans_x,
        op_trans_y,
    ]

    def apply(clip: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        for i in range(n):
            r_sel, r_mag, r_op, rng = jax.random.split(jax.random.fold_in(rng, i), 4)
            sel = jax.random.randint(r_sel, (), 0, len(ops))
            m_eff = magnitude
            if mstd > 0:
                m_eff = jnp.clip(
                    magnitude + mstd * jax.random.normal(r_mag),
                    0.0,
                    _LEVEL_DENOM,
                )
            clip = jax.lax.switch(
                sel, [lambda c, f=f: f(c, r_op, m_eff) for f in ops], clip
            )
        return clip

    return apply
