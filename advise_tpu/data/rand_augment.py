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


def _cubic_weights(frac: jnp.ndarray):
    """PIL TRANSFORM bicubic filter taps at offsets (-1, 0, 1, 2) from the
    floor sample. PIL's geometric transforms (Geometry.c) use the keys
    cubic with a = -1.0 — NOT the a = -0.5 Catmull-Rom its resize path
    uses (verified empirically against Image.transform on delta images:
    taps at d=0.25 are [-0.047, 0.891, 0.297, -0.141] = a=-1 exactly)."""
    a = -1.0

    def k(x):
        ax = jnp.abs(x)
        return jnp.where(
            ax <= 1.0,
            (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
            jnp.where(
                ax < 2.0,
                a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a,
                0.0,
            ),
        )

    return [k(frac + 1.0), k(frac), k(frac - 1.0), k(frac - 2.0)]


def warp_affine(clip: jnp.ndarray, inv: jnp.ndarray, fill: float = 128.0,
                method: str = "bilinear"):
    """Apply the inverse affine matrix `inv` [2, 3] to every frame of
    [T, H, W, C] with bilinear (default) or bicubic sampling and constant
    fill (PIL transform(AFFINE) semantics: output(x,y) =
    input(a x + b y + c, ...)). ``method='bicubic'`` honors
    AUG.INTERPOLATION for the op-exact RandAugment path (16 taps, PIL's
    Geometry.c transform kernel at a=-1.0 — NOT the a=-0.5 Catmull-Rom
    its resize path uses; see _cubic_weights and SURVEY §8.15).

    TPU layout: the clip is transposed to [H*W, T*C] so each corner
    gather is one `take` of row-contiguous T*C-element slices —
    measured 1.5x faster than indexing [T, H, W, C] with 2D index arrays
    (the gather walks 384 contiguous bytes per index instead of T strided
    12-byte reads)."""
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

    flat = clip.transpose(1, 2, 0, 3).reshape(h * w, t * c)

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).reshape(-1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jnp.take(flat, (yi_c * w + xi_c).reshape(-1), axis=0)
        return jnp.where(valid[:, None], vals, fill)  # [H*W, T*C]

    if method == "bicubic":
        kx = _cubic_weights(wx)
        ky = _cubic_weights(wy)
        out = 0.0
        for j in range(4):  # y taps at y0 + (j-1)
            row = 0.0
            for i in range(4):  # x taps at x0 + (i-1)
                row = row + gather(y0 + (j - 1), x0 + (i - 1)) * (
                    kx[i].reshape(-1)[:, None]
                )
            out = out + row * ky[j].reshape(-1)[:, None]
    else:
        out = (
            gather(y0, x0) * ((1 - wx) * (1 - wy)).reshape(-1)[:, None]
            + gather(y0, x0 + 1) * (wx * (1 - wy)).reshape(-1)[:, None]
            + gather(y0 + 1, x0) * ((1 - wx) * wy).reshape(-1)[:, None]
            + gather(y0 + 1, x0 + 1) * (wx * wy).reshape(-1)[:, None]
        )
    out = out.reshape(h, w, t, c).transpose(2, 0, 1, 3)
    return _round_u8(out)


def _affine(clip, a, b, c, d, e, f, method="bilinear"):
    return warp_affine(
        clip, jnp.asarray([[a, b, c], [d, e, f]], jnp.float32), method=method
    )


def shear_x(clip, v, method="bilinear"):
    return _affine(clip, 1.0, v, 0.0, 0.0, 1.0, 0.0, method=method)


def shear_y(clip, v, method="bilinear"):
    return _affine(clip, 1.0, 0.0, 0.0, v, 1.0, 0.0, method=method)


def translate_x(clip, pct, method="bilinear"):
    return _affine(
        clip, 1.0, 0.0, pct * clip.shape[2], 0.0, 1.0, 0.0, method=method
    )


def translate_y(clip, pct, method="bilinear"):
    return _affine(
        clip, 1.0, 0.0, 0.0, 0.0, 1.0, pct * clip.shape[1], method=method
    )


def rotate(clip, degrees, method="bilinear"):
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
        clip, jnp.stack([jnp.stack([a, b, c]), jnp.stack([d, e, f])]),
        method=method,
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
    """timm solarize_add: the magnitude is converted with int() before the
    LUT build (``int((level/_MAX_LEVEL) * 110)``), so the added constant is
    integral and the output stays on the uint8 grid — floored here to
    match (and to keep the whole color chain integer-valued, which the
    batched slot-phase executor relies on)."""
    add = jnp.floor(add)
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
    """Histogram equalization per frame+channel (PIL equalize).

    TPU formulation — nibble (high/low 4-bit) decomposition. The naive
    forms are 256-wide per-pixel one-hot work on the VPU (measured round 2:
    hist 3.6 ms + monotone-LUT apply 5.5 ms at 96 rows x 50k px, the
    single most expensive RandAugment op and most of the serial color
    phase's ~100 ms/step). Writing x = 16*hi + lo cuts the per-pixel
    comparison width 256 -> 3x16 and turns both passes into MXU
    contractions over 16-wide one-hots:

      hist[r, 16h+l] = sum_p [hi==h][lo==l]          einsum('rph,rpl->rhl')
      lut[x] = lut[0] + sum_{j<x} dlut[j]
             = lut[0] + sum_h [h<hi] S[r,h]                     (term 1)
                      + sum_h [h==hi] sum_l [l<lo] dlutB[r,h,l] (term 2)

    with S the per-16-block sums of dlut and dlutB = dlut.reshape(16,16).
    Everything stays exact: one-hots are {0,1}, dlut increments and their
    16-wide partial sums are integers <= 255 (bf16-exact), histogram
    counts <= h*w < 2^24 accumulate in f32.
    """
    t, h, w, c = clip.shape
    x = jnp.clip(clip, 0, 255).astype(jnp.int32)
    flat = x.transpose(0, 3, 1, 2).reshape(t * c, h * w)
    hi4 = flat >> 4  # [r, p] in [0, 16)
    lo4 = flat & 15
    iota16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi4[:, :, None] == iota16).astype(jnp.bfloat16)  # [r, p, 16]
    oh_lo = (lo4[:, :, None] == iota16).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "rph,rpl->rhl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(t * c, 256)  # exact counts
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
    # monotone apply via the nibble split of sum_{j<x} dlut[j]
    dlut = jnp.concatenate(
        [jnp.diff(lut, axis=1), jnp.zeros((t * c, 1), jnp.float32)], axis=1
    )  # [r, 256], dlut[255] = 0 (j = 255 < x is impossible)
    dlut_b = dlut.reshape(t * c, 16, 16)  # [r, jh, jl]
    blk = jnp.sum(dlut_b, axis=2)  # [r, 16] per-block sums, ints <= 255
    lt_hi = (iota16 < hi4[:, :, None]).astype(jnp.bfloat16)  # [r, p, 16]
    term1 = jnp.einsum(
        "rph,rh->rp", lt_hi, blk.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    lt_lo = (iota16 < lo4[:, :, None]).astype(jnp.bfloat16)
    # within-block prefix for every block, then pick the hi block:
    # w2[r,p,h] = sum_l [l < lo] dlutB[r,h,l]  (ints <= 255, bf16-exact)
    w2 = jnp.einsum(
        "rpl,rhl->rph", lt_lo, dlut_b.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    term2 = jnp.einsum(
        "rph,rph->rp", w2, oh_hi, preferred_element_type=jnp.float32
    )
    out = lut[:, :1] + term1 + term2
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


def _parse_ra_config(config_str: str, num_ops: Optional[int] = None):
    """Parse 'rand-m7-n4-mstd0.5-inc1' (reference rand_augment_transform
    :445-533) -> (magnitude, n, mstd, inc)."""
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
    return magnitude, n, mstd, inc


def make_rand_augment(config_str: str, num_ops: Optional[int] = None,
                      interpolation: str = "bilinear"):
    """RandAugment, op-exact sequential path: apply(clip_u8f [T,H,W,C],
    rng) -> clip (reference rand_augment_transform :445-533).

    ``interpolation`` follows AUG.INTERPOLATION for the geometric warps
    (the reference passes it to timm create_random_augment; PIL default
    there is bicubic)."""
    magnitude, n, mstd, inc = _parse_ra_config(config_str, num_ops)
    interp = "bicubic" if interpolation in ("bicubic", "cubic") else "bilinear"

    def lvl(m_eff, frac):
        return m_eff / _LEVEL_DENOM * frac

    # op table: (fn taking (clip, rng, m_eff))
    def op_shear_x(c, r, m):
        return shear_x(c, _signed(r, lvl(m, 0.3)), method=interp)

    def op_shear_y(c, r, m):
        return shear_y(c, _signed(r, lvl(m, 0.3)), method=interp)

    def op_trans_x(c, r, m):
        return translate_x(c, _signed(r, lvl(m, 0.45)), method=interp)

    def op_trans_y(c, r, m):
        return translate_y(c, _signed(r, lvl(m, 0.45)), method=interp)

    def op_rotate(c, r, m):
        return rotate(c, _signed(r, lvl(m, 30.0)), method=interp)

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


# ---------------------------------------------------------------------------
# Fused fast path (AUG.FUSED_RA): one gather for ALL geometric work
# ---------------------------------------------------------------------------

# indices into the 15-op table above that are affine warps
GEO_ROTATE, GEO_SHEAR_X, GEO_SHEAR_Y, GEO_TRANS_X, GEO_TRANS_Y = 3, 11, 12, 13, 14
_GEO_IDS = (GEO_ROTATE, GEO_SHEAR_X, GEO_SHEAR_Y, GEO_TRANS_X, GEO_TRANS_Y)


def _slot_inv_matrix(sel, sign, m_eff, frac_shear, frac_trans, frac_rot,
                     size: int):
    """Inverse affine 3x3 for one RandAugment slot in target-size pixel
    coords; identity when `sel` is a color op. All five geometric forms are
    computed and mask-selected (cheap 3x3 scalar math — no control flow)."""
    shear_v = sign * m_eff * frac_shear / _LEVEL_DENOM
    trans_v = sign * m_eff * frac_trans / _LEVEL_DENOM * size
    theta = -sign * m_eff * frac_rot / _LEVEL_DENOM * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    ctr = (size - 1) / 2.0

    def mat(a, b, c, d, e, f):
        return jnp.stack([
            jnp.stack([a, b, c]),
            jnp.stack([d, e, f]),
            jnp.stack([jnp.zeros_like(a), jnp.zeros_like(a), jnp.ones_like(a)]),
        ])

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    m_id = mat(one, zero, zero, zero, one, zero)
    m_shx = mat(one, shear_v, zero, zero, one, zero)
    m_shy = mat(one, zero, zero, shear_v, one, zero)
    m_trx = mat(one, zero, trans_v, zero, one, zero)
    m_try = mat(one, zero, zero, zero, one, trans_v)
    # rotate about the center (same inverse map as `rotate` above)
    m_rot = mat(cos, -sin, ctr - cos * ctr + sin * ctr,
                sin, cos, ctr - sin * ctr - cos * ctr)
    out = m_id
    for gid, m_g in zip(_GEO_IDS, (m_rot, m_shx, m_shy, m_trx, m_try)):
        out = jnp.where(sel == gid, m_g, out)
    return out


def make_fused_rand_augment(config_str: str, num_ops: Optional[int] = None):
    """Fused-fast-path RandAugment (``AUG.FUSED_RA``): instead of N
    sequential ``lax.switch`` dispatches per clip (each geometric op a full
    4-corner bilinear gather), the slot plan is drawn up front and

    * every sampled geometric op (rotate/shear/translate) contributes an
      inverse affine 3x3; the matrices COMPOSE — together with the
      RandomResizedCrop box and the horizontal flip — into a single warp,
      executed as ONE bilinear gather from the ingest-resolution frame;
    * per-stage bounds masks reproduce PIL's fill=128 borders (a pixel that
      leaves the frame at any geometric stage is filled);
    * the color ops then apply in their sampled order via ``lax.switch``
      with identity branches for the geometric slots.

    Documented deviations from the sequential reference semantics
    (datasets/rand_augment.py:339-533): single resample instead of repeated
    bilinear passes (less interpolation blur, no antialias on the RRC
    downscale), and color ops see the post-warp frame regardless of
    sampled order — which also means every sampled color op is applied to
    the whole warped frame INCLUDING the gray fill pixels, even color ops
    that were sampled before the geometry in the sequential order (there
    they would have run pre-fill). Distributionally the aug is unchanged;
    set AUG.FUSED_RA=False for op-exact PIL semantics.

    Returns ``(plan, color_apply)``:
      plan(rng)  -> dict with 'mats' [n,3,3], 'is_geo' [n], 'sel' [n],
                    'm_eff' [n], 'keys' [n] — all drawn up front
      color_apply(clip, plan) -> clip with the color slots applied in order
    """
    magnitude, n, mstd, inc = _parse_ra_config(config_str, num_ops)

    # the 15-op table with geometric slots as identity (color phase only)
    ops = _color_op_table(magnitude, mstd, inc)

    def plan(rng, size: int):
        sels, mats, m_effs, keys = [], [], [], []
        for i in range(n):
            r_sel, r_mag, r_op, rng = jax.random.split(
                jax.random.fold_in(rng, i), 4
            )
            sel = jax.random.randint(r_sel, (), 0, 15)
            m_eff = jnp.float32(magnitude)
            if mstd > 0:
                m_eff = jnp.clip(
                    magnitude + mstd * jax.random.normal(r_mag),
                    0.0, _LEVEL_DENOM,
                )
            # the geometric ops draw their sign from r_op (matching _signed
            # in the exact path); color ops redraw from the same key inside
            # their branch
            sign = jnp.where(jax.random.bernoulli(r_op, 0.5), 1.0, -1.0)
            mats.append(_slot_inv_matrix(
                sel, sign, m_eff, 0.3, 0.45, 30.0, size))
            sels.append(sel)
            m_effs.append(m_eff)
            keys.append(r_op)
        is_geo = jnp.stack([
            jnp.any(jnp.stack([s == g for g in _GEO_IDS])) for s in sels
        ])
        return {
            "mats": jnp.stack(mats),
            "is_geo": is_geo,
            "sel": jnp.stack(sels),
            "m_eff": jnp.stack(m_effs),
            "keys": jnp.stack(keys),
        }

    def color_apply(clip, p):
        for i in range(n):
            clip = jax.lax.switch(
                p["sel"][i],
                ops,
                clip, p["keys"][i], p["m_eff"][i],
            )
        return clip

    return plan, color_apply


def _color_op_table(magnitude, mstd, inc):
    """The 15-entry op table with geometric entries replaced by identity —
    used by the fused path's color phase (geometry already applied in the
    composed warp)."""

    def lvl(m_eff, frac):
        return m_eff / _LEVEL_DENOM * frac

    def enh_factor(r, m):
        return 1.0 + _signed(r, lvl(m, 0.9)) if inc else lvl(m, 1.8) + 0.1

    def ident(c, r, m):
        return c

    def op_posterize(c, r, m):
        bits = jnp.floor(4.0 - lvl(m, 4.0)) if inc else jnp.floor(lvl(m, 4.0))
        return jnp.where(bits >= 1, posterize(c, bits), c)

    def op_solarize(c, r, m):
        th = 256.0 - lvl(m, 256.0) if inc else lvl(m, 256.0)
        return solarize(c, th)

    return [
        lambda c, r, m: autocontrast(c),
        lambda c, r, m: equalize(c),
        lambda c, r, m: invert(c),
        ident,  # rotate  (fused into the warp)
        op_posterize,
        op_solarize,
        lambda c, r, m: solarize_add(c, lvl(m, 110.0)),
        lambda c, r, m: adjust_saturation(c, enh_factor(r, m)),
        lambda c, r, m: adjust_contrast(c, enh_factor(r, m)),
        lambda c, r, m: adjust_brightness(c, enh_factor(r, m)),
        lambda c, r, m: sharpness(c, enh_factor(r, m)),
        ident,  # shear_x
        ident,  # shear_y
        ident,  # translate_x
        ident,  # translate_y
    ]


# indices into the 15-op table (batched executor + while-loop equalize)
OP_AUTOCONTRAST, OP_EQUALIZE, OP_INVERT = 0, 1, 2
OP_POSTERIZE, OP_SOLARIZE, OP_SOLARIZE_ADD = 4, 5, 6
OP_COLOR, OP_CONTRAST, OP_BRIGHTNESS, OP_SHARPNESS = 7, 8, 9, 10


def warp_gather_batch(clips, sx, sy, valid, fill: float = 128.0):
    """Batched :func:`warp_gather`: clips [N,T,H,W,C], coords/mask
    [N,oh,ow] -> [N,T,oh,ow,C].

    Formulated as ONE flat gather over [N*H*W, T*C] rows with per-clip
    index offsets instead of a vmapped per-clip take: XLA lowers the
    batched (1-batch-dim) gather badly on TPU — measured 98.6 ms for the
    vmapped form vs 29.7 ms serial lax.map at 32 clips x 32f 224²; the
    flat form keeps the serial path's contiguous-row access pattern in a
    single dispatch. Arithmetic is ordered identically to warp_gather, so
    outputs are bit-exact vs the per-clip path."""
    n, t, h, w, c = clips.shape
    oh, ow = sx.shape[1:]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0).reshape(n, -1, 1)
    wy = (sy - y0).reshape(n, -1, 1)

    flat = clips.transpose(0, 2, 3, 1, 4).reshape(n * h * w, t * c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]

    def gather(yi, xi):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = base + (yi_c * w + xi_c).reshape(n, -1)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(n, -1, t * c)

    out = (
        gather(y0, x0) * (1 - wx) * (1 - wy)
        + gather(y0, x0 + 1) * wx * (1 - wy)
        + gather(y0 + 1, x0) * (1 - wx) * wy
        + gather(y0 + 1, x0 + 1) * wx * wy
    )
    out = jnp.where(valid.reshape(n, -1, 1), out, fill)
    out = out.reshape(n, oh, ow, t, c).transpose(0, 3, 1, 2, 4)
    return _round_u8(out)


def make_batched_color_apply(config_str: str, num_ops: Optional[int] = None):
    """Batched slot-phase executor for the fused path's color ops
    (``AUG.RA_BATCHED``): the drop-in replacement for dispatching
    ``lax.switch`` per clip under a serial ``lax.map`` (measured round 2:
    ~100 ms ≈ 19% of the SlowFast-BYOL step at 32 clip-views — mostly
    equalize invocations at VPU rates plus per-clip dispatch overhead).

    Execution per slot, over the WHOLE clip batch at once:

    * every cheap op (invert/solarize/solarize_add/posterize/brightness/
      contrast/saturation/autocontrast/sharpness) is an elementwise
      expression over shared per-frame statistics (luma, contrast mean,
      min/max, the 3x3 smooth) — computed once and combined by per-clip
      mask selects that XLA fuses into one pass; unlike a vmapped
      ``lax.switch`` there is no per-branch full-array traffic because
      nothing here is a standalone pass except the smooth stencil;
    * equalize (the one genuinely expensive op) runs in a
      ``lax.while_loop`` over ONLY the clips that sampled it this slot —
      a dynamic trip count, so the cost is exactly `count x equalize`,
      no capacity padding and no fallback;
    * an ``optimization_barrier`` between slots stops XLA from fusing the
      4-stage select trees into each other (the known multiplicative
      producer-recomputation blowup, cf. color_jitter_clip).

    Bit-exact vs the per-clip fused path by construction: elementwise ops
    are IEEE-deterministic, min/max are order-free, and every float
    reduction that feeds a result (contrast mean, equalize histogram and
    cumsum) sums integers < 2^24 in f32 — exact in any association order.
    Parity-tested in tests/test_advanced_aug.py.

    Returns apply(clips [N,T,H,W,C], plan) with plan arrays carrying a
    leading clip dim (the vmapped output of make_fused_rand_augment's
    plan): sel [N,n], keys [N,n,2], m_eff [N,n].
    """
    magnitude, n, mstd, inc = _parse_ra_config(config_str, num_ops)

    def slot(x, sel, keys, m_eff):
        nclips, t, h, w, c = x.shape

        def bc(v):  # per-clip scalar -> broadcast over [N,T,H,W,C]
            return v[:, None, None, None, None]

        def lvl(frac):
            return m_eff / _LEVEL_DENOM * frac

        # per-clip parameters, same draws/formulas as _color_op_table
        sign = jnp.where(
            jax.vmap(lambda k: jax.random.bernoulli(k, 0.5))(keys), 1.0, -1.0
        )
        enh = 1.0 + sign * lvl(0.9) if inc else lvl(1.8) + 0.1
        sol_th = 256.0 - lvl(256.0) if inc else lvl(256.0)
        sol_add = jnp.floor(lvl(110.0))
        bits = jnp.floor(4.0 - lvl(4.0)) if inc else jnp.floor(lvl(4.0))

        def is_op(o):
            return bc(sel == o)

        # shared statistics (order-free or exact-integer reductions)
        lum = _luma(x)[..., None]  # [N,T,H,W,1]
        cmean = jnp.floor(
            jnp.mean(_luma(x), axis=(2, 3), keepdims=True) + 0.5
        )[..., None]  # [N,T,1,1,1] — sum of ints < 2^24: exact
        lo = jnp.min(x, axis=(2, 3), keepdims=True)  # [N,T,1,1,C]
        hi = jnp.max(x, axis=(2, 3), keepdims=True)
        # sharpness smooth: same shifted-add order as `sharpness` above
        kern = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
        pad = jnp.pad(
            x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"
        )
        smooth = sum(
            kern[i, j] * pad[:, :, i : i + h, j : j + w, :]
            for i in range(3)
            for j in range(3)
        )
        border = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
        smooth = jnp.where(border[None, None, :, :, None], smooth, x)

        res = x  # geometric slots and equalize: identity here
        res = jnp.where(is_op(OP_INVERT), 255.0 - x, res)
        res = jnp.where(
            is_op(OP_SOLARIZE),
            jnp.where(x >= bc(sol_th), 255.0 - x, x),
            res,
        )
        res = jnp.where(
            is_op(OP_SOLARIZE_ADD),
            jnp.where(x < 128.0, jnp.clip(x + bc(sol_add), 0, 255), x),
            res,
        )
        bits_i = jnp.clip(bits.astype(jnp.int32), 0, 8)
        shift = bc(8 - bits_i)
        post = jnp.left_shift(
            jnp.right_shift(x.astype(jnp.int32), shift), shift
        ).astype(jnp.float32)
        res = jnp.where(is_op(OP_POSTERIZE) & bc(bits >= 1), post, res)
        res = jnp.where(is_op(OP_BRIGHTNESS), _round_u8(x * bc(enh)), res)
        res = jnp.where(
            is_op(OP_CONTRAST), _round_u8(cmean + bc(enh) * (x - cmean)), res
        )
        res = jnp.where(
            is_op(OP_COLOR), _round_u8(lum + bc(enh) * (x - lum)), res
        )
        res = jnp.where(
            is_op(OP_SHARPNESS),
            _round_u8(smooth + bc(enh) * (x - smooth)),
            res,
        )
        scale = 255.0 / jnp.maximum(hi - lo, 1.0)
        ac = jnp.where(hi > lo, _round_u8((x - lo) * scale), x)
        res = jnp.where(is_op(OP_AUTOCONTRAST), ac, res)

        # equalize: dynamic-trip while over exactly the sampled clips
        eq = sel == OP_EQUALIZE
        count = jnp.sum(eq.astype(jnp.int32))
        order = jnp.argsort(jnp.logical_not(eq))  # equalize clips first

        def body(carry):
            xx, j = carry
            idx = order[j]
            clip_j = jax.lax.dynamic_index_in_dim(xx, idx, 0, keepdims=False)
            xx = jax.lax.dynamic_update_index_in_dim(
                xx, equalize(clip_j), idx, 0
            )
            return xx, j + 1

        res, _ = jax.lax.while_loop(
            lambda carry: carry[1] < count, body, (res, jnp.int32(0))
        )
        return res

    def apply(clips, plan):
        for i in range(n):
            clips = slot(
                clips, plan["sel"][:, i], plan["keys"][:, i],
                plan["m_eff"][:, i],
            )
            clips = jax.lax.optimization_barrier(clips)
        return clips

    return apply


def fused_warp_coords(plan, box, flip, size: int):
    """Compose flip -> RA geometric slots (reverse order) -> RRC box into
    source coordinates in the ingest frame, with the staged PIL fill mask.

    Returns (sx, sy, valid): [size, size] float source coords + bool mask
    (False -> fill). Coordinate convention: pixel centers, PIL resize
    src = left + (x + 0.5) * bw/ow - 0.5.
    """
    ys = jnp.arange(size, dtype=jnp.float32)
    xs = jnp.arange(size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    # horizontal flip happens LAST in the forward chain -> invert it first
    cur_x = jnp.where(flip, (size - 1) - gx, gx)
    cur_y = gy
    valid = jnp.ones((size, size), bool)
    mats, is_geo = plan["mats"], plan["is_geo"]
    n = mats.shape[0]
    for i in reversed(range(n)):
        m = mats[i]
        nx = m[0, 0] * cur_x + m[0, 1] * cur_y + m[0, 2]
        ny = m[1, 0] * cur_x + m[1, 1] * cur_y + m[1, 2]
        cur_x, cur_y = nx, ny
        inb = (
            (nx >= -0.5) & (nx <= size - 0.5)
            & (ny >= -0.5) & (ny <= size - 0.5)
        )
        valid &= jnp.where(is_geo[i], inb, True)
    top, left, bh, bw = box
    sx = left + (cur_x + 0.5) * (bw / size) - 0.5
    sy = top + (cur_y + 0.5) * (bh / size) - 0.5
    return sx, sy, valid


def warp_gather(clip, sx, sy, valid, fill: float = 128.0):
    """One bilinear gather of [T, H_in, W_in, C] at (sy, sx) [H, W] with
    edge clamping (PIL resize edge behavior) and `fill` where the staged
    mask is invalid (PIL affine fill). Same row-contiguous [H_in*W_in, T*C]
    take layout as :func:`warp_affine`."""
    t, h, w, c = clip.shape
    oh, ow = sx.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0).reshape(-1)[:, None]
    wy = (sy - y0).reshape(-1)[:, None]

    flat = clip.transpose(1, 2, 0, 3).reshape(h * w, t * c)

    def gather(yi, xi):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        return jnp.take(flat, (yi_c * w + xi_c).reshape(-1), axis=0)

    out = (
        gather(y0, x0) * (1 - wx) * (1 - wy)
        + gather(y0, x0 + 1) * wx * (1 - wy)
        + gather(y0 + 1, x0) * (1 - wx) * wy
        + gather(y0 + 1, x0 + 1) * wx * wy
    )
    out = jnp.where(valid.reshape(-1)[:, None], out, fill)
    out = out.reshape(oh, ow, t, c).transpose(2, 0, 1, 3)
    return _round_u8(out)
