"""Custom compute ops: squeeze-excitation and HOG features.

Reference: ``models/operators.py:17-122``. The HOG layer is the real
compute kernel the reference implements with Sobel convs + scatter_add
(used as the MaskFeat regression target); here it is a fully vectorized
XLA formulation — orientation binning becomes a one-hot matmul, which XLA
maps onto the MXU instead of a scatter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SE(nn.Module):
    """3D squeeze-excitation (reference operators.py:17-55)."""

    ratio: float

    @staticmethod
    def _round_width(width, multiplier, min_width=8, divisor=8):
        width *= multiplier
        w = max(min_width, int(width + divisor / 2) // divisor * divisor)
        if w < 0.9 * width:
            w += divisor
        return int(w)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        dim_fc = self._round_width(dim, self.ratio)
        s = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(dim_fc, (1, 1, 1), name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(dim, (1, 1, 1), name="fc2")(s)
        return x * nn.sigmoid(s)


def hog_features(
    frames: jnp.ndarray,
    nbins: int = 9,
    cell_sz: int = 8,
    gaussian_window: int = 16,
) -> jnp.ndarray:
    """Histogram-of-gradients per channel (reference operators.py HOGLayerC
    :58-122), fully vectorized.

    frames: [B, H, W, C] float in [0, 1] (or any linear scale).
    returns: [B, H//cell, W//cell, C*nbins], L2-normalized per cell like the
    reference (unfold -> norm over the flattened cell dim).
    """
    b, h, w, c = frames.shape
    # Sobel via explicit shifts (reference uses conv with weight [[1,0,-1],...])
    x = jnp.pad(frames, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    gx = (
        (x[:, :-2, 2:] - x[:, :-2, :-2])
        + 2.0 * (x[:, 1:-1, 2:] - x[:, 1:-1, :-2])
        + (x[:, 2:, 2:] - x[:, 2:, :-2])
    )
    gy = (
        (x[:, 2:, :-2] - x[:, :-2, :-2])
        + 2.0 * (x[:, 2:, 1:-1] - x[:, :-2, 1:-1])
        + (x[:, 2:, 2:] - x[:, :-2, 2:])
    )
    mag = jnp.sqrt(gx**2 + gy**2 + 1e-12)
    phase = jnp.arctan2(gx, gy)  # reference: atan2(gx, gy) in [-pi, pi]
    phase = phase / jnp.pi * nbins  # [-nbins, nbins]
    phase = jnp.where(phase < 0, phase + nbins, phase)  # [0, nbins)

    if gaussian_window:
        # reference applies a 2D gaussian weight tiled over the image
        # (HOGLayerC; assumes h % window == 0 — at non-multiple sizes
        # like 312 the tile is ceil'd and cropped, the periodic
        # extension of the same weighting)
        gk = _gaussian_kernel2d(gaussian_window, gaussian_window // 2)
        reps_h = -(-h // gaussian_window)
        reps_w = -(-w // gaussian_window)
        gw = jnp.tile(gk, (reps_h, reps_w))[:h, :w]
        mag = mag * gw[None, :, :, None]

    # soft assignment to integer bins by flooring (reference scatter_add on
    # floored phase)
    bin_idx = jnp.clip(jnp.floor(phase), 0, nbins - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(bin_idx, nbins, dtype=frames.dtype)
    # [B, H, W, C, nbins] weighted by magnitude
    votes = onehot * mag[..., None]
    # pool over cells
    hc, wc = h // cell_sz, w // cell_sz
    votes = votes.reshape(b, hc, cell_sz, wc, cell_sz, c, nbins)
    hist = votes.sum(axis=(2, 4))  # [B, hc, wc, C, nbins]
    # L2 normalize over (C, nbins) per cell (reference F.normalize over
    # flattened unfold dim)
    hist = hist / (
        jnp.linalg.norm(hist.reshape(b, hc, wc, -1), axis=-1)[..., None, None]
        + 1e-12
    )
    return hist.reshape(b, hc, wc, c * nbins)


def _gaussian_kernel2d(size: int, sigma: float) -> jnp.ndarray:
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (ax / sigma) ** 2)
    k = jnp.outer(g, g)
    return k / k.max()
