"""Video model stems (reference ``models/stem_helper.py:10-325``).

Layout is channel-last ``[B, T, H, W, C]`` (NDHWC) throughout — the layout
XLA:TPU tiles convolutions onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.common import msra_init


def s2d_repack_input(x: jnp.ndarray) -> jnp.ndarray:
    """[B, T, H, W, C] -> [B, T, H/2, W/2, 4C]: pack 2x2 spatial blocks
    into channels, order (ph, pw, c) (the SpaceToDepthStemConv input
    transform; exported pure so engine-level fused stems reuse it)."""
    b, t, h, w, c = x.shape
    x2 = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x2 = x2.transpose(0, 1, 2, 4, 3, 5, 6)
    return x2.reshape(b, t, h // 2, w // 2, 4 * c)


def s2d_remap_kernel(kernel: jnp.ndarray, kt: int) -> jnp.ndarray:
    """[kt, 7, 7, C, O] stride-2 stem kernel -> the losslessly remapped
    [kt, 4, 4, 4C, O] stride-1 s2d kernel: front-pad each spatial dim
    (7 -> 8 taps) and regroup as (cell, parity) per axis."""
    c, o = kernel.shape[3], kernel.shape[4]
    wp = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(kt, 4, 2, 4, 2, c, o)
    w2 = w2.transpose(0, 1, 3, 2, 4, 5, 6)
    return w2.reshape(kt, 4, 4, 4 * c, o)


def s2d_conv(x2: jnp.ndarray, w2: jnp.ndarray, kt: int) -> jnp.ndarray:
    """The stride-1 conv over s2d-repacked inputs with the remapped
    kernel (cell padding asymmetric 2 left / 1 right)."""
    return jax.lax.conv_general_dilated(
        x2, w2,
        window_strides=(1, 1, 1),
        padding=((kt // 2, kt // 2), (2, 1), (2, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


class SpaceToDepthStemConv(nn.Module):
    """The (t,7,7)/s(1,2,2) stem convolution computed on a 2×2
    space-to-depth input (TPU.STEM_S2D).

    Why (device-trace evidence, BASELINE.md): with 3 input / ≤64 output
    channels the channel-last stem tensors occupy ~2–6% of each 128-lane
    TPU tile, and the SlowFast fast-pathway stem alone measured ~24% of
    the whole BYOL step at <2% MXU utilization. The MLPerf-era "conv0
    space-to-depth" transform packs 2×2 spatial blocks into channels
    ([B,T,H,W,C] → [B,T,H/2,W/2,4C]) and convolves with a losslessly
    remapped stride-1 [t,4,4,4C,O] kernel — 4× the lane utilization on
    the input side, identical math.

    The parameter keeps the plain layout/shape ``[t,7,7,C,O]`` under the
    same ``kernel`` name, rearranged at trace time by pure pad/reshape/
    transpose — checkpoints interoperate with the nn.Conv path and
    autodiff maps gradients back through the rearrangement exactly.

    Derivation: output pixel i reads input pixels 2i+dh, dh∈[-3,3]. On
    the half-res grid, 2i+dh lives in cell i+a at parity p where
    dh = 2a+p-? … concretely dh = 2(ah−2)+ph with kernel cell index
    ah∈[0,4) and parity ph∈{0,1}, so the original tap index is
    dh+3 = 2·ah+ph−1 — i.e. the 7 taps padded FRONT to 8 and regrouped
    as (cell, parity); the (ah=0, ph=0) slot is the zero pad. Cell
    padding is asymmetric (2 left, 1 right), which lax.conv supports.
    """

    features: int
    temp_kernel: int
    dtype: Optional[jnp.dtype] = None
    # TPU.PALLAS_STEM: route eligible shapes (the 8-wide fast stem)
    # through the column-packed Toeplitz Pallas kernel
    # (ops/pallas/stem_conv.py) instead of XLA's conv lowering. Takes
    # precedence over pad_out (the Pallas weight-grad is already
    # MXU-packed). Falls back to XLA off-TPU (CPU tests/dryrun).
    pallas: bool = False
    # TPU.PALLAS_STEM_WGRAD_ONLY: with pallas, keep the forward on XLA's
    # dense conv and route only the weight gradient through the Pallas
    # kernel — the full-Pallas path's padded-input buffer lands in the
    # forward and trips a residency rescheduling cliff at bs32
    # (BASELINE.md r5); wgrad-only confines it to the backward tail.
    pallas_wgrad_only: bool = False
    # TPU.PALLAS_STEM_CHUNK: with pallas, run the pack + kernel over
    # lax.scan'd batch chunks of this size in BOTH directions — bounds
    # the padded-input buffer the bs32 full-Pallas path chokes on
    # (~960 MB -> chunk/B of it) without giving up the forward kernel.
    # 0 (default) = unchunked.
    pallas_chunk: int = 0
    # TPU.STEM_PAD_OUT: compute the WEIGHT GRADIENT through a conv whose
    # output channels are zero-padded to this width (the cotangent pads
    # with zeros, the padded weight-grad slices back — exact in exact
    # arithmetic; bit-equal unbatched, association-level ~1e-4 under the
    # vmapped-views lowering). The
    # forward stays at the real width. Round-3 chip sweep (32 clips x
    # 32f s2d shape): the 8-wide weight-grad lowers as VPU reductions at
    # 41.5 ms, the 32-wide one as MXU work at 11.4 ms (3.6x), while a
    # padded FORWARD costs +15 ms — so only the backward pads. The
    # input gradient is computed through the ordinary conv (and DCE'd by
    # XLA when nothing upstream needs it, the device-aug case).
    pad_out: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt = self.temp_kernel
        b, t, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        kernel = self.param(
            "kernel", msra_init, (kt, 7, 7, c, self.features)
        )
        x2 = s2d_repack_input(x)
        w2 = s2d_remap_kernel(kernel, kt)
        dtype = self.dtype or x.dtype

        def conv(xx, ww):
            return s2d_conv(xx, ww, kt)

        x2 = x2.astype(dtype)
        w2 = w2.astype(dtype)
        if self.pallas:
            from advise_tpu.ops.pallas import pallas_tpu_available
            from advise_tpu.ops.pallas.stem_conv import (
                eligible, pallas_s2d_stem, pallas_s2d_stem_chunked,
                pallas_s2d_stem_wgrad_only,
            )

            if eligible(x2.shape, self.features) and pallas_tpu_available():
                if self.pallas_wgrad_only:
                    return pallas_s2d_stem_wgrad_only(x2, w2, kt)
                if self.pallas_chunk:
                    return pallas_s2d_stem_chunked(
                        x2, w2, kt, int(self.pallas_chunk)
                    )
                return pallas_s2d_stem(x2, w2, kt)
        if self.pad_out <= self.features:
            return conv(x2, w2)
        pad_to = int(self.pad_out)

        @jax.custom_vjp
        def conv_pad_bwd(xx, ww):
            return conv(xx, ww)

        def fwd(xx, ww):
            return conv(xx, ww), (xx, ww)

        def bwd(res, g):
            xx, ww = res
            # weight grad via the lane-aligned padded conv: conv is linear
            # in w, so the vjp at a zero primal is exact; the padded
            # cotangent columns are zero, so the sliced grad is bit-equal
            gp = jnp.pad(
                g, ((0, 0),) * 4 + ((0, pad_to - g.shape[-1]),)
            )
            wz = jnp.zeros(ww.shape[:-1] + (pad_to,), ww.dtype)
            _, vjp_w = jax.vjp(lambda w_: conv(xx, w_), wz)
            (gw_pad,) = vjp_w(gp)
            gw = gw_pad[..., : ww.shape[-1]]
            # true input grad through the ordinary conv (XLA removes it
            # when unused — e.g. device-aug inputs)
            _, vjp_x = jax.vjp(lambda x_: conv(x_, ww), xx)
            (gx,) = vjp_x(g)
            return gx, gw

        conv_pad_bwd.defvjp(fwd, bwd)
        return conv_pad_bwd(x2, w2)


def max_pool_3d(x, window: Sequence[int], strides: Sequence[int], padding):
    """nn.max_pool over (T, H, W) of an NDHWC tensor."""
    return nn.max_pool(
        x,
        window_shape=tuple(window),
        strides=tuple(strides),
        padding=padding,
    )


class ResNetBasicStem(nn.Module):
    """conv(t,7,7)/s(1,2,2) -> BN -> ReLU -> maxpool(1,3,3)/s(1,2,2)
    (reference stem_helper.py ResNetBasicStem). ``s2d`` computes the conv
    in space-to-depth form (same param, see SpaceToDepthStemConv)."""

    dim_out: int
    temp_kernel: int
    norm: Callable
    dtype: Optional[jnp.dtype] = None
    s2d: bool = False
    pad_out: int = 0  # see SpaceToDepthStemConv.pad_out
    pallas: bool = False  # see SpaceToDepthStemConv.pallas
    pallas_wgrad_only: bool = False  # see SpaceToDepthStemConv
    pallas_chunk: int = 0  # see SpaceToDepthStemConv.pallas_chunk

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 conv_out: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # conv_out: precomputed stem-conv output (the engine-level fused
        # online+EMA stem, TPU.FUSE_EMA_STEM) — skip the conv module, run
        # BN/relu/pool on the injected tensor. Only valid at apply time
        # (init never passes it, so the conv params always exist).
        if conv_out is not None:
            x = conv_out
        elif self.s2d and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            x = SpaceToDepthStemConv(
                features=self.dim_out,
                temp_kernel=self.temp_kernel,
                dtype=self.dtype,
                pad_out=self.pad_out,
                pallas=self.pallas,
                pallas_wgrad_only=self.pallas_wgrad_only,
                pallas_chunk=self.pallas_chunk,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.dim_out,
                kernel_size=(self.temp_kernel, 7, 7),
                strides=(1, 2, 2),
                padding=((self.temp_kernel // 2,) * 2, (3, 3), (3, 3)),
                use_bias=False,
                kernel_init=msra_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = self.norm(name="bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = max_pool_3d(
            x, (1, 3, 3), (1, 2, 2), ((0, 0), (1, 1), (1, 1))
        )
        return x


class X3DStem(nn.Module):
    """Channel-separated stem: spatial (1,k,k) conv then depthwise temporal
    (t,1,1) conv (reference stem_helper.py X3DStem)."""

    dim_out: int
    temp_kernel: int
    norm: Callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.Conv(
            self.dim_out,
            kernel_size=(1, 3, 3),
            strides=(1, 2, 2),
            padding=((0, 0), (1, 1), (1, 1)),
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="conv_xy",
        )(x)
        x = nn.Conv(
            self.dim_out,
            kernel_size=(self.temp_kernel, 1, 1),
            strides=(1, 1, 1),
            padding=((self.temp_kernel // 2,) * 2, (0, 0), (0, 0)),
            use_bias=False,
            feature_group_count=self.dim_out,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = self.norm(name="bn", dtype=self.dtype)(x, train)
        return nn.relu(x)


class PatchEmbed(nn.Module):
    """Conv patchify for MViT (reference stem_helper.py PatchEmbed):
    3D conv (or 2D when patch_2d) flattened to tokens."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kt, kh, kw = self.kernel
        pt, ph, pw = self.padding
        x = nn.Conv(
            self.dim_out,
            kernel_size=(kt, kh, kw),
            strides=tuple(self.stride),
            padding=((pt, pt), (ph, ph), (pw, pw)),
            dtype=self.dtype,
            name="proj",
        )(x)
        b, t, h, w, c = x.shape
        return x.reshape(b, t * h * w, c), (t, h, w)
