"""Video model stems (reference ``models/stem_helper.py:10-325``).

Layout is channel-last ``[B, T, H, W, C]`` (NDHWC) throughout — the layout
XLA:TPU tiles convolutions onto the MXU without transposes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.common import msra_init


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
    (reference stem_helper.py ResNetBasicStem)."""

    dim_out: int
    temp_kernel: int
    norm: Callable
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
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
