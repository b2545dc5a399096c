"""3D-ResNet internals: transforms, residual blocks, stages.

Reference: ``models/resnet_helper.py:14-732``. Same block topology and
hyperparameter wiring (temporal-kernel cycling, NUM_BLOCK_TEMP_KERNEL
truncation, stride placement, SE/Swish for X3D), rebuilt as Flax modules on
NDHWC with optional ``jax.remat`` per stage instead of fairscale
checkpoint_wrapper (reference ``models/video_model_builder.py:512-518``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from flax import linen as nn

from advise_tpu.models.layers.common import msra_init
from advise_tpu.models.layers.operators import SE
from advise_tpu.models.layers.nonlocal_block import Nonlocal


class BasicTransform(nn.Module):
    """(tk x 3 x 3) -> (1 x 3 x 3) (reference resnet_helper.py BasicTransform)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    dilation: int = 1
    zero_init_final_bn: bool = False
    # RESNET.ZERO_INIT_FINAL_CONV (reference weight_init_helper.py:23:
    # convs marked `final_conv` — BasicTransform.b / Bottleneck.c — are
    # zero-filled instead of MSRA when the flag is on)
    zero_init_final_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        tk = self.temp_kernel_size
        x = nn.Conv(
            self.dim_out,
            (tk, 3, 3),
            strides=(1, self.stride, self.stride),
            padding=((tk // 2,) * 2, (1, 1), (1, 1)),
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.dim_out,
            (1, 3, 3),
            strides=(1, 1, 1),
            padding=((0, 0), (self.dilation,) * 2, (self.dilation,) * 2),
            kernel_dilation=(1, self.dilation, self.dilation),
            use_bias=False,
            kernel_init=(
                nn.initializers.zeros if self.zero_init_final_conv
                else msra_init
            ),
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(
            name="b_bn", dtype=self.dtype, zero_init_scale=self.zero_init_final_bn
        )(x, train)
        return x


class BottleneckTransform(nn.Module):
    """(tk x 1 x 1) -> (1 x 3 x 3) -> (1 x 1 x 1)
    (reference resnet_helper.py BottleneckTransform). Stride sits on the
    3x3 conv unless stride_1x1."""

    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    # RESNET.ZERO_INIT_FINAL_CONV (reference weight_init_helper.py:23:
    # convs marked `final_conv` — BasicTransform.b / Bottleneck.c — are
    # zero-filled instead of MSRA when the flag is on)
    zero_init_final_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        tk = self.temp_kernel_size
        s1, s3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        x = nn.Conv(
            self.dim_inner,
            (tk, 1, 1),
            strides=(1, s1, s1),
            padding=((tk // 2,) * 2, (0, 0), (0, 0)),
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.dim_inner,
            (1, 3, 3),
            strides=(1, s3, s3),
            padding=((0, 0), (self.dilation,) * 2, (self.dilation,) * 2),
            kernel_dilation=(1, self.dilation, self.dilation),
            feature_group_count=self.num_groups,
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(name="b_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.dim_out,
            (1, 1, 1),
            use_bias=False,
            kernel_init=(
                nn.initializers.zeros if self.zero_init_final_conv
                else msra_init
            ),
            dtype=self.dtype,
            name="c",
        )(x)
        x = self.norm(
            name="c_bn", dtype=self.dtype, zero_init_scale=self.zero_init_final_bn
        )(x, train)
        return x


class X3DTransform(nn.Module):
    """X3D bottleneck: 1x1x1 -> channelwise Tx3x3 (+SE, Swish) -> 1x1x1
    (reference resnet_helper.py X3DTransform)."""

    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    se_ratio: float = 0.0625
    swish_inner: bool = True
    block_idx: int = 0
    dilation: int = 1
    zero_init_final_bn: bool = False
    # RESNET.ZERO_INIT_FINAL_CONV (reference weight_init_helper.py:23:
    # convs marked `final_conv` — BasicTransform.b / Bottleneck.c — are
    # zero-filled instead of MSRA when the flag is on)
    zero_init_final_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        tk = self.temp_kernel_size
        x = nn.Conv(
            self.dim_inner,
            (1, 1, 1),
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="a",
        )(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.dim_inner,
            (tk, 3, 3),
            strides=(1, self.stride, self.stride),
            padding=((tk // 2,) * 2, (self.dilation,) * 2, (self.dilation,) * 2),
            kernel_dilation=(1, self.dilation, self.dilation),
            feature_group_count=self.dim_inner,
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="b",
        )(x)
        x = self.norm(name="b_bn", dtype=self.dtype)(x, train)
        # SE on every other block (reference: use_se when block_idx % 2 == 0)
        if self.se_ratio > 0.0 and self.block_idx % 2 == 0:
            x = SE(ratio=self.se_ratio, name="se")(x)
        x = nn.swish(x) if self.swish_inner else nn.relu(x)
        x = nn.Conv(
            self.dim_out,
            (1, 1, 1),
            use_bias=False,
            kernel_init=(
                nn.initializers.zeros if self.zero_init_final_conv
                else msra_init
            ),
            dtype=self.dtype,
            name="c",
        )(x)
        x = self.norm(
            name="c_bn", dtype=self.dtype, zero_init_scale=self.zero_init_final_bn
        )(x, train)
        return x


TRANS_FUNCS = {
    "basic_transform": BasicTransform,
    "bottleneck_transform": BottleneckTransform,
    "x3d_transform": X3DTransform,
}


class ResBlock(nn.Module):
    """Residual block with projection shortcut when shape changes
    (reference resnet_helper.py ResBlock)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    temp_kernel_size: int
    stride: int
    norm: Callable
    trans_func_name: str = "bottleneck_transform"
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    se_ratio: float = 0.0
    swish_inner: bool = True
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    zero_init_final_bn: bool = False
    # RESNET.ZERO_INIT_FINAL_CONV (reference weight_init_helper.py:23:
    # convs marked `final_conv` — BasicTransform.b / Bottleneck.c — are
    # zero-filled instead of MSRA when the flag is on)
    zero_init_final_conv: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        shortcut = x
        if self.dim_in != self.dim_out or self.stride != 1:
            shortcut = nn.Conv(
                self.dim_out,
                (1, 1, 1),
                strides=(1, self.stride, self.stride),
                use_bias=False,
                kernel_init=msra_init,
                dtype=self.dtype,
                name="branch1",
            )(x)
            shortcut = self.norm(name="branch1_bn", dtype=self.dtype)(
                shortcut, train
            )
        trans_cls = TRANS_FUNCS[self.trans_func_name]
        kwargs = dict(
            dim_out=self.dim_out,
            dim_inner=self.dim_inner,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            norm=self.norm,
            dilation=self.dilation,
            zero_init_final_bn=self.zero_init_final_bn,
            zero_init_final_conv=self.zero_init_final_conv,
            dtype=self.dtype,
            name="branch2",
        )
        if self.trans_func_name == "bottleneck_transform":
            kwargs.update(num_groups=self.num_groups, stride_1x1=self.stride_1x1)
        elif self.trans_func_name == "x3d_transform":
            kwargs.update(
                se_ratio=self.se_ratio,
                swish_inner=self.swish_inner,
                block_idx=self.block_idx,
            )
        elif self.trans_func_name == "basic_transform":
            kwargs.pop("dim_inner")
        out = trans_cls(**kwargs)(x, train)
        if self.drop_connect_rate > 0.0 and train:
            keep = 1.0 - self.drop_connect_rate
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(
                rng, keep, (out.shape[0],) + (1,) * (out.ndim - 1)
            )
            out = jnp.where(mask, out / keep, 0.0)
        return nn.relu(shortcut + out)


class ResStage(nn.Module):
    """One stage of p pathways x n blocks, with optional Nonlocal insertion
    (reference resnet_helper.py ResStage). Per-pathway hyperparameters come
    as lists, exactly like the reference config plumbing."""

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    dim_inner: Sequence[int]
    temp_kernel_sizes: Sequence[Sequence[int]]
    stride: Sequence[int]
    num_blocks: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    norm: Callable
    nonlocal_inds: Sequence[Sequence[int]] = ((),)
    nonlocal_group: Sequence[int] = (1,)
    nonlocal_pool: Any = None
    instantiation: str = "softmax"
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    dilation: Sequence[int] = (1,)
    drop_connect_rate: float = 0.0
    zero_init_final_bn: bool = False
    # RESNET.ZERO_INIT_FINAL_CONV (reference weight_init_helper.py:23:
    # convs marked `final_conv` — BasicTransform.b / Bottleneck.c — are
    # zero-filled instead of MSRA when the flag is on)
    zero_init_final_conv: bool = False
    # TPU.REMAT_GRANULARITY='block': checkpoint each ResBlock so the
    # backward replays one block at a time (see config/defaults.py).
    # remat_block_policy carries TPU.REMAT_POLICY into the per-block
    # scopes (None = save nothing, the nn.remat default).
    remat_blocks: bool = False
    remat_block_policy: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    def _temp_kernels(self, pathway: int):
        """Cycle the kernel basis over blocks; blocks past
        num_block_temp_kernel use temporal kernel 1 (reference
        resnet_helper.py:595-604)."""
        tks = list(self.temp_kernel_sizes[pathway])
        n = self.num_blocks[pathway]
        k = self.num_block_temp_kernel[pathway]
        return (tks * n)[:k] + [1] * (n - k)

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool):
        block_cls = ResBlock
        if self.remat_blocks:
            block_cls = nn.remat(
                ResBlock, static_argnums=(2,), prevent_cse=False,
                policy=self.remat_block_policy,
            )
        outputs = []
        for pathway in range(len(self.num_blocks)):
            x = inputs[pathway]
            tks = self._temp_kernels(pathway)
            for i in range(self.num_blocks[pathway]):
                x = block_cls(
                    dim_in=self.dim_in[pathway] if i == 0 else self.dim_out[pathway],
                    dim_out=self.dim_out[pathway],
                    dim_inner=self.dim_inner[pathway],
                    temp_kernel_size=tks[i],
                    stride=self.stride[pathway] if i == 0 else 1,
                    norm=self.norm,
                    trans_func_name=self.trans_func_name,
                    num_groups=self.num_groups[pathway],
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[pathway],
                    se_ratio=0.0625 if self.trans_func_name == "x3d_transform" else 0.0,
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    zero_init_final_bn=self.zero_init_final_bn,
                    zero_init_final_conv=self.zero_init_final_conv,
                    dtype=self.dtype,
                    name=f"pathway{pathway}_res{i}",
                )(x, train)
                # identity outside a remat scope; under TPU.REMAT with
                # REMAT_POLICY='block_outs' the policy saves these, so the
                # backward recomputes one block at a time, not the stage
                x = checkpoint_name(x, "block_out")
                if i in tuple(self.nonlocal_inds[pathway]):
                    x = Nonlocal(
                        dim_inner=self.dim_out[pathway] // 2,
                        pool_size=(
                            tuple(self.nonlocal_pool[pathway])
                            if self.nonlocal_pool is not None
                            else None
                        ),
                        instantiation=self.instantiation,
                        norm=self.norm,
                        group_size=self.nonlocal_group[pathway],
                        dtype=self.dtype,
                        name=f"pathway{pathway}_nonlocal{i}",
                    )(x, train)
            outputs.append(x)
        return outputs
