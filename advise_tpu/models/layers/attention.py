"""Pooled multiscale attention (MViT v1/v2).

Reference: ``models/attention.py:14-567``. Same math: conv/max/avg token
pooling on the (T, H, W) grid, decomposed relative position biases
(spatial H/W + temporal), residual pooling, projection skips. Tokens stay
``[B, N, C]``; the pool ops reshape through ``[B*heads, T, H, W, c]``
(channel-last, so the depthwise pool conv is MXU/VPU-friendly).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advise_tpu.models.layers.common import DropPath, Mlp

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _pool_tokens(
    x: jnp.ndarray,
    thw: Tuple[int, int, int],
    kernel: Sequence[int],
    stride: Sequence[int],
    mode: str,
    has_cls: bool,
    conv: Optional[nn.Module] = None,
    norm: Optional[nn.Module] = None,
):
    """attention_pool (reference attention.py:14-49) on [B, H, L, c]."""
    if not kernel:
        return x, thw
    b, h, l, c = x.shape
    cls_tok = None
    if has_cls:
        cls_tok, x = x[:, :, :1], x[:, :, 1:]
    t, hh, ww = thw
    grid = x.reshape(b * h, t, hh, ww, c)
    pad = [(int(k // 2),) * 2 for k in kernel]
    if mode == "max":
        grid = nn.max_pool(grid, tuple(kernel), tuple(stride), pad)
    elif mode == "avg":
        grid = nn.avg_pool(grid, tuple(kernel), tuple(stride), pad)
    else:  # conv: depthwise, provided as a module
        grid = conv(grid)
    new_thw = grid.shape[1:4]
    x = grid.reshape(b, h, -1, c)
    if has_cls:
        x = jnp.concatenate([cls_tok, x], axis=2)
    if norm is not None:
        x = norm(x)
    return x, tuple(new_thw)


def _rel_pos_table(rel_pos: jnp.ndarray, d: int) -> jnp.ndarray:
    """get_rel_pos (reference :51-64): linear-resize the table to length d."""
    if rel_pos.shape[0] == d:
        return rel_pos
    return jax.image.resize(
        rel_pos, (d, rel_pos.shape[1]), method="linear"
    )


def _rel_dist(q_n: int, k_n: int) -> np.ndarray:
    q_ratio = max(k_n / q_n, 1.0)
    k_ratio = max(q_n / k_n, 1.0)
    dist = (
        np.arange(q_n)[:, None] * q_ratio - np.arange(k_n)[None, :] * k_ratio
    )
    return (dist + (k_n - 1) * k_ratio).astype(np.int64)


def add_rel_pos_spatial(attn, q, has_cls, q_shape, k_shape, rel_h, rel_w):
    """cal_rel_pos_spatial (reference :67-117)."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    Rh = _rel_pos_table(rel_h, 2 * max(q_h, k_h) - 1)[_rel_dist(q_h, k_h)]
    Rw = _rel_pos_table(rel_w, 2 * max(q_w, k_w) - 1)[_rel_dist(q_w, k_w)]
    b, nh, _, dim = q.shape
    r_q = q[:, :, sp:].reshape(b, nh, q_t, q_h, q_w, dim)
    rel_h_q = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh.astype(r_q.dtype))
    rel_w_q = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw.astype(r_q.dtype))
    block = attn[:, :, sp:, sp:].reshape(
        b, nh, q_t, q_h, q_w, k_t, k_h, k_w
    )
    block = (
        block
        + rel_h_q[:, :, :, :, :, None, :, None]
        + rel_w_q[:, :, :, :, :, None, None, :]
    ).reshape(b, nh, q_t * q_h * q_w, k_t * k_h * k_w)
    return attn.at[:, :, sp:, sp:].set(block) if sp else block


def add_rel_pos_temporal(attn, q, has_cls, q_shape, k_shape, rel_t):
    """cal_rel_pos_temporal (reference :120-159)."""
    sp = 1 if has_cls else 0
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    Rt = _rel_pos_table(rel_t, 2 * max(q_t, k_t) - 1)[_rel_dist(q_t, k_t)]
    b, nh, _, dim = q.shape
    r_q = q[:, :, sp:].reshape(b, nh, q_t, q_h, q_w, dim)
    rel = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt.astype(r_q.dtype))
    block = attn[:, :, sp:, sp:].reshape(
        b, nh, q_t, q_h, q_w, k_t, k_h, k_w
    )
    block = (block + rel[:, :, :, :, :, :, None, None]).reshape(
        b, nh, q_t * q_h * q_w, k_t * k_h * k_w
    )
    return attn.at[:, :, sp:, sp:].set(block) if sp else block


class MultiScaleAttention(nn.Module):
    """(reference attention.py:162-443)."""

    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    qkv_bias: bool = False
    drop_rate: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    has_cls_embed: bool = True
    mode: str = "conv"
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    separate_qkv: bool = False
    # sequence-parallel: mesh axis name to shard tokens over (ring
    # attention). Only legal without cls token / rel-pos, inside shard_map
    # over a mesh that carries this axis.
    seq_axis: Optional[str] = None
    # TPU.FLASH_ATTENTION: run eligible (rel-pos-free) score computation
    # through the Pallas flash kernel (ops/flash_attention.py). Non-TPU
    # backends fall back to the dense chain automatically.
    flash: bool = False
    # TPU.FLASH_NATIVE_DIM_ONLY: only flash blocks whose head_dim the
    # kernel supports natively (<=128 or a 128-multiple); blocks that
    # would need head_dim zero-padding (MViT's dim-doubling stages run
    # 192-wide heads, padded to 256 = +33% matmul flops) stay dense.
    flash_native_dim_only: bool = False
    # divide the out-proj's initialized weight (MAE fix_init_weight depth
    # rescale, MASK.SCALE_INIT_BY_DEPTH; reference masked.py:130)
    proj_init_div: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw, deterministic: bool = True,
                 x_res: Optional[jnp.ndarray] = None):
        """``x_res``: optional residual stream to pool through the SAME
        pool_q conv + norm as q (MVIT.REV.RES_PATH='conv', reference
        reversible_mvit.py:385-410 pools the StageTransition residual
        with ``self.F.attn.pool_q``/``norm_q`` — shared weights). When
        given, returns ``(out, q_shape, res_pooled)``."""
        b, n, _ = x.shape
        nh = self.num_heads
        head_dim = self.dim_out // nh
        scale = head_dim**-0.5
        kernel_q = tuple(self.kernel_q)
        kernel_kv = tuple(self.kernel_kv)
        stride_q = tuple(self.stride_q)
        stride_kv = tuple(self.stride_kv)
        if kernel_q and math.prod(kernel_q) == 1 and math.prod(stride_q) == 1:
            kernel_q = ()
        if kernel_kv and math.prod(kernel_kv) == 1 and math.prod(stride_kv) == 1:
            kernel_kv = ()

        dense = partial(
            nn.Dense,
            dtype=self.dtype,
            kernel_init=trunc02,
            bias_init=nn.initializers.constant(0.02),
        )

        def make_pool(name, kernel, dim_conv):
            if not kernel or self.mode in ("avg", "max"):
                return None, None
            conv = nn.Conv(
                dim_conv,
                kernel_size=tuple(kernel),
                strides=tuple(stride_q if name == "q" else stride_kv),
                padding=[(int(k // 2),) * 2 for k in kernel],
                feature_group_count=dim_conv,
                use_bias=False,
                dtype=self.dtype,
                name=f"pool_{name}",
            )
            norm = nn.LayerNorm(
                epsilon=1e-6, dtype=self.dtype, name=f"norm_{name}"
            )
            return conv, norm

        if self.pool_first:
            dim_conv = x.shape[-1] // nh
            folded = x.reshape(b, n, nh, -1).transpose(0, 2, 1, 3)
            q = k = v = folded
        else:
            if not self.separate_qkv:
                qkv = dense(self.dim_out * 3, use_bias=self.qkv_bias,
                            name="qkv")(x)
                qkv = qkv.reshape(b, n, 3, nh, -1).transpose(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
            else:
                q = dense(self.dim_out, use_bias=self.qkv_bias, name="q")(x)
                k = dense(self.dim_out, use_bias=self.qkv_bias, name="k")(x)
                v = dense(self.dim_out, use_bias=self.qkv_bias, name="v")(x)
                q = q.reshape(b, n, nh, -1).transpose(0, 2, 1, 3)
                k = k.reshape(b, n, nh, -1).transpose(0, 2, 1, 3)
                v = v.reshape(b, n, nh, -1).transpose(0, 2, 1, 3)
            dim_conv = self.dim_out // nh

        conv_q, norm_q = make_pool("q", kernel_q, dim_conv)
        conv_k, norm_k = make_pool("k", kernel_kv, dim_conv)
        conv_v, norm_v = make_pool("v", kernel_kv, dim_conv)

        res_pooled = None
        if x_res is not None:
            rc = x_res.shape[-1]
            fold = 1 if self.mode == "conv_unshared" else nh
            r = x_res.reshape(b, n, fold, rc // fold).transpose(0, 2, 1, 3)
            r, _ = _pool_tokens(
                r, thw, kernel_q, stride_q, self.mode,
                self.has_cls_embed, conv_q, norm_q,
            )
            res_pooled = r.transpose(0, 2, 1, 3).reshape(b, -1, rc)

        q, q_shape = _pool_tokens(
            q, thw, kernel_q, stride_q, self.mode, self.has_cls_embed,
            conv_q, norm_q,
        )
        k, k_shape = _pool_tokens(
            k, thw, kernel_kv, stride_kv, self.mode, self.has_cls_embed,
            conv_k, norm_k,
        )
        v, v_shape = _pool_tokens(
            v, thw, kernel_kv, stride_kv, self.mode, self.has_cls_embed,
            conv_v, norm_v,
        )

        if self.pool_first:
            def project(t_, name, n_tokens):
                t_ = t_.transpose(0, 2, 1, 3).reshape(b, n_tokens, -1)
                t_ = dense(self.dim_out, use_bias=self.qkv_bias, name=name)(t_)
                return t_.reshape(b, n_tokens, nh, -1).transpose(0, 2, 1, 3)

            sp = 1 if self.has_cls_embed else 0
            q = project(q, "q", math.prod(q_shape) + sp)
            k = project(k, "k", math.prod(k_shape) + sp)
            v = project(v, "v", math.prod(v_shape) + sp)

        use_ring = (
            self.seq_axis is not None
            and not self.rel_pos_spatial
            and not self.rel_pos_temporal
            and not self.has_cls_embed
        )
        if use_ring:
            from jax import lax

            from advise_tpu.parallel.ring_attention import ring_attention

            try:
                nseq = lax.axis_size(self.seq_axis)
            except NameError:
                # not tracing inside a mesh that carries the axis (e.g.
                # out-of-mesh init twin): dense fallback
                nseq = 0
            nq, nk = q.shape[2], k.shape[2]
            if nseq > 1 and nq % nseq == 0:
                my = lax.axis_index(self.seq_axis)
                q_l = lax.dynamic_slice_in_dim(
                    q, my * (nq // nseq), nq // nseq, 2
                )
                if nk == nq and nk % nseq == 0:
                    # square self-attention: full ring — [N/nseq, N/nseq]
                    # score blocks rotating K/V over ICI
                    k_l = lax.dynamic_slice_in_dim(
                        k, my * (nk // nseq), nk // nseq, 2
                    )
                    v_l = lax.dynamic_slice_in_dim(
                        v, my * (nk // nseq), nk // nseq, 2
                    )
                    out_l = ring_attention(
                        q_l, k_l, v_l, self.seq_axis, scale
                    )
                else:
                    # pooled-KV attention (MViT's POOL_KV_STRIDE shrinks
                    # K/V far below Q — e.g. 97,344 q vs 1,521 kv tokens
                    # at the 32x312 preset): keep the small K/V whole on
                    # every chip and shard only the Q tokens. The per-
                    # chip score matrix drops from [nq, nk] to
                    # [nq/nseq, nk] — the dominant per-chip temp of the
                    # pod-scale AOT certification — with zero ppermutes.
                    out_l = self._dense_attention(
                        q_l, k, v, scale, stride_q, stride_kv,
                        q_shape, k_shape,
                    )
                out = lax.all_gather(out_l, self.seq_axis, axis=2, tiled=True)
            else:
                use_ring = False
        if not use_ring:
            out = self._dense_attention(
                q, k, v, scale, stride_q, stride_kv, q_shape, k_shape
            )

        if self.residual_pooling:
            if self.has_cls_embed:
                out = out.at[:, :, 1:].add(q[:, :, 1:])
            else:
                out = out + q

        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.dim_out)
        if self.proj_init_div != 1.0:
            div = self.proj_init_div

            def proj_init(key, shape, dtype=jnp.float32):
                return trunc02(key, shape, dtype) / div

            out = dense(self.dim_out, kernel_init=proj_init, name="proj")(out)
        else:
            out = dense(self.dim_out, name="proj")(out)
        if self.drop_rate > 0.0:
            out = nn.Dropout(self.drop_rate)(out, deterministic=deterministic)
        if x_res is not None:
            return out, q_shape, res_pooled
        return out, q_shape

    def _dense_attention(self, q, k, v, scale, stride_q, stride_kv,
                         q_shape, k_shape):
        head_dim = self.dim_out // self.num_heads
        if (
            self.flash
            and not self.rel_pos_spatial
            and not self.rel_pos_temporal
            and not (
                self.flash_native_dim_only
                and head_dim > 128
                and head_dim % 128
            )
        ):
            from advise_tpu.ops.flash_attention import (
                flash_available, flash_mha,
            )

            if flash_available():
                return flash_mha(q, k, v, scale)
        attn = jnp.einsum(
            "bhqc,bhkc->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if self.rel_pos_spatial:
            rel_sp_dim = 2 * max(
                self.input_size[1] // (stride_q[1] if stride_q else 1),
                self.input_size[1] // (stride_kv[1] if stride_kv else 1),
            ) - 1
            init = (
                nn.initializers.zeros if self.rel_pos_zero_init else trunc02
            )
            rel_h = self.param("rel_pos_h", init, (rel_sp_dim, head_dim))
            rel_w = self.param("rel_pos_w", init, (rel_sp_dim, head_dim))
            attn = add_rel_pos_spatial(
                attn, q, self.has_cls_embed, q_shape, k_shape, rel_h, rel_w
            )
        if self.rel_pos_temporal:
            init = (
                nn.initializers.zeros if self.rel_pos_zero_init else trunc02
            )
            rel_t = self.param(
                "rel_pos_t", init, (2 * self.input_size[0] - 1, head_dim)
            )
            attn = add_rel_pos_temporal(
                attn, q, self.has_cls_embed, q_shape, k_shape, rel_t
            )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkc->bhqc", attn, v)


class MultiScaleBlock(nn.Module):
    """(reference attention.py:445-567)."""

    dim: int
    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path: float = 0.0
    layer_scale_init_value: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    dim_mul_in_att: bool = False
    separate_qkv: bool = False
    seq_axis: Optional[str] = None
    flash: bool = False  # see MultiScaleAttention.flash
    flash_native_dim_only: bool = False  # see MultiScaleAttention
    # MASK.SCALE_INIT_BY_DEPTH: attn out-proj and mlp fc2 inits divided by
    # sqrt(2 * layer_id) (reference MAE fix_init_weight, masked.py:130)
    init_div: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw, deterministic: bool = True):
        dense = partial(
            nn.Dense,
            dtype=self.dtype,
            kernel_init=trunc02,
            bias_init=nn.initializers.constant(0.02),
        )
        att_dim = self.dim_out if self.dim_mul_in_att else self.dim
        x_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x_block, thw_new = MultiScaleAttention(
            dim_out=att_dim,
            num_heads=self.num_heads,
            input_size=tuple(self.input_size),
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            kernel_q=tuple(self.kernel_q),
            kernel_kv=tuple(self.kernel_kv),
            stride_q=tuple(self.stride_q),
            stride_kv=tuple(self.stride_kv),
            has_cls_embed=self.has_cls_embed,
            mode=self.mode,
            pool_first=self.pool_first,
            rel_pos_spatial=self.rel_pos_spatial,
            rel_pos_temporal=self.rel_pos_temporal,
            rel_pos_zero_init=self.rel_pos_zero_init,
            residual_pooling=self.residual_pooling,
            separate_qkv=self.separate_qkv,
            seq_axis=self.seq_axis,
            flash=self.flash,
            flash_native_dim_only=self.flash_native_dim_only,
            proj_init_div=self.init_div,
            dtype=self.dtype,
            name="attn",
        )(x_norm, thw, deterministic)

        if self.dim_mul_in_att and self.dim != self.dim_out:
            x = dense(self.dim_out, name="proj")(x_norm)
        # skip-path pooling with kernel = stride+1 (reference :480-483)
        stride_skip = tuple(self.stride_q)
        kernel_skip = tuple(s + 1 if s > 1 else s for s in stride_skip)
        if stride_skip and math.prod(stride_skip) > 1:
            x_res, _ = _pool_tokens(
                x[:, None], thw, kernel_skip, stride_skip, "max",
                self.has_cls_embed,
            )
            x_res = x_res[:, 0]
        else:
            x_res = x

        gamma1 = gamma2 = None
        if self.layer_scale_init_value > 0:
            gamma1 = self.param(
                "gamma_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (att_dim,),
            )
            gamma2 = self.param(
                "gamma_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim_out,),
            )
        dp = DropPath(self.drop_path, name="drop_path")
        x = x_res + dp(
            x_block if gamma1 is None else gamma1 * x_block, deterministic
        )
        x_norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x_mlp = Mlp(
            hidden_features=int(att_dim * self.mlp_ratio),
            out_features=self.dim_out,
            drop_rate=self.drop_rate,
            fc2_init_div=self.init_div,
            dtype=self.dtype,
            name="mlp",
        )(x_norm2, deterministic)
        if not self.dim_mul_in_att and self.dim != self.dim_out:
            x = dense(self.dim_out, name="proj")(x_norm2)
        x = x + dp(x_mlp if gamma2 is None else gamma2 * x_mlp, deterministic)
        return x, thw_new
