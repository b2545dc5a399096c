"""MViT v1/v2 video transformer.

Reference: ``models/video_model_builder.py:787-1245`` (config-complete here
— the fork dropped MVIT.REV and DATA.TRAIN_CROP_SIZE; restored). Same
dim/head multiplier schedule, adaptive KV-stride decay, abs/sep/fixed-
sincos position embeddings, cls token, and head variants.

Reversible mode (MVIT.REV.ENABLE): true O(1)-activation-memory reversible
backprop, the TPU equivalent of the reference's hand-rolled two-stream
autograd (``models/reversible_mvit.py:183-696``). Each uniform segment
(consecutive blocks with no dim change / Q pooling) is split into
attention (F) and MLP (G) sub-blocks coupled as ``Y1 = X1 + F(X2);
Y2 = X2 + G(Y1)`` (the reference's ReversibleBlock form, :279-382) and run
under ``parallel.reversible.reversible_block_scan`` — a custom-VJP
``lax.scan`` whose backward reconstructs block inputs by inversion instead
of storing them. Stage-transition blocks fuse the streams and run a
rematerialized full MultiScaleBlock (the reference's
StageTransitionBlock, :385-443). ``MVIT.REV.O1_SCAN=False`` runs the same
coupling with plain autodiff (O(depth) memory) — the gradient-parity
oracle for the custom VJP.
"""

from __future__ import annotations

import logging
import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advise_tpu.models.layers.attention import (
    MultiScaleAttention,
    MultiScaleBlock,
    trunc02,
)
from advise_tpu.models.layers.common import Mlp, TwoStreamFusion
from advise_tpu.models.layers.heads import TransformerBasicHead
from advise_tpu.models.layers.stem import PatchEmbed
from advise_tpu.models.utils import (
    get_3d_sincos_pos_embed,
    remat_policy,
    round_width,
)
from advise_tpu.parallel.mesh import SEQ_AXIS
from advise_tpu.parallel.pipeline import (
    gpipe,
    stage_slice,
    sync_cotangents,
)
from advise_tpu.parallel.reversible import reversible_block_scan


def _block_seq_axis(cfg, spec):
    """'seq' when this block is eligible for sequence-parallel ring
    attention (MVIT.SEQ_SHARD groundwork for the pod-scale config #5):
    token count over threshold, no cls token, no rel-pos."""
    if not cfg.MVIT.SEQ_SHARD or cfg.MVIT.CLS_EMBED_ON:
        return None
    if cfg.MVIT.REL_POS_SPATIAL or cfg.MVIT.REL_POS_TEMPORAL:
        return None
    if math.prod(spec["input_size"]) < cfg.MVIT.SEQ_SHARD_MIN_TOKENS:
        return None
    return SEQ_AXIS


def mvit_block_schedule(cfg, patch_dims=None):
    """Resolve per-depth (dim, dim_out, heads, pools, strides, input_size)
    (reference video_model_builder.py:900-1015). ``patch_dims`` overrides
    the divide-by-stride estimate with the actual PatchEmbed output grid
    (conv arithmetic differs from integer division for some paddings)."""
    depth = cfg.MVIT.DEPTH
    embed_dim = cfg.MVIT.EMBED_DIM
    num_heads = cfg.MVIT.NUM_HEADS
    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    for d, m in cfg.MVIT.DIM_MUL:
        dim_mul[d] = m
    for d, m in cfg.MVIT.HEAD_MUL:
        head_mul[d] = m

    pool_q = [[] for _ in range(depth)]
    pool_kv = [[] for _ in range(depth)]
    stride_q = [[] for _ in range(depth)]
    stride_kv = [[] for _ in range(depth)]
    for entry in cfg.MVIT.POOL_Q_STRIDE:
        i = entry[0]
        stride_q[i] = list(entry[1:])
        pool_q[i] = (
            list(cfg.MVIT.POOL_KVQ_KERNEL)
            if cfg.MVIT.POOL_KVQ_KERNEL is not None
            else [s + 1 if s > 1 else s for s in entry[1:]]
        )
    kv_entries = list(cfg.MVIT.POOL_KV_STRIDE)
    if cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
        _stride_kv = list(cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE)
        kv_entries = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [
                    max(_stride_kv[d] // stride_q[i][d], 1)
                    for d in range(len(_stride_kv))
                ]
            kv_entries.append([i] + _stride_kv)
    for entry in kv_entries:
        i = entry[0]
        stride_kv[i] = list(entry[1:])
        pool_kv[i] = (
            list(cfg.MVIT.POOL_KVQ_KERNEL)
            if cfg.MVIT.POOL_KVQ_KERNEL is not None
            else [s + 1 if s > 1 else s for s in entry[1:]]
        )

    patch_stride = list(cfg.MVIT.PATCH_STRIDE)
    if cfg.MVIT.PATCH_2D:
        patch_stride = [1] + patch_stride
    if patch_dims is not None:
        input_size = list(patch_dims)
    else:
        input_size = [
            cfg.DATA.NUM_FRAMES // patch_stride[0],
            cfg.DATA.TRAIN_CROP_SIZE // patch_stride[1],
            cfg.DATA.TRAIN_CROP_SIZE // patch_stride[2],
        ]

    blocks = []
    dim = embed_dim
    for i in range(depth):
        heads = round_width(num_heads, head_mul[i])
        if cfg.MVIT.DIM_MUL_IN_ATT:
            dim_out = round_width(dim, dim_mul[i], divisor=heads)
        else:
            dim_out = round_width(
                dim,
                dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
        blocks.append(
            dict(
                dim=dim,
                dim_out=dim_out,
                num_heads=heads,
                input_size=list(input_size),
                kernel_q=pool_q[i],
                kernel_kv=pool_kv[i],
                stride_q=stride_q[i],
                stride_kv=stride_kv[i],
            )
        )
        if len(stride_q[i]) > 0:
            # conv-arithmetic grid (pad k//2), NOT size//stride: they
            # agree on even sizes but differ on odd ones (39 -> 20 vs
            # 19), where the floor-div the reference uses
            # (reversible_mvit.py:123-127) diverges from what its own
            # attention_pool actually produces — caught at the 312^2
            # preset's 78 -> 39 -> 20 grid in the r4 AOT certification
            input_size = [
                (size + 2 * (k // 2) - k) // s + 1
                for size, k, s in zip(input_size, pool_q[i], stride_q[i])
            ]
        dim = dim_out
    return blocks, dim  # final embed dim


def _pooled_thw(thw, kernel, stride):
    """Conv-arithmetic output grid of a padded pool (pad = k//2)."""
    if not stride:
        return tuple(thw)
    return tuple(
        (n + 2 * (k // 2) - k) // s + 1
        for n, k, s in zip(thw, kernel, stride)
    )


def _seg_sub_modules(cfg, spec, dtype):
    """Construct the (unbound) F/G sub-block modules for a uniform
    segment's spec."""
    attn_sub = RevAttnSub(
        dim=spec["dim"],
        num_heads=spec["num_heads"],
        input_size=tuple(spec["input_size"]),
        qkv_bias=cfg.MVIT.QKV_BIAS,
        drop_rate=cfg.MVIT.DROPOUT_RATE,
        kernel_q=tuple(spec["kernel_q"]),
        kernel_kv=tuple(spec["kernel_kv"]),
        stride_q=tuple(spec["stride_q"]),
        stride_kv=tuple(spec["stride_kv"]),
        mode=cfg.MVIT.MODE,
        pool_first=cfg.MVIT.POOL_FIRST,
        rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
        rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
        rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
        residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
        separate_qkv=cfg.MVIT.SEPARATE_QKV,
        layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
        seq_axis=_block_seq_axis(cfg, spec),
        flash=bool(cfg.TPU.FLASH_ATTENTION),
        flash_native_dim_only=bool(cfg.TPU.FLASH_NATIVE_DIM_ONLY),
        dtype=dtype,
        parent=None,
    )
    mlp_sub = RevMlpSub(
        dim=spec["dim"],
        mlp_ratio=cfg.MVIT.MLP_RATIO,
        drop_rate=cfg.MVIT.DROPOUT_RATE,
        layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
        dtype=dtype,
        parent=None,
    )
    return attn_sub, mlp_sub


def _drop_path_fn(res, rate, key, train: bool):
    """Functional stochastic depth: randomness comes from an explicit key
    (carried in the reversible scan's per-block params) so the backward
    reconstruction recomputes bit-identical values — the JAX analogue of
    the reference's seed save/restore (reversible_mvit.py:300-330)."""
    if not train:
        return res
    keep = 1.0 - rate
    shape = (res.shape[0],) + (1,) * (res.ndim - 1)
    mask = jax.random.bernoulli(key, p=keep, shape=shape)
    return jnp.where(mask, res / jnp.maximum(keep, 1e-8), 0.0).astype(res.dtype)


class RevAttnSub(nn.Module):
    """F sub-block of the reversible coupling: norm1 + pooled attention
    (reference reversible_mvit.py AttentionSubBlock :446-519). Uniform
    segments only: dim_out == dim, no Q pooling."""

    dim: int
    num_heads: int
    input_size: Tuple[int, int, int]
    qkv_bias: bool
    drop_rate: float
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    mode: str
    pool_first: bool
    rel_pos_spatial: bool
    rel_pos_temporal: bool
    rel_pos_zero_init: bool
    residual_pooling: bool
    separate_qkv: bool
    layer_scale_init_value: float = 0.0
    seq_axis: Optional[str] = None
    flash: bool = False  # see MultiScaleAttention.flash
    flash_native_dim_only: bool = False  # see MultiScaleAttention
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        xb, _ = MultiScaleAttention(
            dim_out=self.dim,
            num_heads=self.num_heads,
            input_size=tuple(self.input_size),
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            kernel_q=tuple(self.kernel_q),
            kernel_kv=tuple(self.kernel_kv),
            stride_q=tuple(self.stride_q),
            stride_kv=tuple(self.stride_kv),
            has_cls_embed=False,
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
            dtype=self.dtype,
            name="attn",
        )(xn, tuple(self.input_size), deterministic)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma_1",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            xb = gamma * xb
        return xb


class RevMlpSub(nn.Module):
    """G sub-block of the reversible coupling: norm2 + MLP (reference
    reversible_mvit.py MLPSubblock :522-560)."""

    dim: int
    mlp_ratio: float
    drop_rate: float
    layer_scale_init_value: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        xm = Mlp(
            hidden_features=int(self.dim * self.mlp_ratio),
            out_features=self.dim,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )(xn, deterministic)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma_2",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            xm = gamma * xm
        return xm


class StageTransitionBlock(nn.Module):
    """Non-reversible buffer block between reversible segments
    (reference ``reversible_mvit.py`` StageTransitionBlock :283-428).

    Honors the restored ``MVIT.REV`` structural knobs:

    - ``pre_q_fusion`` fuses the two equal reversible streams on entry
      (elementwise TwoStreamFusion modes add/max/min/avg; the 'concat*'
      dim-doubling variants of reference :89-97 are rejected loudly in
      ``assert_and_infer_cfg``).
    - ``res_path='conv'`` pools the residual through the attention's OWN
      pool_q conv + norm (shared weights — reference :343,385-410 uses
      ``self.F.attn.pool_q``); ``'max'`` uses the stride+1 maxpool
      (reference :345-352; for odd stride>1 the reference pads stride//2
      where we pad kernel//2 — identical for the 1/2/4 strides in use).
    - F/G are pre-norm attention / MLP sub-blocks and drop-path applies
      to the WHOLE output (reference :422-426), unlike MultiScaleBlock's
      per-branch drop-path.
    """

    dim: int
    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    drop_rate: float
    drop_path: float
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    mode: str = "conv"
    pool_first: bool = False
    rel_pos_spatial: bool = False
    rel_pos_temporal: bool = False
    rel_pos_zero_init: bool = False
    residual_pooling: bool = False
    separate_qkv: bool = False
    pre_q_fusion: str = "avg"
    res_path: str = "conv"
    seq_axis: Optional[str] = None
    flash: bool = False  # see MultiScaleAttention.flash
    flash_native_dim_only: bool = False  # see MultiScaleAttention
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw, deterministic: bool = True):
        from advise_tpu.models.layers.attention import _pool_tokens
        from advise_tpu.models.layers.common import DropPath

        x = TwoStreamFusion(mode=self.pre_q_fusion, name="pre_q_fuse")(x)
        x_res = x
        proj_needed = self.dim != self.dim_out
        if proj_needed and not self.pool_first:
            # reference :360-362: linear projection on the residual
            # before pooling (after, when pool_first)
            x_res = nn.Dense(
                self.dim_out, dtype=self.dtype, kernel_init=trunc02,
                name="res_proj",
            )(x_res)
        x_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn = MultiScaleAttention(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            input_size=tuple(self.input_size),
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            kernel_q=tuple(self.kernel_q),
            kernel_kv=tuple(self.kernel_kv),
            stride_q=tuple(self.stride_q),
            stride_kv=tuple(self.stride_kv),
            has_cls_embed=False,
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
            dtype=self.dtype,
            name="attn",
        )
        if self.res_path == "conv":
            x_block, thw_new, x_res = attn(
                x_norm, thw, deterministic, x_res=x_res
            )
        else:  # 'max'
            x_block, thw_new = attn(x_norm, thw, deterministic)
            stride = tuple(self.stride_q)
            if stride and math.prod(stride) > 1:
                kernel = tuple(s + 1 if s > 1 else s for s in stride)
                x_res, _ = _pool_tokens(
                    x_res[:, None], thw, kernel, stride, "max", False,
                )
                x_res = x_res[:, 0]
        if proj_needed and self.pool_first:
            x_res = nn.Dense(
                self.dim_out, dtype=self.dtype, kernel_init=trunc02,
                name="res_proj",
            )(x_res)
        x = x_res + x_block
        x_norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            hidden_features=int(self.dim_out * self.mlp_ratio),
            out_features=self.dim_out,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name="mlp",
        )(x_norm2, deterministic)
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic)
        return x, thw_new


class MViT(nn.Module):
    cfg: Any  # CfgRef
    norm: Any  # unused (transformer uses LayerNorm) — kept for registry ABI
    dtype: Optional[jnp.dtype] = None
    include_head: bool = True
    # masked-pretrain hooks (used by MaskMViT)
    depth_override: Optional[int] = None
    return_intermediate: Tuple[int, ...] = ()
    # pipeline-parallel execution of the reversible segments over the
    # 'pipe' mesh axis (TPU.MESH_PIPE > 1). Only the in-step model sets
    # this (build_model sync_axes contract): init and any outside-mesh
    # apply run the plain segment so the param tree is always full-size.
    pipeline: bool = False

    def _rev_segment(self, spec, seg_id, seg_len, rates, x1, x2, train):
        """Run one uniform reversible segment of ``seg_len`` F/G-coupled
        blocks. Params are stacked on axis 0 (one slice per block) so the
        whole segment is a single scanned program; with MVIT.REV.O1_SCAN
        the scan's custom VJP keeps activation memory O(1) in depth."""
        cfg = self.cfg
        attn_sub, mlp_sub = _seg_sub_modules(cfg, spec, self.dtype)
        sample = jnp.zeros((1,) + x1.shape[1:], x1.dtype)

        def stack_init(module):
            def init(key):
                keys = jax.random.split(key, seg_len)
                return jax.vmap(
                    lambda k: module.init(
                        {"params": k, "dropout": jax.random.fold_in(k, 1)},
                        sample,
                        True,
                    )["params"]
                )(keys)

            return init

        f_stack = self.param(f"rev_seg{seg_id}_f", stack_init(attn_sub))
        g_stack = self.param(f"rev_seg{seg_id}_g", stack_init(mlp_sub))
        if train:
            keys = jax.random.split(self.make_rng("dropout"), seg_len)
        else:
            keys = jax.random.split(jax.random.PRNGKey(0), seg_len)
        p_stack = {
            "f": f_stack,
            "g": g_stack,
            "rate": jnp.asarray(rates, jnp.float32),
        }
        c_stack = {"key": keys}

        def f_fn(p, c, xx):
            k_drop, k_path = jax.random.split(jax.random.fold_in(c["key"], 0))
            out = attn_sub.apply(
                {"params": p["f"]}, xx, not train,
                rngs={"dropout": k_drop} if train else None,
            )
            return _drop_path_fn(out, p["rate"], k_path, train)

        def g_fn(p, c, xx):
            k_drop, k_path = jax.random.split(jax.random.fold_in(c["key"], 1))
            out = mlp_sub.apply(
                {"params": p["g"]}, xx, not train,
                rngs={"dropout": k_drop} if train else None,
            )
            return _drop_path_fn(out, p["rate"], k_path, train)

        pipe = int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1)
        if pipe > 1 and self.pipeline and seg_len % pipe == 0:
            # GPipe over the 'pipe' mesh axis (parallel/pipeline.py):
            # stage s runs blocks [s*L/P, (s+1)*L/P) — the O(1)
            # reversible scan inside each stage — while microbatches
            # stream through via ppermute. sync_cotangents makes every
            # gradient leave the segment replicated across 'pipe'.
            # Segments whose length does not divide by pipe (short
            # boundary segments around stage transitions) fall through to
            # the plain path below — replicated compute, still correct.
            n_micro = int(getattr(cfg.TPU, "PIPE_MICROBATCH", 0) or 0)
            rows = x1.shape[0]
            if n_micro <= 0:
                # default: >= one microbatch per stage when the batch
                # allows (the fill bubble (P-1)/(M+P-1) shrinks with M;
                # the floor on M is P so every stage fills). Prefer the
                # SMALLEST divisor >= pipe — largest per-tick GEMMs at
                # full fill; fall back to the largest divisor below pipe.
                divs = [d for d in range(1, rows + 1) if rows % d == 0]
                at_least = [d for d in divs if d >= pipe]
                n_micro = at_least[0] if at_least else divs[-1]
                if n_micro != pipe:
                    logging.getLogger(__name__).info(
                        "pipeline: PIPE_MICROBATCH auto-resolved to %d "
                        "(pipe=%d, per-device rows=%d)",
                        n_micro, pipe, rows,
                    )
            p_stack, c_stack, x1, x2 = sync_cotangents(
                (p_stack, c_stack, x1, x2)
            )
            p_loc = stage_slice(p_stack, pipe)
            c_loc = stage_slice(c_stack, pipe)
            l_local = seg_len // pipe

            def stage(pair, m):
                a1, a2 = pair
                # independent stochastic draws per microbatch: fold the
                # microbatch index into every block key (consts, so the
                # reversible backward reconstructs identical values)
                c_m = {
                    "key": jax.vmap(jax.random.fold_in, (0, None))(
                        c_loc["key"], m
                    )
                }
                if cfg.MVIT.REV.O1_SCAN:
                    return reversible_block_scan(
                        f_fn, g_fn, p_loc, c_m, a1, a2
                    )
                for k in range(l_local):
                    p_k = jax.tree_util.tree_map(lambda a: a[k], p_loc)
                    c_k = jax.tree_util.tree_map(lambda a: a[k], c_m)
                    b1 = a1 + f_fn(p_k, c_k, a2)
                    b2 = a2 + g_fn(p_k, c_k, b1)
                    a1, a2 = b1, b2
                return a1, a2

            return gpipe(stage, (x1, x2), n_stage=pipe, n_micro=n_micro)

        if cfg.MVIT.REV.O1_SCAN:
            return reversible_block_scan(f_fn, g_fn, p_stack, c_stack, x1, x2)
        # plain-autodiff oracle path: identical math, O(depth) memory
        for k in range(seg_len):
            p_k = jax.tree_util.tree_map(lambda a: a[k], p_stack)
            c_k = jax.tree_util.tree_map(lambda a: a[k], c_stack)
            y1 = x1 + f_fn(p_k, c_k, x2)
            y2 = x2 + g_fn(p_k, c_k, y1)
            x1, x2 = y1, y2
        return x1, x2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        token_mask: Optional[jnp.ndarray] = None,
        mask_token: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        depth = self.depth_override or cfg.MVIT.DEPTH
        embed_dim = cfg.MVIT.EMBED_DIM
        cls_on = cfg.MVIT.CLS_EMBED_ON
        dpr = np.linspace(0, cfg.MVIT.DROPPATH_RATE, cfg.MVIT.DEPTH)

        x, (t, h, w) = PatchEmbed(
            dim_out=embed_dim,
            kernel=tuple(cfg.MVIT.PATCH_KERNEL),
            stride=tuple(cfg.MVIT.PATCH_STRIDE),
            padding=tuple(cfg.MVIT.PATCH_PADDING),
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        b, n, c = x.shape
        patch_dims = (t, h, w)
        schedule, final_dim = mvit_block_schedule(cfg, patch_dims)
        schedule = schedule[:depth]
        if self.depth_override:
            final_dim = schedule[-1]["dim_out"]

        # MaskFeat-style input masking: replace masked tokens before pos
        # embed (reference masked.py _maskfeat_forward)
        if token_mask is not None and mask_token is not None:
            x = jnp.where(token_mask[..., None], mask_token, x)

        if cfg.MVIT.USE_FIXED_SINCOS_POS:
            sincos = get_3d_sincos_pos_embed(embed_dim, h, t, cls_token=cls_on)
            sincos = jnp.asarray(sincos)[None]
            x = x + sincos[:, 1 if cls_on else 0 :, :]

        if cls_on:
            cls_token = self.param(
                "cls_token", trunc02, (1, 1, embed_dim)
            )
            cls_tokens = jnp.broadcast_to(cls_token, (b, 1, embed_dim)).astype(
                x.dtype
            )
            if cfg.MVIT.USE_FIXED_SINCOS_POS:
                cls_tokens = cls_tokens + sincos[:, :1]
            x = jnp.concatenate([cls_tokens, x], axis=1)

        if cfg.MVIT.USE_ABS_POS and not cfg.MVIT.USE_FIXED_SINCOS_POS:
            if cfg.MVIT.SEP_POS_EMBED:
                pe_s = self.param(
                    "pos_embed_spatial", trunc02, (1, h * w, embed_dim)
                )
                pe_t = self.param(
                    "pos_embed_temporal", trunc02, (1, t, embed_dim)
                )
                pe = jnp.tile(pe_s, (1, t, 1)) + jnp.repeat(
                    pe_t, h * w, axis=1
                )
                if cls_on:
                    pe_c = self.param(
                        "pos_embed_class", trunc02, (1, 1, embed_dim)
                    )
                    pe = jnp.concatenate([pe_c, pe], axis=1)
            else:
                pe = self.param(
                    "pos_embed",
                    trunc02,
                    (1, n + (1 if cls_on else 0), embed_dim),
                )
            x = x + pe.astype(x.dtype)
        elif cfg.MVIT.USE_ABS_POS and cfg.MVIT.USE_FIXED_SINCOS_POS:
            pass  # already added

        if cfg.MVIT.DROPOUT_RATE > 0:
            x = nn.Dropout(cfg.MVIT.DROPOUT_RATE)(x, deterministic=not train)
        if cfg.MVIT.NORM_STEM:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_stem")(x)

        thw = patch_dims
        rev = cfg.MVIT.REV.ENABLE
        block_cls = MultiScaleBlock
        if cfg.MODEL.ACT_CHECKPOINT or cfg.TPU.REMAT or rev:
            block_cls = nn.remat(
                MultiScaleBlock, static_argnums=(2, 3), prevent_cse=False,
                policy=remat_policy(cfg),
            )

        intermediates = []
        if rev:
            # two-stream reversible with true O(1) backward (module
            # docstring). cls token unsupported, as reference.
            assert not cls_on, "reversible MViT requires CLS_EMBED_ON=False"
            # Intermediate capture (MaskMViT pretrain depths): inside a
            # reversible segment the per-block activations are by design
            # not materialized, so requested depths must land on chunk
            # boundaries (a stage transition or the last block of a
            # uniform segment — MASK.PRETRAIN_DEPTH=[depth-1] always
            # qualifies). The two streams fuse through the same
            # RESPATH_FUSE module family the reference's RevMViT head
            # uses (reference reversible_mvit.py TwoStreamFusion).
            x1, x2 = x, x
            i = 0
            seg_id = 0
            seg_lens = []  # uniform-segment lengths, for the pipe guard
            # a layer is a (non-reversible) stage transition when its
            # spec forces it (dim change or Q-pooling) OR when the config
            # lists it in MVIT.REV.BUFFER_LAYERS (reference
            # reversible_mvit.py:89: `if i in cfg.MVIT.REV.BUFFER_LAYERS`
            # — the reference relies ENTIRELY on the list; we infer the
            # structurally-required ones and let the knob force extras)
            buffer_layers = {int(b) for b in cfg.MVIT.REV.BUFFER_LAYERS}
            transition_cls = nn.remat(
                StageTransitionBlock, static_argnums=(2, 3),
                prevent_cse=False, policy=remat_policy(cfg),
            )
            while i < len(schedule):
                spec = schedule[i]
                uniform = spec["dim"] == spec["dim_out"] and (
                    len(spec["stride_q"]) == 0
                    or math.prod(spec["stride_q"]) == 1
                ) and i not in buffer_layers
                if not uniform:
                    # StageTransitionBlock (reference :283-428): fuse the
                    # two streams (MVIT.REV.PRE_Q_FUSION), pooled residual
                    # (MVIT.REV.RES_PATH), F/G, output drop-path
                    blk = transition_cls(
                        **{k: tuple(v) if isinstance(v, list) else v
                           for k, v in spec.items()},
                        mlp_ratio=cfg.MVIT.MLP_RATIO,
                        qkv_bias=cfg.MVIT.QKV_BIAS,
                        drop_rate=cfg.MVIT.DROPOUT_RATE,
                        drop_path=float(dpr[i]),
                        mode=cfg.MVIT.MODE,
                        pool_first=cfg.MVIT.POOL_FIRST,
                        rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
                        rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
                        rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
                        residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                        separate_qkv=cfg.MVIT.SEPARATE_QKV,
                        pre_q_fusion=cfg.MVIT.REV.PRE_Q_FUSION,
                        res_path=cfg.MVIT.REV.RES_PATH,
                        seq_axis=_block_seq_axis(cfg, spec),
                        flash=bool(cfg.TPU.FLASH_ATTENTION),
                        flash_native_dim_only=bool(
                            cfg.TPU.FLASH_NATIVE_DIM_ONLY),
                        dtype=self.dtype,
                        name=f"blocks_{i}",
                    )
                    # discard the block's returned thw: through nn.remat
                    # python ints in outputs come back traced; the grid
                    # is statically recomputable
                    out, _ = blk(
                        jnp.concatenate([x1, x2], axis=-1), thw, not train
                    )
                    x1 = x2 = out
                    thw = _pooled_thw(thw, spec["kernel_q"], spec["stride_q"])
                    if i in self.return_intermediate:
                        intermediates.append((out, thw))
                    i += 1
                    continue

                # uniform segment: group all consecutive identical specs
                # (stopping at forced buffer layers)
                j = i
                while (
                    j < len(schedule)
                    and schedule[j] == spec
                    and j not in buffer_layers
                ):
                    j += 1
                seg_lens.append(j - i)
                x1, x2 = self._rev_segment(
                    spec, seg_id, j - i, dpr[i:j], x1, x2, train
                )
                inside = [d for d in self.return_intermediate if i <= d < j - 1]
                assert not inside, (
                    f"return_intermediate depths {inside} fall INSIDE a "
                    f"reversible segment [{i},{j}); with MVIT.REV.ENABLE "
                    "only segment-boundary depths are materialized — move "
                    "MASK.PRETRAIN_DEPTH to a stage boundary or the final "
                    "block, or disable REV"
                )
                if j - 1 in self.return_intermediate:
                    feat = TwoStreamFusion(
                        mode=cfg.MVIT.REV.RESPATH_FUSE,
                        name=f"fuse_inter_{seg_id}",
                    )(jnp.concatenate([x1, x2], axis=-1))
                    intermediates.append((feat, thw))
                seg_id += 1
                i = j
            pipe = int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1)
            if pipe > 1 and self.pipeline:
                # loud no-op guard (the project's dead-knob rule): if NO
                # segment length divides by the stage count, the whole
                # "pipelined" model would silently run replicated.
                # seg_lens was recorded by the walk above — the guard can
                # never desynchronize from what actually pipelined.
                assert any(l % pipe == 0 and l >= pipe for l in seg_lens), (
                    f"TPU.MESH_PIPE={pipe} divides none of the reversible "
                    f"segment lengths {seg_lens} — every segment would "
                    "fall back to replicated compute. Pick a pipe size "
                    "that divides a segment, or force a split with "
                    "MVIT.REV.BUFFER_LAYERS"
                )
            if self.return_intermediate:
                return intermediates
            x = jnp.concatenate([x1, x2], axis=-1)
            x = TwoStreamFusion(
                mode=cfg.MVIT.REV.RESPATH_FUSE, name="fuse"
            )(x)
            x = jnp.mean(x, axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        else:
            for i, spec in enumerate(schedule):
                blk = block_cls(
                    **{k: tuple(v) if isinstance(v, list) else v
                       for k, v in spec.items()},
                    mlp_ratio=cfg.MVIT.MLP_RATIO,
                    qkv_bias=cfg.MVIT.QKV_BIAS,
                    drop_rate=cfg.MVIT.DROPOUT_RATE,
                    drop_path=float(dpr[i]),
                    layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
                    mode=cfg.MVIT.MODE,
                    has_cls_embed=cls_on,
                    pool_first=cfg.MVIT.POOL_FIRST,
                    rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
                    rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
                    rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
                    residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                    dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
                    separate_qkv=cfg.MVIT.SEPARATE_QKV,
                    seq_axis=_block_seq_axis(cfg, spec),
                    flash=bool(cfg.TPU.FLASH_ATTENTION),
                        flash_native_dim_only=bool(
                            cfg.TPU.FLASH_NATIVE_DIM_ONLY),
                    # MASK.SCALE_INIT_BY_DEPTH (MAE fix_init_weight):
                    # proj/fc2 inits divided by sqrt(2 * layer_id)
                    init_div=(
                        (2.0 * (i + 1)) ** 0.5
                        if (cfg.MASK.ENABLE and cfg.MASK.SCALE_INIT_BY_DEPTH)
                        else 1.0
                    ),
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )
                x, _ = blk(x, thw, not train)
                thw = _pooled_thw(thw, spec["kernel_q"], spec["stride_q"])
                if i in self.return_intermediate:
                    intermediates.append((x, thw))

            if self.return_intermediate:
                return intermediates

            if not self.include_head:
                return x, thw

            if cfg.MVIT.USE_MEAN_POOLING:
                if cls_on:
                    x = x[:, 1:]
                x = jnp.mean(x, axis=1)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            elif cls_on:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
                x = x[:, 0]
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
                x = jnp.mean(x, axis=1)

        if not self.include_head:
            return x

        contrastive = cfg.MODEL.MODEL_NAME == "ContrastiveModel"
        return TransformerBasicHead(
            num_classes=(
                cfg.CONTRASTIVE.DIM if contrastive else cfg.MODEL.NUM_CLASSES
            ),
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            num_mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS if contrastive else 1,
            head_init_scale=cfg.MVIT.HEAD_INIT_SCALE,
            mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            bn_mlp=cfg.CONTRASTIVE.BN_MLP if contrastive else False,
            bn_sync_axes=(
                getattr(self.norm, "keywords", {}).get("sync_axes", ())
                if (contrastive and cfg.CONTRASTIVE.BN_SYNC_MLP)
                else ()
            ),
            dtype=self.dtype,
            name="head",
        )(x, train)
