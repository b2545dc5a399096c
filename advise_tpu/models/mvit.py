"""MViT v1/v2 video transformer.

Reference: ``models/video_model_builder.py:787-1245`` (config-complete here
— the fork dropped MVIT.REV and DATA.TRAIN_CROP_SIZE; restored). Same
dim/head multiplier schedule, adaptive KV-stride decay, abs/sep/fixed-
sincos position embeddings, cls token, and head variants.

Reversible mode (MVIT.REV.ENABLE): the reference implements a custom
two-stream autograd (``models/reversible_mvit.py``) to get O(1) activation
memory. On TPU the same memory profile comes from ``jax.remat`` over the
two-stream structure: we keep the reversible two-stream computation
(X1 += attn(X2); X2 += mlp(X1); lateral fusion at stage transitions) so
checkpoints/weights are layout-compatible, and rematerialize instead of
hand-rolling the inverse pass (SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advise_tpu.models.layers.attention import MultiScaleBlock, trunc02
from advise_tpu.models.layers.common import TwoStreamFusion
from advise_tpu.models.layers.heads import TransformerBasicHead
from advise_tpu.models.layers.stem import PatchEmbed
from advise_tpu.models.utils import (
    get_3d_sincos_pos_embed,
    round_width,
)


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
            input_size = [
                size // s for size, s in zip(input_size, stride_q[i])
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


class MViT(nn.Module):
    cfg: Any  # CfgRef
    norm: Any  # unused (transformer uses LayerNorm) — kept for registry ABI
    dtype: Optional[jnp.dtype] = None
    include_head: bool = True
    # masked-pretrain hooks (used by MaskMViT)
    depth_override: Optional[int] = None
    return_intermediate: Tuple[int, ...] = ()

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
                MultiScaleBlock, static_argnums=(2, 3), prevent_cse=False
            )

        intermediates = []
        if rev:
            # two-stream reversible (reference reversible_mvit.py structure;
            # memory via remat on TPU). cls token unsupported, as reference.
            assert not cls_on, "reversible MViT requires CLS_EMBED_ON=False"
            x1, x2 = x, x
            for i, spec in enumerate(schedule):
                stage_transition = spec["dim"] != spec["dim_out"] or (
                    len(spec["stride_q"]) > 0 and math.prod(spec["stride_q"]) > 1
                )
                blk = block_cls(
                    **{k: tuple(v) if isinstance(v, list) else v
                       for k, v in spec.items()},
                    mlp_ratio=cfg.MVIT.MLP_RATIO,
                    qkv_bias=cfg.MVIT.QKV_BIAS,
                    drop_rate=cfg.MVIT.DROPOUT_RATE,
                    drop_path=float(dpr[i]),
                    layer_scale_init_value=cfg.MVIT.LAYER_SCALE_INIT_VALUE,
                    mode=cfg.MVIT.MODE,
                    has_cls_embed=False,
                    pool_first=cfg.MVIT.POOL_FIRST,
                    rel_pos_spatial=cfg.MVIT.REL_POS_SPATIAL,
                    rel_pos_temporal=cfg.MVIT.REL_POS_TEMPORAL,
                    rel_pos_zero_init=cfg.MVIT.REL_POS_ZERO_INIT,
                    residual_pooling=cfg.MVIT.RESIDUAL_POOLING,
                    dim_mul_in_att=cfg.MVIT.DIM_MUL_IN_ATT,
                    separate_qkv=cfg.MVIT.SEPARATE_QKV,
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )
                # track the token grid on the python side: a remat'd
                # block returns thw as traced values
                next_thw = _pooled_thw(thw, spec["kernel_q"], spec["stride_q"])
                if stage_transition:
                    # StageTransitionBlock: fuse streams, run block, re-split
                    fused = (x1 + x2) / 2.0
                    out, _ = blk(fused, thw, not train)
                    x1 = x2 = out
                else:
                    delta, _ = blk(x2, thw, not train)
                    x1 = x1 + delta
                    x1, x2 = x2, x1
                thw = next_thw
            x = jnp.concatenate([x1, x2], axis=-1)
            x = TwoStreamFusion(
                mode=cfg.MVIT.REV.RESPATH_FUSE, name="fuse"
            )(x)
            if "concat" in cfg.MVIT.REV.RESPATH_FUSE:
                final_norm_dim = 2 * final_dim
            else:
                final_norm_dim = final_dim
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
