"""Model math utilities: width rounding, sin-cos position embeddings,
pos-embed interpolation, MViT feature geometry.

Reference: ``models/utils.py:11-225``.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def remat_policy(cfg):
    """Map ``cfg.TPU.REMAT_POLICY`` to a jax.checkpoint policy (or None =
    save nothing, the nn.remat default). Passed to the per-stage/per-block
    remat scopes when TPU.REMAT is on; 'block_outs' pairs with the
    ``checkpoint_name('block_out')`` tags ResStage places on every
    residual-block output, so the backward recomputes at most one block
    instead of a whole stage (see config/defaults.py TPU.REMAT_POLICY)."""
    import jax

    name = getattr(cfg.TPU, "REMAT_POLICY", "") or ""
    if not name:
        return None
    if name == "block_outs":
        return jax.checkpoint_policies.save_only_these_names("block_out")
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown TPU.REMAT_POLICY={name!r}")


def stage_remat(cfg, stage_cls):
    """Resolve the (class, extra kwargs) for a residual stage under the
    TPU.REMAT / REMAT_GRANULARITY / REMAT_POLICY knobs — one place for
    the rule the ResNet/SlowFast/X3D builders share:

    - granularity 'stage': wrap the whole stage in nn.remat(policy).
    - granularity 'block': the stage wraps each ResBlock instead and the
      policy rides along (remat_block_policy).
    """
    if not (cfg.TPU.REMAT or cfg.MODEL.ACT_CHECKPOINT):
        return stage_cls, {}
    if getattr(cfg.TPU, "REMAT_GRANULARITY", "stage") == "block":
        return stage_cls, {
            "remat_blocks": True,
            "remat_block_policy": remat_policy(cfg),
        }
    from flax import linen as nn

    return (
        nn.remat(
            stage_cls, static_argnums=(2,), prevent_cse=False,
            policy=remat_policy(cfg),
        ),
        {},
    )


def round_width(width, multiplier, min_width=1, divisor=1) -> int:
    """(reference models/utils.py:11-24)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def _sincos_1d(embed_dim: int, positions: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2))
    out = np.einsum("p,d->pd", positions.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, length: int, cls_token=False):
    emb = _sincos_1d(embed_dim, np.arange(length))
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token=False):
    """(reference models/utils.py get_2d_sincos_pos_embed)."""
    gh = np.arange(grid_size, dtype=np.float64)
    gw = np.arange(grid_size, dtype=np.float64)
    grid_w, grid_h = np.meshgrid(gw, gh)
    emb_h = _sincos_1d(embed_dim // 2, grid_h)
    emb_w = _sincos_1d(embed_dim // 2, grid_w)
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, t_size: int, cls_token=False
):
    """Spatial 3/4 + temporal 1/4 split (reference models/utils.py:56-100)."""
    assert embed_dim % 4 == 0
    embed_dim_spatial = embed_dim // 4 * 3
    embed_dim_temporal = embed_dim // 4
    pos_spatial = get_2d_sincos_pos_embed(embed_dim_spatial, grid_size)
    pos_temporal = _sincos_1d(embed_dim_temporal, np.arange(t_size)).astype(
        np.float32
    )
    n_spatial = grid_size * grid_size
    pos = np.concatenate(
        [
            np.repeat(pos_temporal[:, None, :], n_spatial, axis=1),
            np.tile(pos_spatial[None, :, :], (t_size, 1, 1)),
        ],
        axis=-1,
    ).reshape(t_size * n_spatial, embed_dim)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim), np.float32), pos], axis=0)
    return pos.astype(np.float32)


def calc_mvit_feature_geometry(cfg) -> Tuple[List[List[int]], List[List[int]]]:
    """Per-depth (T, H, W) feature size and stride (reference
    models/utils.py:150-225)."""
    feat_size = [
        [
            cfg.DATA.NUM_FRAMES // cfg.MVIT.PATCH_STRIDE[0]
            if not cfg.MVIT.PATCH_2D
            else cfg.DATA.NUM_FRAMES,
            cfg.DATA.TRAIN_CROP_SIZE // cfg.MVIT.PATCH_STRIDE[1],
            cfg.DATA.TRAIN_CROP_SIZE // cfg.MVIT.PATCH_STRIDE[2],
        ]
        for _ in range(cfg.MVIT.DEPTH + 1)
    ]
    feat_stride = [
        [
            cfg.MVIT.PATCH_STRIDE[0] if not cfg.MVIT.PATCH_2D else 1,
            cfg.MVIT.PATCH_STRIDE[1],
            cfg.MVIT.PATCH_STRIDE[2],
        ]
        for _ in range(cfg.MVIT.DEPTH + 1)
    ]
    # kernel for the Q pool (mvit_block_schedule uses the same choice)
    kq = (
        list(cfg.MVIT.POOL_KVQ_KERNEL)
        if cfg.MVIT.POOL_KVQ_KERNEL is not None
        else None
    )
    for _, x in enumerate(cfg.MVIT.POOL_Q_STRIDE):
        depth = x[0]
        for i in range(cfg.MVIT.DEPTH + 1):
            if i >= depth + 1:
                for j in range(3):
                    s = x[j + 1]
                    k = kq[j] if kq is not None else (s + 1 if s > 1 else s)
                    # conv-arithmetic grid (pad k//2), matching what the
                    # pooled attention actually produces — size//stride
                    # (the reference models/utils.py:150-225 formula)
                    # diverges on ODD sizes (39 -> 20 vs 19; caught at
                    # the 312^2 preset in the r4 AOT certification)
                    feat_size[i][j] = max(
                        (feat_size[i][j] + 2 * (k // 2) - k) // s + 1, 1
                    )
                    feat_stride[i][j] = feat_stride[i][j] * s
    return feat_size, feat_stride


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_len: int, cls_token: bool = True
) -> jnp.ndarray:
    """1D linear interpolation of a token pos-embed table (reference
    models/utils.py pos-embed checkpoint interpolation)."""
    import jax

    prefix = 1 if cls_token else 0
    table = pos_embed[:, prefix:]
    old_len = table.shape[1]
    if old_len == new_len:
        return pos_embed
    scaled = jax.image.resize(
        table, (table.shape[0], new_len, table.shape[2]), method="linear"
    )
    return jnp.concatenate([pos_embed[:, :prefix], scaled], axis=1)
