"""Video Swin Transformer (3D shifted-window attention).

Reference: ``models/swin_transformer.py:82-628`` — the reference uses
``BasicLayer`` as the AdViSe temporal head (``temporal_modeling.py:90-107``)
and carries the full ``SwinTransformer3D`` unused; both are first-class
here (the full model is registered as ``SwinTransformer3D``).

TPU notes: window partition/reverse are pure reshapes/transposes; the
attention mask for shifted windows is computed once per static geometry
with numpy at trace time (no data-dependent control flow), and windowed
attention batches as one big [nW*B, heads, win, win] einsum on the MXU.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advise_tpu.models.utils import remat_policy

from advise_tpu.models.layers.common import DropPath, Mlp
from advise_tpu.models.layers.attention import trunc02


def window_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """[B, D, H, W, C] -> [B*nW, wd*wh*ww, C] (reference :25-38)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(windows: jnp.ndarray, window_size, b, d, h, w) -> jnp.ndarray:
    """(reference :41-53)."""
    wd, wh, ww = window_size
    x = windows.reshape(
        b, d // wd, h // wh, w // ww, wd, wh, ww, -1
    )
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window/shift to the input size (reference :56-66)."""
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_window[i] = x_size[i]
            if use_shift is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def compute_mask(d, h, w, window_size, shift_size) -> np.ndarray:
    """Attention mask for shifted windows (reference compute_mask :69-80),
    computed in numpy at trace time. Returns [nW, win, win] float mask of
    0 / -100."""
    img_mask = np.zeros((1, d, h, w, 1))
    cnt = 0
    for ds in (
        slice(-window_size[0]),
        slice(-window_size[0], -shift_size[0]) if shift_size[0] else None,
        slice(-shift_size[0], None) if shift_size[0] else None,
    ):
        if ds is None:
            continue
        for hs in (
            slice(-window_size[1]),
            slice(-window_size[1], -shift_size[1]) if shift_size[1] else None,
            slice(-shift_size[1], None) if shift_size[1] else None,
        ):
            if hs is None:
                continue
            for ws in (
                slice(-window_size[2]),
                slice(-window_size[2], -shift_size[2]) if shift_size[2] else None,
                slice(-shift_size[2], None) if shift_size[2] else None,
            ):
                if ws is None:
                    continue
                img_mask[:, ds, hs, ws, :] = cnt
                cnt += 1
    wd, wh, ww = window_size
    mask_windows = img_mask.reshape(
        1, d // wd, wd, h // wh, wh, w // ww, ww, 1
    ).transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


def _rel_pos_index(window_size) -> np.ndarray:
    """Pairwise relative-position index into the bias table
    (reference WindowAttention3D :96-118)."""
    wd, wh, ww = window_size
    coords = np.stack(
        np.meshgrid(
            np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"
        )
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


class WindowAttention3D(nn.Module):
    """(reference :83-160)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        b_, n, c = x.shape
        wd, wh, ww = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, kernel_init=trunc02,
            dtype=self.dtype, name="qkv",
        )(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(
            2, 0, 3, 1, 4
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhqc,bhkc->bhqk", q * head_dim**-0.5, k,
            preferred_element_type=jnp.float32,
        )
        table = self.param(
            "relative_position_bias_table",
            trunc02,
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads),
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(
                b_ // nw, nw, self.num_heads, n, n
            ) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(
            self.dim, kernel_init=trunc02, dtype=self.dtype, name="proj"
        )(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinTransformerBlock3D(nn.Module):
    """(reference :163-244)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size(
            (d, h, w), self.window_size, self.shift_size
        )
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # pad to window multiples
        pad_d = (window_size[0] - d % window_size[0]) % window_size[0]
        pad_h = (window_size[1] - h % window_size[1]) % window_size[1]
        pad_w = (window_size[2] - w % window_size[2]) % window_size[2]
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        _, dp, hp, wp, _ = x.shape
        if any(shift_size):
            x = jnp.roll(
                x, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                axis=(1, 2, 3),
            )
            mask = jnp.asarray(compute_mask(dp, hp, wp, window_size, shift_size))
        else:
            mask = None
        windows = window_partition(x, window_size)
        attn = WindowAttention3D(
            dim=c,
            window_size=tuple(window_size),
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            name="attn",
        )(windows, mask, deterministic)
        x = window_reverse(attn, window_size, b, dp, hp, wp)
        if any(shift_size):
            x = jnp.roll(
                x, shift=tuple(shift_size), axis=(1, 2, 3)
            )
        x = x[:, :d, :h, :w]
        dp_layer = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp_layer(x, deterministic)
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x2 = Mlp(
            hidden_features=int(c * self.mlp_ratio),
            out_features=c,
            drop_rate=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(x2, deterministic)
        return x + dp_layer(x2, deterministic)


class PatchMerging(nn.Module):
    """Downsample 2x spatially, 2x channels (reference :247-283)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, kernel_init=trunc02,
            dtype=self.dtype, name="reduction",
        )(x)


class BasicLayer(nn.Module):
    """One Swin stage: depth blocks alternating shift, optional merge
    (reference :286-372) — also the AdViSe 'video_swin' temporal head."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Any = 0.0
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None
    remat: bool = False  # TPU.REMAT: checkpoint each block's activations
    remat_pol: Any = None  # TPU.REMAT_POLICY (models.utils.remat_policy)

    @nn.compact
    def __call__(self, x, deterministic=True):
        # x: [B, D, H, W, C]
        shift = tuple(ws // 2 for ws in self.window_size)
        block_cls = SwinTransformerBlock3D
        if self.remat:
            # same policy as ResStage/MultiScaleBlock: recompute block
            # activations in the backward pass (deterministic is static)
            block_cls = nn.remat(
                SwinTransformerBlock3D, static_argnums=(2,),
                prevent_cse=False, policy=self.remat_pol,
            )
        for i in range(self.depth):
            dp = (
                self.drop_path[i]
                if isinstance(self.drop_path, (list, tuple))
                else self.drop_path
            )
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=tuple(self.window_size),
                shift_size=(0, 0, 0) if i % 2 == 0 else shift,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path=float(dp),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        if self.downsample:
            x = PatchMerging(dim=self.dim, dtype=self.dtype, name="downsample")(x)
        return x


class SwinTransformer3D(nn.Module):
    """Full video Swin backbone + classification head
    (reference :375-628). Config via MODEL.TEMPORAL_* unused; standard Swin
    hyperparameters are module attributes with Swin-T defaults."""

    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None
    # None -> resolve from cfg.SWIN (config-driven presets, e.g. Swin-B);
    # explicit values override (unit tests / AdViSe temporal head reuse)
    patch_size: Optional[Tuple[int, int, int]] = None
    embed_dim: Optional[int] = None
    depths: Optional[Tuple[int, ...]] = None
    num_heads: Optional[Tuple[int, ...]] = None
    window_size: Optional[Tuple[int, int, int]] = None
    mlp_ratio: Optional[float] = None
    drop_path_rate: Optional[float] = None
    include_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        cfg = self.cfg
        patch_size = tuple(self.patch_size or cfg.SWIN.PATCH_SIZE)
        embed_dim = self.embed_dim or cfg.SWIN.EMBED_DIM
        depths = tuple(self.depths or cfg.SWIN.DEPTHS)
        num_heads = tuple(self.num_heads or cfg.SWIN.NUM_HEADS)
        window_size = tuple(self.window_size or cfg.SWIN.WINDOW_SIZE)
        mlp_ratio = self.mlp_ratio or cfg.SWIN.MLP_RATIO
        drop_path_rate = (
            self.drop_path_rate
            if self.drop_path_rate is not None
            else cfg.SWIN.DROP_PATH_RATE
        )
        # patch embed (conv, no flatten — Swin keeps the grid)
        x = nn.Conv(
            embed_dim,
            kernel_size=patch_size,
            strides=patch_size,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_embed")(x)

        dpr = np.linspace(0, drop_path_rate, sum(depths))
        dim = embed_dim
        idx = 0
        for i, (depth, heads) in enumerate(zip(depths, num_heads)):
            x = BasicLayer(
                dim=dim,
                depth=depth,
                num_heads=heads,
                window_size=window_size,
                mlp_ratio=mlp_ratio,
                drop_path=[float(d) for d in dpr[idx : idx + depth]],
                downsample=i < len(depths) - 1,
                dtype=self.dtype,
                remat=bool(cfg.TPU.REMAT),
                remat_pol=remat_policy(cfg),
                name=f"layers_{i}",
            )(x, not train)
            idx += depth
            if i < len(depths) - 1:
                dim *= 2
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if not self.include_head:
            return x
        x = jnp.mean(x, axis=(1, 2, 3))
        contrastive = cfg.MODEL.MODEL_NAME == "ContrastiveModel"
        if contrastive:
            # CONTRASTIVE.DIM projection MLP (same head family the MViT
            # backbone uses inside ContrastiveModel)
            from advise_tpu.models.layers.heads import TransformerBasicHead

            return TransformerBasicHead(
                num_classes=cfg.CONTRASTIVE.DIM,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
                num_mlp_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
                mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
                bn_mlp=cfg.CONTRASTIVE.BN_MLP,
                bn_sync_axes=(
                    getattr(self.norm, "keywords", {}).get("sync_axes", ())
                    if cfg.CONTRASTIVE.BN_SYNC_MLP
                    else ()
                ),
                dtype=self.dtype,
                name="head",
            )(x, train)
        x = nn.Dense(
            cfg.MODEL.NUM_CLASSES, kernel_init=trunc02, dtype=self.dtype,
            name="head",
        )(x)
        if not train and cfg.MODEL.HEAD_ACT == "softmax":
            x = nn.softmax(x, axis=-1)
        return x
