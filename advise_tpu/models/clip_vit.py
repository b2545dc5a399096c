"""CLIP vision transformer (open_clip-compatible visual tower).

The AdViSe spatial encoder (reference ``models/temporal_modeling.py:16-43``
loads ``open_clip`` ViT weights and consumes the per-patch token grid).
This is a from-scratch Flax implementation of the same architecture —
pre-LN transformer over conv patch tokens with a class embedding — plus a
weight porter from an ``open_clip_pytorch_model.bin`` state dict so frozen
pretrained towers can be used on TPU.

``__call__`` returns ``(pooled, tokens)`` like open_clip's
``output_tokens=True``: tokens are the ln_post'd patch tokens at encoder
width (the reference asserts SPATIAL_EMBEDDING_DIM == vision width).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.width,
            out_features=self.width,
            dtype=self.dtype,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(self.width * 4, dtype=self.dtype, name="mlp_fc")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(y)
        return x + y


class CLIPViT(nn.Module):
    """open_clip VisionTransformer (e.g. ViT-B/16: width 768, layers 12,
    heads 12, patch 16)."""

    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    image_size: int = 224
    output_dim: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, H, W, 3] -> (pooled [B, output_dim], tokens [B, L, width])."""
        b = x.shape[0]
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = x.reshape(b, -1, self.width)
        grid = self.image_size // self.patch_size
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(self.width**-0.5),
            (self.width,),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width**-0.5),
            (grid * grid + 1, self.width),
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                width=self.width,
                heads=self.heads,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
        proj = self.param(
            "proj",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim),
        )
        pooled = x[:, 0] @ proj.astype(x.dtype)
        return pooled, x[:, 1:]


def load_openclip_weights(path: str, params: dict) -> dict:
    """Port an open_clip torch checkpoint's visual tower into CLIPViT params
    (reference load_spatial_model, temporal_modeling.py:16-43)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    vis = {
        k[len("visual."):]: v.float().numpy()
        for k, v in sd.items()
        if k.startswith("visual.")
    }
    out = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    def put(dst_path, arr):
        node = out
        for k in dst_path[:-1]:
            node = node[k]
        expect = node[dst_path[-1]].shape
        assert tuple(arr.shape) == tuple(expect), (dst_path, arr.shape, expect)
        node[dst_path[-1]] = jnp.asarray(arr)

    put(["class_embedding"], vis["class_embedding"])
    put(["positional_embedding"], vis["positional_embedding"])
    put(["proj"], vis["proj"])
    # conv1: torch OIHW -> flax HWIO
    put(["conv1", "kernel"], vis["conv1.weight"].transpose(2, 3, 1, 0))
    for ln in ("ln_pre", "ln_post"):
        put([ln, "scale"], vis[f"{ln}.weight"])
        put([ln, "bias"], vis[f"{ln}.bias"])
    n_layers = len(
        {k.split(".")[2] for k in vis if k.startswith("transformer.resblocks")}
    )
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}."
        blk = [f"resblocks_{i}"]
        for ln in ("ln_1", "ln_2"):
            put(blk + [ln, "scale"], vis[p + ln + ".weight"])
            put(blk + [ln, "bias"], vis[p + ln + ".bias"])
        w = vis[p + "attn.in_proj_weight"]  # [3*width, width]
        bias = vis[p + "attn.in_proj_bias"]
        width = w.shape[1]
        heads = params["resblocks_0"]["attn"]["query"]["kernel"].shape[1]
        head_dim = width // heads
        for j, name in enumerate(("query", "key", "value")):
            wj = w[j * width : (j + 1) * width].T  # [width_in, width_out]
            bj = bias[j * width : (j + 1) * width]
            put(blk + ["attn", name, "kernel"],
                wj.reshape(width, heads, head_dim))
            put(blk + ["attn", name, "bias"], bj.reshape(heads, head_dim))
        put(blk + ["attn", "out", "kernel"],
            vis[p + "attn.out_proj.weight"].T.reshape(heads, head_dim, width))
        put(blk + ["attn", "out", "bias"], vis[p + "attn.out_proj.bias"])
        put(blk + ["mlp_fc", "kernel"], vis[p + "mlp.c_fc.weight"].T)
        put(blk + ["mlp_fc", "bias"], vis[p + "mlp.c_fc.bias"])
        put(blk + ["mlp_proj", "kernel"], vis[p + "mlp.c_proj.weight"].T)
        put(blk + ["mlp_proj", "bias"], vis[p + "mlp.c_proj.bias"])
    logger.info("ported open_clip visual tower from %s", path)
    return out
