"""CLIP weight porter: synthetic open_clip-format checkpoint -> CLIPViT,
with forward equivalence against a torch reimplementation of the tower."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from advise_tpu.models.clip_vit import CLIPViT, load_openclip_weights

WIDTH, LAYERS, HEADS, PATCH, IMG, OUT = 32, 2, 4, 8, 16, 24


def _make_torch_visual_sd(rng):
    """Random weights in open_clip's visual.* state-dict layout."""
    def t(*shape):
        return torch.tensor(rng.normal(0, 0.05, size=shape).astype(np.float32))

    sd = {
        "visual.class_embedding": t(WIDTH),
        "visual.positional_embedding": t((IMG // PATCH) ** 2 + 1, WIDTH),
        "visual.proj": t(WIDTH, OUT),
        "visual.conv1.weight": t(WIDTH, 3, PATCH, PATCH),
        "visual.ln_pre.weight": t(WIDTH) + 1.0,
        "visual.ln_pre.bias": t(WIDTH),
        "visual.ln_post.weight": t(WIDTH) + 1.0,
        "visual.ln_post.bias": t(WIDTH),
    }
    for i in range(LAYERS):
        p = f"visual.transformer.resblocks.{i}."
        sd[p + "ln_1.weight"] = t(WIDTH) + 1.0
        sd[p + "ln_1.bias"] = t(WIDTH)
        sd[p + "ln_2.weight"] = t(WIDTH) + 1.0
        sd[p + "ln_2.bias"] = t(WIDTH)
        sd[p + "attn.in_proj_weight"] = t(3 * WIDTH, WIDTH)
        sd[p + "attn.in_proj_bias"] = t(3 * WIDTH)
        sd[p + "attn.out_proj.weight"] = t(WIDTH, WIDTH)
        sd[p + "attn.out_proj.bias"] = t(WIDTH)
        sd[p + "mlp.c_fc.weight"] = t(4 * WIDTH, WIDTH)
        sd[p + "mlp.c_fc.bias"] = t(4 * WIDTH)
        sd[p + "mlp.c_proj.weight"] = t(WIDTH, 4 * WIDTH)
        sd[p + "mlp.c_proj.bias"] = t(WIDTH)
    return sd


def _torch_forward(sd, x_np):
    """Reference forward of the CLIP visual tower in torch (open_clip
    semantics: conv patchify, cls+pos, pre-LN blocks, ln_post, proj)."""
    x = torch.tensor(x_np).permute(0, 3, 1, 2)  # NCHW
    w = {k[len("visual."):]: v for k, v in sd.items()}
    x = torch.conv2d(x, w["conv1.weight"], stride=PATCH)
    b = x.shape[0]
    x = x.reshape(b, WIDTH, -1).permute(0, 2, 1)
    cls = w["class_embedding"][None, None].expand(b, 1, WIDTH)
    x = torch.cat([cls, x], dim=1) + w["positional_embedding"][None]
    x = tnn.functional.layer_norm(x, (WIDTH,), w["ln_pre.weight"], w["ln_pre.bias"])
    for i in range(LAYERS):
        p = f"transformer.resblocks.{i}."
        y = tnn.functional.layer_norm(
            x, (WIDTH,), w[p + "ln_1.weight"], w[p + "ln_1.bias"]
        )
        y, _ = tnn.functional.multi_head_attention_forward(
            y.transpose(0, 1), y.transpose(0, 1), y.transpose(0, 1),
            WIDTH, HEADS,
            w[p + "attn.in_proj_weight"], w[p + "attn.in_proj_bias"],
            None, None, False, 0.0,
            w[p + "attn.out_proj.weight"], w[p + "attn.out_proj.bias"],
            need_weights=False,
        )
        x = x + y.transpose(0, 1)
        y = tnn.functional.layer_norm(
            x, (WIDTH,), w[p + "ln_2.weight"], w[p + "ln_2.bias"]
        )
        y = tnn.functional.linear(y, w[p + "mlp.c_fc.weight"], w[p + "mlp.c_fc.bias"])
        y = tnn.functional.gelu(y)
        y = tnn.functional.linear(
            y, w[p + "mlp.c_proj.weight"], w[p + "mlp.c_proj.bias"]
        )
        x = x + y
    x = tnn.functional.layer_norm(
        x, (WIDTH,), w["ln_post.weight"], w["ln_post.bias"]
    )
    pooled = x[:, 0] @ w["proj"]
    return pooled.numpy(), x[:, 1:].numpy()


def test_port_and_forward_equivalence(tmp_path):
    rng = np.random.default_rng(0)
    sd = _make_torch_visual_sd(rng)
    ckpt = tmp_path / "open_clip_pytorch_model.bin"
    torch.save(sd, str(ckpt))

    model = CLIPViT(
        width=WIDTH, layers=LAYERS, heads=HEADS, patch_size=PATCH,
        image_size=IMG, output_dim=OUT,
    )
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = load_openclip_weights(str(ckpt), params)
    pooled, tokens = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        ref_pooled, ref_tokens = _torch_forward(sd, x)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens, atol=2e-4)
