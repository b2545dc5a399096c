"""Non-local block (reference ``models/nonlocal_helper.py:10-148``).

Embedded-gaussian / dot-product self-attention over the (T, H, W) grid with
optional KV pooling and zero-initialized output BN. The theta@phi contraction
is a plain batched matmul — MXU work under XLA.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.common import msra_init
from advise_tpu.models.layers.stem import max_pool_3d


class Nonlocal(nn.Module):
    dim_inner: int
    norm: Callable
    pool_size: Optional[Tuple[int, int, int]] = None
    instantiation: str = "softmax"
    group_size: int = 1  # temporal fold groups (reference nonlocal_group)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        res = x
        if self.group_size > 1:
            # fold temporal groups into batch (reference ResStage:688-700)
            g = self.group_size
            x = x.reshape(b * g, t // g, h, w, c)
        theta = nn.Conv(
            self.dim_inner, (1, 1, 1), kernel_init=msra_init, dtype=self.dtype,
            name="theta",
        )(x)
        kv = x
        if self.pool_size is not None and any(s > 1 for s in self.pool_size):
            kv = max_pool_3d(
                x, self.pool_size, self.pool_size, "VALID"
            )
        phi = nn.Conv(
            self.dim_inner, (1, 1, 1), kernel_init=msra_init, dtype=self.dtype,
            name="phi",
        )(kv)
        g_feat = nn.Conv(
            self.dim_inner, (1, 1, 1), kernel_init=msra_init, dtype=self.dtype,
            name="g",
        )(kv)
        bb = x.shape[0]
        q = theta.reshape(bb, -1, self.dim_inner)
        k = phi.reshape(bb, -1, self.dim_inner)
        v = g_feat.reshape(bb, -1, self.dim_inner)
        attn = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        if self.instantiation == "softmax":
            attn = nn.softmax(attn * (self.dim_inner**-0.5), axis=-1)
        elif self.instantiation == "dot_product":
            attn = attn / attn.shape[-1]
        else:
            raise NotImplementedError(self.instantiation)
        out = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        out = out.reshape(*x.shape[:-1], self.dim_inner)
        out = nn.Conv(
            c, (1, 1, 1), kernel_init=msra_init, dtype=self.dtype, name="out"
        )(out)
        # zero-init final BN so the block starts as identity (reference :84)
        out = self.norm(name="out_bn", dtype=self.dtype, zero_init_scale=True)(
            out, train
        )
        if self.group_size > 1:
            out = out.reshape(b, t, h, w, c)
        return res + out
