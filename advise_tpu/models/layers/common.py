"""Common blocks: MLP, DropPath, TwoStreamFusion, initializers.

Reference: ``models/common.py:7-154``, ``utils/weight_init_helper.py:10-54``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Caffe2 MSRA fill (reference utils/weight_init_helper.py:20-27): kaiming
# normal with fan_out over the conv kernel.
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def fc_init(std: float):
    """Reference fc init: normal(0, std), zero bias (weight_init_helper:38-48)."""
    return nn.initializers.normal(stddev=std)


class DropPath(nn.Module):
    """Stochastic depth per sample (reference models/common.py:45-62)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Transformer MLP (reference models/common.py:65-100).

    ``fc2_init_div``: divide fc2's initialized weight (MAE
    fix_init_weight depth rescale, MASK.SCALE_INIT_BY_DEPTH)."""

    hidden_features: int
    out_features: int
    act: Callable = nn.gelu
    drop_rate: float = 0.0
    fc2_init_div: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        fc2_init = nn.initializers.lecun_normal()
        if self.fc2_init_div != 1.0:
            base, div = fc2_init, self.fc2_init_div

            def fc2_init(key, shape, dtype=jnp.float32, _b=base, _d=div):
                return _b(key, shape, dtype) / _d

        x = nn.Dense(
            self.out_features, kernel_init=fc2_init, dtype=self.dtype,
            name="fc2",
        )(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class TwoStreamFusion(nn.Module):
    """Fuse two halves of a channel-concatenated stream (reference
    models/common.py:103-154): add/max/min/avg/concat/concat_linear(+ln)."""

    mode: str
    dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a, b = jnp.split(x, 2, axis=-1)
        if self.mode == "add":
            return a + b
        if self.mode == "max":
            return jnp.maximum(a, b)
        if self.mode == "min":
            return jnp.minimum(a, b)
        if self.mode == "avg":
            return (a + b) / 2.0
        if self.mode == "concat":
            return x
        if self.mode in ("concat_linear", "concat_linear_ln"):
            y = nn.Dense(x.shape[-1] // 2, name="proj")(x)
            if self.mode == "concat_linear_ln":
                y = nn.LayerNorm(name="ln")(y)
            return y
        raise NotImplementedError(self.mode)
