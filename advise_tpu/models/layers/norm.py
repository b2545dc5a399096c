"""Batch normalization with cross-replica synchronization.

From-scratch implementation (not flax.linen.BatchNorm) so the reference's
exact NaiveSyncBatchNorm semantics are reproducible (reference
``models/batchnorm_helper.py:16-112``; SURVEY.md §7 hard part #3):

- **subgrouped sync**: training statistics are psum'd over the mesh axes in
  ``sync_axes`` (the ``sync`` axis holds BN.NUM_SYNC_DEVICES devices;
  BN.GLOBAL_SYNC syncs over the whole mesh) — never over more,
- **running stats** are updated from the *synced* batch stats with torch
  momentum convention (``new = (1-m)*old + m*batch``, unbiased variance in
  the running buffer, biased for normalization),
- **SubBatchNorm** (multigrid training, reference ``:44-112``): during
  training stats are computed over ``num_splits`` independent slices of the
  batch; running stats aggregate across splits.

Works inside ``shard_map`` (axis names resolve) and outside (sync_axes=()).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from advise_tpu.parallel.mesh import bn_axis_names


class SyncBatchNorm(nn.Module):
    """BatchNorm over all axes but the last (channel), with optional
    cross-replica stat sync and sub-batch splitting."""

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    sync_axes: Tuple[str, ...] = ()
    num_splits: int = 1
    use_scale: bool = True
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    zero_init_scale: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = (
            self.param(
                "scale",
                nn.initializers.zeros if self.zero_init_scale else nn.initializers.ones,
                (features,),
                jnp.float32,
            )
            if self.use_scale
            else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            if self.use_bias
            else None
        )

        def affine_fold(xv, mean, var):
            """Normalize + affine as ONE per-channel FMA: y = x*w + b with
            w = scale*rsqrt(var+eps), b = bias - mean*w — half the
            per-element VPU ops of the naive ((x-mean)*inv)*scale+bias
            chain; the [C]-sized weight precompute is free.

            The FMA runs in the INPUT dtype: only the [C]-sized w/b round
            to x.dtype, the statistics math above stays float32. The
            previous full-activation f32 upcast was the dominant HBM
            resident of the bs64 flagship step (4x 1.53G
            `branch1_bn/convert_element_type` temps in the OOM dump,
            BASELINE round 4) — for float32 inputs this is bit-identical
            to the old path."""
            w = lax.rsqrt(var + self.epsilon)
            if scale is not None:
                w = w * scale
            b_eff = -mean * w
            if bias is not None:
                b_eff = b_eff + bias
            return xv * w.astype(xv.dtype) + b_eff.astype(xv.dtype)

        def f32_stats(xv, red):
            """mean / mean-of-squares reduced in float32. The converts
            feed only reductions, so XLA fuses them — no full-size f32
            tensor materializes."""
            xf = xv.astype(jnp.float32)
            return jnp.mean(xf, axis=red), jnp.mean(lax.square(xf), axis=red)

        if train:
            if self.num_splits > 1:
                b = x.shape[0]
                assert b % self.num_splits == 0, (b, self.num_splits)
                xs = x.reshape(self.num_splits, b // self.num_splits, *x.shape[1:])
                red = tuple(range(1, xs.ndim - 1))
                mean_s, meansq_s = f32_stats(xs, red)  # [splits, C]
                if self.sync_axes:
                    mean_s = lax.pmean(mean_s, self.sync_axes)
                    meansq_s = lax.pmean(meansq_s, self.sync_axes)
                var_s = meansq_s - jnp.square(mean_s)
                # normalize each split with its own stats
                flat = xs.reshape(self.num_splits, -1, features)
                y = affine_fold(
                    flat, mean_s[:, None], var_s[:, None]
                ).reshape(x.shape)
                mean, var = jnp.mean(mean_s, 0), jnp.mean(var_s, 0)
                n = xs[0].size / features * (
                    _axes_size(self.sync_axes) if self.sync_axes else 1
                )
            else:
                red = tuple(range(x.ndim - 1))
                mean, meansq = f32_stats(x, red)
                if self.sync_axes:
                    mean = lax.pmean(mean, self.sync_axes)
                    meansq = lax.pmean(meansq, self.sync_axes)
                var = meansq - jnp.square(mean)
                y = affine_fold(x, mean, var)
                n = x.size / features * (
                    _axes_size(self.sync_axes) if self.sync_axes else 1
                )
            if not self.is_initializing():
                m = self.momentum
                # torch stores the unbiased variance in the running buffer
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            y = affine_fold(x, ra_mean.value, ra_var.value)
        return y.astype(self.dtype or x.dtype)


def _axes_size(axes: Sequence[str]) -> int:
    n = 1
    for a in axes:
        n *= lax.axis_size(a)
    return n


def get_norm(cfg, sync_axes: Tuple[str, ...]):
    """Norm factory (reference models/batchnorm_helper.py:16-37 get_norm).

    ``sync_axes`` is () when running outside shard_map (single device,
    plain-jit eval), else the axes from ``bn_axis_names(cfg)``.
    """
    import functools

    if cfg.BN.NORM_TYPE == "batchnorm":
        return functools.partial(SyncBatchNorm, sync_axes=())
    if cfg.BN.NORM_TYPE == "sub_batchnorm":
        return functools.partial(
            SyncBatchNorm, sync_axes=(), num_splits=cfg.BN.NUM_SPLITS
        )
    if cfg.BN.NORM_TYPE == "sync_batchnorm":
        return functools.partial(SyncBatchNorm, sync_axes=sync_axes)
    raise NotImplementedError(f"BN.NORM_TYPE={cfg.BN.NORM_TYPE}")
