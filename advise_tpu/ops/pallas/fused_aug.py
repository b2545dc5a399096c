"""Pallas TPU kernel: fused crop + color-jitter + normalize.

The hot half of the 'simple' training augmentation (reference
``datasets/augmentation.py`` Resize->RandomCrop->ColorJitter->Normalize;
the fixed Resize happens at ingest). One kernel invocation processes one
frame tile:

  HBM uint8 frame --DMA--> VMEM -> (crop offset via scalar prefetch)
     -> brightness/contrast/saturation (PIL ImageEnhance semantics)
     -> mean/std normalize -> VMEM float32 out

Compared to the XLA lowering of the same chain, the kernel reads ONLY the
cropped window from HBM (grid + scalar-prefetched offsets drive the DMA)
and keeps the whole op chain in one VMEM residency — no intermediate HBM
round-trips.

Per-clip parameters (crop offsets, color factors, luma means) are computed
cheaply in JAX and fed as scalar-prefetch operands.

STATUS: correct and tested in interpret mode and on CPU
(tests/test_pallas_aug.py). On this environment's TPU tunnel the Mosaic
remote-compile helper crashes on ANY kernel using runtime-offset slices
or manual DMA (bisected: plain VMEM-block kernels and lax.switch compile
fine; `pl.ds(traced, n)` indexing and `make_async_copy` both return
HTTP 500 from the compile helper) — an infrastructure limitation, not a
kernel bug, so TPU.PALLAS_AUG defaults to False and the XLA lowering
(which fuses well; see BASELINE.md) remains the default path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LUMA = (0.299, 0.587, 0.114)


def _round_u8(x):
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def _aug_kernel(
    # scalar prefetch
    tops_ref, lefts_ref, bfac_ref, cfac_ref, sfac_ref, apply_ref, order_ref,
    cmean_ref,
    # tensor in/out
    frame_ref,  # [H_in, W_in, 3] uint8, full frame in ANY/HBM
    out_ref,  # [S, S, 3] float32 (VMEM block)
    *,
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
):
    n = pl.program_id(0)  # clip index
    t = pl.program_id(1)  # frame index
    top = tops_ref[n]
    left = lefts_ref[n]

    def body(scratch, sem):
        # DMA only the cropped window of THIS (clip, frame) from HBM.
        # frame_ref is the full [N, T, H, W, 3] buffer (ANY memory space
        # passes the unblocked ref; we do the indexing in the DMA).
        dma = pltpu.make_async_copy(
            frame_ref.at[n, t, pl.ds(top, size), pl.ds(left, size), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        # Mosaic has no direct u8->f32 cast; go through i32
        x = scratch[...].astype(jnp.int32).astype(jnp.float32)  # [S, S, 3]

        bf = bfac_ref[n]
        cf = cfac_ref[n]
        sf = sfac_ref[n]
        cmean = cmean_ref[n, t]
        luma = (
            LUMA[0] * x[:, :, 0] + LUMA[1] * x[:, :, 1] + LUMA[2] * x[:, :, 2]
        )
        luma = jnp.floor(luma)[:, :, None]

        def do_bri(v):
            return _round_u8(v * bf)

        def do_con(v):
            return _round_u8(cmean + cf * (v - cmean))

        def do_sat(v):
            return _round_u8(luma + sf * (v - luma))

        def do_hue(v):
            return v  # reference hue jitter is a uint8-truncation no-op

        # apply in the sampled order (4 switches over static branches)
        y = x
        for i in range(4):
            y = jax.lax.switch(
                order_ref[n, i], [do_bri, do_con, do_sat, do_hue], y
            )
        y = jnp.where(apply_ref[n] > 0, y, x)
        # per-channel normalize with python-constant folding (no captured
        # jnp constants inside the kernel)
        chans = [
            (y[:, :, i] - mean[i] * 255.0) / (std[i] * 255.0)
            for i in range(3)
        ]
        out_ref[...] = jnp.stack(chans, axis=-1)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((size, size, 3), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA,
    )


def fused_simple_aug(
    clips_u8: jnp.ndarray,  # [N, T, H, W, 3] uint8 (N = B*K clips)
    rng: jax.Array,
    size: int,
    color=(0.8, 0.4, 0.4, 0.4, 0.2),
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """Pallas-fused 'simple' aug. Parameters are drawn per clip exactly like
    the reference's per-clip fixed seed; the contrast luma-mean is computed
    per frame in JAX (a cheap reduction XLA fuses into the uint8 load) and
    prefetched."""
    n, t, h, w, c = clips_u8.shape
    assert c == 3
    p, b, cj, s_, _hue = color
    keys = jax.random.split(rng, 6)
    tops = jax.random.randint(keys[0], (n,), 0, max(h - size, 1), jnp.int32)
    lefts = jax.random.randint(keys[1], (n,), 0, max(w - size, 1), jnp.int32)
    bfac = jax.random.uniform(keys[2], (n,), jnp.float32, max(0.0, 1 - b), 1 + b)
    cfac = jax.random.uniform(keys[3], (n,), jnp.float32, max(0.0, 1 - cj), 1 + cj)
    sfac = jax.random.uniform(keys[4], (n,), jnp.float32, max(0.0, 1 - s_), 1 + s_)
    apply = (
        jax.random.uniform(jax.random.fold_in(keys[5], 1), (n,)) < p
    ).astype(jnp.int32)
    order = jax.vmap(
        lambda k: jax.random.permutation(k, 4)
    )(jax.random.split(jax.random.fold_in(keys[5], 2), n)).astype(jnp.int32)

    # per-frame contrast means over the CROPPED window (PIL computes the
    # L-mean of the image being enhanced = the cropped frame)
    def crop_mean(clip, top, left):
        win = jax.lax.dynamic_slice(
            clip, (0, top, left, 0), (t, size, size, 3)
        ).astype(jnp.float32)
        luma = jnp.floor(
            LUMA[0] * win[..., 0] + LUMA[1] * win[..., 1] + LUMA[2] * win[..., 2]
        )
        return jnp.floor(jnp.mean(luma, axis=(1, 2)) + 0.5)

    cmeans = jax.vmap(crop_mean)(clips_u8, tops, lefts)  # [N, T]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, size, size, 3),
            lambda i, j, *_: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(tops_r, lefts_r, bf_r, cf_r, sf_r, ap_r, od_r, cm_r, in_r, out_r):
        _aug_kernel(
            tops_r, lefts_r, bf_r, cf_r, sf_r, ap_r, od_r, cm_r,
            in_r, out_r.at[0, 0],
            size=size, mean=tuple(mean), std=tuple(std),
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, size, size, 3), jnp.float32),
    )(tops, lefts, bfac, cfac, sfac, apply, order, cmeans, clips_u8)
