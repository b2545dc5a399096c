"""Pallas TPU kernel: fused crop + color-jitter + normalize.

The hot half of the 'simple' training augmentation (reference
``datasets/augmentation.py`` Resize->RandomCrop->ColorJitter->Normalize;
the fixed Resize happens at ingest). One kernel invocation processes one
frame:

  HBM uint8 rows --DMA--> VMEM -> (crop via aligned DMA + residual rolls)
     -> brightness/contrast/saturation (PIL ImageEnhance semantics)
     -> mean/std normalize -> VMEM float32 out

Compared to the XLA lowering of the same chain, the kernel reads only the
cropped row band from HBM and keeps the whole op chain in one VMEM
residency — no intermediate HBM round-trips.

MOSAIC LAYOUT RULES (probed chipless via scripts/probe_mosaic_aot.py;
the 2026-08 toolchain finally emits real diagnostics instead of the old
opaque HTTP 500):
  - dynamic DMA offsets on untiled leading dims: allowed;
  - dynamic offsets on the sublane dim: only with a
    ``pl.multiple_of(., 8)`` divisibility proof;
  - the minor (lane) dim of a dynamically-offset DMA must be 128-aligned
    — which forbids the natural ``[H, W, 3]`` channel-last slice
    (minor dim 3);
  - ``pltpu.roll`` accepts DYNAMIC shifts on both sublanes and lanes;
  - in-kernel ``lax.dynamic_slice`` is not lowered.

So the kernel views each frame as flat rows ``[H, W*3]`` (a free bitcast
reshape; lanes = interleaved RGB, padded to a 128 multiple), DMAs the
8-aligned row band ``[align8(top), align8(top)+S+8)``, fixes the
``top % 8`` and ``3*left`` residuals with two dynamic rolls, and does the
per-channel math with 3-periodic lane masks (luma triplet-sum via two
static rolls, broadcast back via two more).

Per-clip parameters (crop offsets, color factors, luma means) are
computed cheaply in JAX and fed as scalar-prefetch operands, drawn from
the same streams as v1 so crop semantics are unchanged.
"""

from __future__ import annotations

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
    rows_ref,  # [N, T, H+8, W3p] uint8, flat padded rows in ANY/HBM
    out_ref,  # [1, 1, S, 3S] float32 (VMEM block)
    *,
    size: int,
    mean: Tuple[float, float, float],
    std: Tuple[float, float, float],
):
    n = pl.program_id(0)  # clip index
    t = pl.program_id(1)  # frame index
    top = tops_ref[n]
    left = lefts_ref[n]
    top_a = pl.multiple_of((top // 8) * 8, 8)  # sublane-aligned band start

    def body(scratch, sem):
        # DMA only the aligned row band of THIS (clip, frame) from HBM.
        dma = pltpu.make_async_copy(
            rows_ref.at[n, t, pl.ds(top_a, size + 8), :], scratch, sem
        )
        dma.start()
        dma.wait()
        # Mosaic has no direct u8->f32 cast; go through i32
        v = scratch[...].astype(jnp.int32).astype(jnp.float32)
        # pltpu.roll wants non-negative shifts; -k == +(D - k) % D
        hb, w3p = size + 8, v.shape[1]
        v = pltpu.roll(v, (hb - (top - top_a)) % hb, 0)  # residual rows
        v = pltpu.roll(v, (w3p - 3 * left) % w3p, 1)  # crop cols (lanes)
        x = v[:size, : 3 * size]  # [S, 3S] interleaved RGB

        # 3-periodic lane machinery (channel c of pixel j sits at lane
        # 3j + c)
        cmod = jax.lax.broadcasted_iota(
            jnp.int32, (size, 3 * size), 1
        ) % 3

        def tri(vals):
            return jnp.where(
                cmod == 0,
                jnp.float32(vals[0]),
                jnp.where(
                    cmod == 1, jnp.float32(vals[1]), jnp.float32(vals[2])
                ),
            )

        # luma per pixel, broadcast back to its 3 lanes: weighted sum of
        # the triplet via two backward rolls (the masked lanes that wrap
        # around contribute zeros), then two forward rolls to broadcast
        w3s = 3 * size
        lw = x * tri(LUMA)
        s3 = lw + pltpu.roll(lw, w3s - 1, 1) + pltpu.roll(lw, w3s - 2, 1)
        t0 = jnp.where(cmod == 0, s3, 0.0)
        luma = jnp.floor(t0 + pltpu.roll(t0, 1, 1) + pltpu.roll(t0, 2, 1))

        bf = bfac_ref[n]
        cf = cfac_ref[n]
        sf = sfac_ref[n]
        cmean = cmean_ref[n, t]

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
        out_ref[0, 0] = (
            (y - tri(mean) * 255.0) / (tri(std) * 255.0)
        ).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((size + 8, rows_ref.shape[-1]), jnp.uint8),
        sem=pltpu.SemaphoreType.DMA,
    )


def fused_simple_aug(
    clips_u8: jnp.ndarray,  # [N, T, H, W, 3] uint8 (N = B*K clips)
    rng: jax.Array,
    size: int,
    color=(0.8, 0.4, 0.4, 0.4, 0.2),
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Pallas-fused 'simple' aug. Parameters are drawn per clip exactly like
    the reference's per-clip fixed seed; the contrast luma-mean is computed
    per frame in JAX (a cheap reduction XLA fuses into the uint8 load) and
    prefetched. ``out_dtype`` mirrors TPU.AUG_COMPUTE_OUT: emitting bf16
    halves the kernel's HBM write traffic (math stays f32 in VMEM)."""
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

    # flat padded rows: [N, T, H+8, W3p]. The H pad absorbs the aligned
    # band overrun (top_a + S + 8 <= H + 7); the lane pad brings the
    # minor dim to the 128 multiple Mosaic's DMA requires.
    w3 = 3 * w
    w3p = max(128, -(-w3 // 128) * 128)
    rows = jnp.pad(
        clips_u8.reshape(n, t, h, w3),
        ((0, 0), (0, 0), (0, 8), (0, w3p - w3)),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n, t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, size, 3 * size),
            lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    def kernel(tops_r, lefts_r, bf_r, cf_r, sf_r, ap_r, od_r, cm_r, in_r,
               out_r):
        _aug_kernel(
            tops_r, lefts_r, bf_r, cf_r, sf_r, ap_r, od_r, cm_r,
            in_r, out_r,
            size=size, mean=tuple(mean), std=tuple(std),
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, size, 3 * size), out_dtype),
    )(tops, lefts, bfac, cfac, sfac, apply, order, cmeans, rows)
    return out.reshape(n, t, size, size, 3)
