"""MXU-packed s2d stem convolution (TPU.PALLAS_STEM).

The SlowFast fast-pathway stem — reference `video_model_builder.py`
stem (t,7,7)/s(1,2,2) with 8 output channels, computed here in
space-to-depth form (`layers/stem.py s2d_conv`: [kt,4,4,C=12,F=8]
stride-1 over [B,T,112,112,12]) — is the flagship's worst kernel class:
with F=8 the GEMM view of the conv fills 8/128 MXU columns, capping
throughput at ~12 TFLOP/s, and XLA's chosen lowering measures 23.9 ms
forward (x2 towers) + 44.1 ms weight-grad per step (BASELINE.md r3
trace; ~19% of the whole step).

The fix is a column-packed Toeplitz formulation that feeds the MXU full
128-wide tiles:

  - Pack J=16 consecutive output w-positions x F=8 channels into the
    GEMM's N dimension: N = J*F = 128 (full lane fill).
  - The LHS for one (h-row, w-block) is then just a CONTIGUOUS lane
    window of the input plane laid out as [h, (w_pos, channel)]:
    positions wb*J .. wb*J+KWIN with channels padded C->CP=16 so the
    window stride J*CP = 256 and width KWIN*CP = 384 are 128-aligned
    (no relayout shuffles, just aligned slices).
  - The weight becomes a [KL=384, 128] block-Toeplitz matrix per
    (dt, dy) tap pair: Wt[(p, ci), (j, co)] = w2[dt, dy, p - j, ci, co]
    for 0 <= p - j < 4, zero elsewhere. The zeros inflate the MAC count
    ~4x, but at full-column MXU rate that is still ~3x faster than the
    8-wide formulation's ceiling — and ~10x what XLA achieves.
  - dt taps come in as kt views of the same padded input, shifted via
    BlockSpec index maps (t-block = 1, so block offsets are element
    offsets); dy taps are static sublane slices inside the kernel.

The backward: the weight gradient is the same GEMM transposed
(contract over h instead of K), accumulated across the (b, t) grid
into a [kt, 4, KL, 128] block that an XLA-side diagonal sum collapses
back to [kt,4,4,C,F]; the input gradient goes through the ordinary
XLA transposed conv, which XLA dead-code-eliminates in the stem's
actual position (first layer, device-aug inputs carry no gradient).

Parity: tests/test_pallas_stem.py — fwd + dw/dx vs `s2d_conv`
autodiff, interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = 16          # output w-positions packed into the GEMM N dim
NDY = 4         # s2d spatial taps per axis (layers/stem.py s2d kernel)
NDX = 4


def _geom(shape: Tuple[int, ...], kt: int, f: int):
    b, t, h, w, c = shape
    cp = -(-c // 8) * 8            # J*CP must be 128-aligned -> CP % 8
    assert (J * cp) % 128 == 0, (J, cp)
    kwin = J + 2 * NDX             # window positions per w-block
    kl = kwin * cp                 # lane width of one LHS window
    assert kl % 128 == 0, kl
    assert w % J == 0, f"W={w} must divide the {J}-wide output packing"
    assert f * J == 128, f"F={f}: this packing wants F*J == 128"
    wb = w // J
    return b, t, h, w, c, cp, kwin, kl, wb


def _pack_input(x2: jnp.ndarray, kt: int, cp: int) -> jnp.ndarray:
    """[B,T,H,W,C] -> padded flat-lane planes [B, T+2*(kt//2), H+3, LP].

    Pads: t symmetric kt//2; h (2,1) (the s2d conv's asymmetric cell
    padding); w 2 left + 6 right (2 for the conv pad, 4 so the last
    aligned 384-lane window read stays in bounds — the extra positions
    multiply zero Toeplitz rows); channels C->CP.
    """
    b, t, h, w, c = x2.shape
    xp = jnp.pad(x2, (
        (0, 0), (kt // 2, kt // 2), (2, 1), (2, 6), (0, cp - c),
    ))
    return xp.reshape(b, t + 2 * (kt // 2), h + 3, (w + 8) * cp)


def _toeplitz_weight(w2: jnp.ndarray, cp: int) -> jnp.ndarray:
    """[kt,4,4,C,F] -> [kt,4,KL,J*F] block-Toeplitz columns."""
    kt, ndy, ndx, c, f = w2.shape
    kwin = J + 2 * NDX
    w2p = jnp.pad(w2, ((0, 0),) * 3 + ((0, cp - c), (0, 0)))
    cols = []
    for j in range(J):
        blk = jnp.zeros((kt, ndy, kwin, cp, f), w2p.dtype)
        blk = blk.at[:, :, j:j + ndx].set(w2p)
        cols.append(blk.reshape(kt, ndy, kwin * cp, f))
    # [kt, ndy, KL, J, F] -> column index j*F + co
    return jnp.stack(cols, axis=-2).reshape(kt, ndy, kwin * cp, J * f)


def _fwd_kernel(*refs, kt: int, h: int, kl: int, wb: int, cp: int):
    x_refs = refs[:kt]
    wt_ref = refs[kt]
    out_ref = refs[kt + 1]
    # out lanes ARE the final [W, F] order: lane (wb*J + j)*F + co ==
    # wb*128 + (j*F + co) exactly when J*F == 128 — so each w-block's
    # GEMM result lands at an aligned 128-lane column and the host-side
    # reshape to [B,T,H,W,F] is free (no transpose copy)
    acc = [jnp.zeros((h, 128), jnp.float32) for _ in range(wb)]
    for dt in range(kt):
        plane = x_refs[dt][0, 0]            # [HP, LP]
        for dy in range(NDY):
            rows = plane[dy:dy + h, :]      # static sublane shift
            wt = wt_ref[dt, dy]             # [KL, 128]
            for i in range(wb):
                sub = rows[:, i * J * cp:i * J * cp + kl]
                acc[i] = acc[i] + jax.lax.dot_general(
                    sub, wt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    for i in range(wb):
        out_ref[0, 0, :, i * 128:(i + 1) * 128] = acc[i].astype(
            out_ref.dtype
        )


def _wgrad_kernel(*refs, kt: int, h: int, kl: int, wb: int, cp: int):
    x_refs = refs[:kt]
    g_ref = refs[kt]
    dwt_ref = refs[kt + 1]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dwt_ref[...] = jnp.zeros_like(dwt_ref)

    for dt in range(kt):
        plane = x_refs[dt][0, 0]
        for dy in range(NDY):
            rows = plane[dy:dy + h, :]
            part = jnp.zeros((kl, 128), jnp.float32)
            for i in range(wb):
                sub = rows[:, i * J * cp:i * J * cp + kl]
                part = part + jax.lax.dot_general(
                    sub, g_ref[0, 0, :, i * 128:(i + 1) * 128],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dwt_ref[dt, dy] += part


# With J*F == 128, lane (wb*J + j)*F + co == wb*128 + j*F + co: the
# kernel's [B,T,H,W*F] output IS the row-major [B,T,H,W,F] layout, so
# both directions are free reshapes (no transpose copies in fwd or bwd).


def _fwd(x2: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    kt, f = w2.shape[0], w2.shape[-1]
    b, t, h, w, c, cp, kwin, kl, nwb = _geom(x2.shape, kt, f)
    xp = _pack_input(x2, kt, cp)
    wt = _toeplitz_weight(w2, cp)
    hp, lp = xp.shape[2], xp.shape[3]
    kern = functools.partial(_fwd_kernel, kt=kt, h=h, kl=kl, wb=nwb,
                             cp=cp)
    in_specs = [
        pl.BlockSpec((1, 1, hp, lp),
                     functools.partial(lambda bb, tt, d: (bb, tt + d, 0, 0),
                                       d=dt),
                     memory_space=pltpu.VMEM)
        for dt in range(kt)
    ] + [pl.BlockSpec((kt, NDY, kl, 128), lambda bb, tt: (0, 0, 0, 0),
                      memory_space=pltpu.VMEM)]
    out = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, h, nwb * 128),
                               lambda bb, tt: (bb, tt, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, h, nwb * 128), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * kt * NDY * nwb * h * kl * 128,
            bytes_accessed=xp.nbytes * kt + b * t * h * nwb * 256,
            transcendentals=0,
        ),
    )(*([xp] * kt), wt)
    return out.reshape(b, t, h, w, f)


def _wgrad_raw(x2: jnp.ndarray, g: jnp.ndarray, kt: int,
               f: int) -> jnp.ndarray:
    """Accumulated Toeplitz weight grad [kt,NDY,KL,128] f32 for one
    (sub)batch — the pallas_call without the final diagonal collapse."""
    b, t, h, w, _, cp, kwin, kl, nwb = _geom(x2.shape, kt, f)
    xp = _pack_input(x2, kt, cp)
    hp, lp = xp.shape[2], xp.shape[3]
    gb = g.reshape(g.shape[0], g.shape[1], g.shape[2], w * f)
    kern = functools.partial(_wgrad_kernel, kt=kt, h=h, kl=kl, wb=nwb,
                             cp=cp)
    in_specs = [
        pl.BlockSpec((1, 1, hp, lp),
                     functools.partial(lambda bb, tt, d: (bb, tt + d, 0, 0),
                                       d=dt),
                     memory_space=pltpu.VMEM)
        for dt in range(kt)
    ] + [pl.BlockSpec((1, 1, h, nwb * 128),
                      lambda bb, tt: (bb, tt, 0, 0),
                      memory_space=pltpu.VMEM)]
    dwt = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((kt, NDY, kl, 128),
                               lambda bb, tt: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kt, NDY, kl, 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * kt * NDY * nwb * h * kl * 128,
            bytes_accessed=xp.nbytes * kt + gb.nbytes,
            transcendentals=0,
        ),
    )(*([xp] * kt), gb)
    return dwt


# Batch-chunk cap for the wgrad-only path: the padded flat-lane pack is
# ~15 MB per sample at flagship shape, so an unchunked bs32 backward
# materializes a ~960 MB HBM temp ON TOP of the dense forward's buffers
# — measured OOM on the chip (16.43G vs 15.75G, BASELINE.md r5). 16
# samples ≈ 240 MB bounds the temp while keeping the per-launch grid
# (16, T) deep enough to pipeline the DMAs.
WGRAD_CHUNK = 16


def _wgrad(x2: jnp.ndarray, g: jnp.ndarray, kt: int, f: int,
           c: int, chunk: int = 0) -> jnp.ndarray:
    b = x2.shape[0]
    _, _, _, _, _, cp, kwin, kl, _ = _geom(x2.shape, kt, f)
    cb = b
    if chunk:
        cb = chunk
        while b % cb:          # largest divisor of b that is <= chunk
            cb -= 1
    if cb == b:
        dwt = _wgrad_raw(x2, g, kt, f)
    else:
        nc = b // cb
        x2c = x2.reshape(nc, cb, *x2.shape[1:])
        gc = g.reshape(nc, cb, *g.shape[1:])

        def body(acc, xg):
            xx, gg = xg
            return acc + _wgrad_raw(xx, gg, kt, f), None

        init = jnp.zeros((kt, NDY, kl, 128), jnp.float32)
        dwt, _ = jax.lax.scan(body, init, (x2c, gc))
    # collapse the Toeplitz copies: dw2[dt,dy,dx,ci,co] =
    #   sum_j dwt[dt,dy,(j+dx)*CP+ci, j*F+co]
    dwt = dwt.reshape(kt, NDY, kwin, cp, J, f)
    dw2 = jnp.zeros((kt, NDY, NDX, cp, f), jnp.float32)
    for j in range(J):
        dw2 = dw2 + dwt[:, :, j:j + NDX, :, j, :]
    return dw2[:, :, :, :c, :]


def eligible(shape: Tuple[int, ...], features: int) -> bool:
    """Shapes the packed kernel supports: F*J==128 column packing and a
    W divisible by the J=16 output block (the SlowFast fast stem)."""
    b, t, h, w, c = shape
    return features * J == 128 and w % J == 0 and h >= NDY


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_s2d_stem(x2: jnp.ndarray, w2: jnp.ndarray, kt: int):
    """s2d stem conv == `layers/stem.py s2d_conv(x2, w2, kt)`, computed
    by the column-packed Pallas kernel. x2 [B,T,H,W,C], w2 [kt,4,4,C,F].
    """
    return _fwd(x2, w2)


def _vjp_fwd(x2, w2, kt):
    return _fwd(x2, w2), (x2, w2)


def _vjp_bwd(kt, res, g, chunk=0):
    x2, w2 = res
    f, c = w2.shape[-1], w2.shape[-2]
    dw2 = _wgrad(x2, g.astype(x2.dtype), kt, f, c,
                 chunk=chunk).astype(w2.dtype)
    # input grad through the ordinary conv (DCE'd when unused — the
    # stem is the first layer and device-aug inputs carry no gradient)
    from advise_tpu.models.layers.stem import s2d_conv

    _, vjp_x = jax.vjp(lambda xx: s2d_conv(xx, w2, kt), x2)
    (dx2,) = vjp_x(g)
    return dx2, dw2


pallas_s2d_stem.defvjp(_vjp_fwd, _vjp_bwd)


def _largest_divisor(b: int, chunk: int) -> int:
    cb = min(chunk, b)
    while b % cb:
        cb -= 1
    return cb


def _fwd_chunked(x2: jnp.ndarray, w2: jnp.ndarray, chunk: int):
    b = x2.shape[0]
    cb = _largest_divisor(b, chunk)
    if cb == b:
        return _fwd(x2, w2)
    x2c = x2.reshape(b // cb, cb, *x2.shape[1:])

    def body(carry, xx):
        return carry, _fwd(xx, w2)

    _, out = jax.lax.scan(body, None, x2c)
    return out.reshape(b, *out.shape[2:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_s2d_stem_chunked(x2: jnp.ndarray, w2: jnp.ndarray, kt: int,
                            chunk: int):
    """The full-Pallas s2d stem with the PACK BATCH-CHUNKED in BOTH
    directions (TPU.PALLAS_STEM_CHUNK = chunk samples per launch).

    Why this variant exists (BASELINE.md r5): at bs32 the full-Pallas
    path regresses the flagship step 692.1 -> 755.8 ms even though
    chipless AOT says both programs fit (15.07 vs 14.76G) — the ~960 MB
    padded flat-lane pack materialized in the forward costs XLA its
    scheduling overlap, not its memory budget. A lax.scan over
    chunk-sample slices bounds the live pack to chunk/B of that (~240 MB
    at chunk=16) while keeping each launch's (chunk, T) grid deep enough
    to pipeline the DMAs; the backward reuses the same chunking for its
    repack (exact up to f32 partial-sum add order, same as the measured
    wgrad-only chunking).
    """
    return _fwd_chunked(x2, w2, chunk)


def _vjp_fwd_chunked(x2, w2, kt, chunk):
    return _fwd_chunked(x2, w2, chunk), (x2, w2)


def _vjp_bwd_chunked(kt, chunk, res, g):
    return _vjp_bwd(kt, res, g, chunk=chunk)


pallas_s2d_stem_chunked.defvjp(_vjp_fwd_chunked, _vjp_bwd_chunked)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_s2d_stem_wgrad_only(x2: jnp.ndarray, w2: jnp.ndarray, kt: int):
    """s2d stem conv with XLA's dense FORWARD and the Pallas column-packed
    WEIGHT GRADIENT (TPU.PALLAS_STEM_WGRAD_ONLY).

    Why this split exists (BASELINE.md r5): the full-Pallas path builds
    its padded flat-lane input buffer (~1G at bs32) in the forward, where
    the step's residency peak lives — chipless AOT says both paths fit
    (15.07 vs 14.76G) yet the step regresses 692.1 -> 755.8 ms, i.e. XLA
    loses overlap rescheduling around the buffer. Here the forward is the
    untouched XLA conv; the pack + transposed-GEMM kernel run only inside
    the stem's backward, at the tail of the step where activations are
    already retired. The weight-grad win (XLA lowers it as 44.1 ms of VPU
    reductions; the kernel measures ~10 ms) is the larger share of the
    kernel's 73.0 -> 26.0 ms standalone delta anyway.

    The backward pack is BATCH-CHUNKED (lax.scan over WGRAD_CHUNK-sample
    chunks, f32 partial-sum accumulation — exact up to f32 add order):
    an unchunked bs32 backward materializes the ~960 MB pack on top of
    the dense forward's buffers and OOMs the chip outright (16.43G vs
    15.75G measured, BASELINE.md r5).
    """
    from advise_tpu.models.layers.stem import s2d_conv

    return s2d_conv(x2, w2, kt)


def _vjp_fwd_dense(x2, w2, kt):
    from advise_tpu.models.layers.stem import s2d_conv

    return s2d_conv(x2, w2, kt), (x2, w2)


# the backward is the full-Pallas backward — Pallas wgrad kernel + XLA
# transposed-conv input grad (DCE'd in the stem's real position) — but
# BATCH-CHUNKED: unlike the full path, whose pack buffer already exists
# in the forward, here it would be NEW backward-only memory on top of
# the dense forward's residency peak (the measured bs32 OOM above)
pallas_s2d_stem_wgrad_only.defvjp(
    _vjp_fwd_dense,
    functools.partial(_vjp_bwd, chunk=WGRAD_CHUNK),
)
