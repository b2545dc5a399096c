"""Benchmark alternative TPU formulations of the two RandAugment hot
primitives found by microbench_aug.py:

  1. 256-bin histogram per (frame, channel) row  (equalize: bincount = 92 ms)
  2. bilinear warp gather                        (rotate/shear: ~4 ms)
  3. 256-entry LUT application per row
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / iters


def main():
    t, h, w, c = 32, 224, 224, 3
    rng = np.random.default_rng(0)
    clip = jnp.asarray(rng.integers(0, 256, (t, h, w, c)).astype(np.float32))
    flat_i32 = jnp.asarray(
        rng.integers(0, 256, (t * c, h * w), dtype=np.int32)
    )
    print(f"backend={jax.devices()[0].platform} rows={t*c} px/row={h*w}")

    # --- histograms ---------------------------------------------------------
    def hist_bincount(x):
        return jax.vmap(lambda r: jnp.bincount(r, length=256))(x)

    def hist_onehot_sum(x):
        # fused compare+reduce (no materialized one-hot if XLA fuses)
        iota = jnp.arange(256, dtype=jnp.int32)
        return jnp.sum(
            (x[:, :, None] == iota[None, None, :]).astype(jnp.bfloat16), axis=1
        ).astype(jnp.float32)

    def hist_sort_searchsorted(x):
        s = jnp.sort(x, axis=1)
        bounds = jnp.arange(256, dtype=jnp.int32)
        cum = jax.vmap(
            lambda row: jnp.searchsorted(row, bounds, side="right")
        )(s)  # cum[i] = #elements <= i
        hist = jnp.diff(
            jnp.concatenate([jnp.zeros((x.shape[0], 1), cum.dtype), cum], 1),
            axis=1,
        )
        return hist

    def hist_matmul(x):
        # chunked one-hot matmul on the MXU
        iota = jnp.arange(256, dtype=jnp.int32)
        oh = (x[:, :, None] == iota).astype(jnp.bfloat16)  # [R, P, 256]
        ones = jnp.ones((x.shape[1],), jnp.bfloat16)
        return jnp.einsum("p,rpb->rb", ones, oh).astype(jnp.float32)

    for name, fn in [
        ("bincount (current)", hist_bincount),
        ("onehot+sum fused", hist_onehot_sum),
        ("sort+searchsorted", hist_sort_searchsorted),
        ("onehot matmul", hist_matmul),
    ]:
        try:
            dt = timeit(jax.jit(fn), flat_i32)
            print(f"  hist {name:22s} {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  hist {name:22s} FAILED {type(e).__name__}")

    # --- LUT application ----------------------------------------------------
    lut = jnp.asarray(rng.integers(0, 256, (t * c, 256)).astype(np.float32))

    def lut_take_along(x, l):
        return jnp.take_along_axis(l, x, axis=1)

    def lut_gather_flat(x, l):
        # single shared LUT per row via flattened index into [R*256]
        offs = (jnp.arange(x.shape[0], dtype=jnp.int32) * 256)[:, None]
        return jnp.take(l.reshape(-1), x + offs)

    def lut_matmul(x, l):
        iota = jnp.arange(256, dtype=jnp.int32)
        oh = (x[:, :, None] == iota).astype(jnp.bfloat16)
        return jnp.einsum("rpb,rb->rp", oh, l.astype(jnp.bfloat16))

    for name, fn in [
        ("take_along_axis", lut_take_along),
        ("flat take", lut_gather_flat),
        ("onehot matmul", lut_matmul),
    ]:
        try:
            dt = timeit(jax.jit(fn), flat_i32, lut)
            print(f"  lut  {name:22s} {dt*1e3:8.2f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"  lut  {name:22s} FAILED {type(e).__name__}")

    # --- warp gather --------------------------------------------------------
    from advise_tpu.data.rand_augment import rotate

    def warp_current(x):
        return rotate(x, jnp.float32(21.0))

    def warp_flat_take(x):
        # [T,H,W,C] -> [H*W, T*C]; 4 corners as one take of row-contiguous
        # slices; bilinear combine; back to [T,H,W,C]
        tt, hh, ww, cc = x.shape
        xf = x.transpose(1, 2, 0, 3).reshape(hh * ww, tt * cc)
        theta = -21.0 * jnp.pi / 180.0
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        cx, cy = (ww - 1) / 2.0, (hh - 1) / 2.0
        ys = jnp.arange(hh, dtype=jnp.float32)
        xs = jnp.arange(ww, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys)
        sx = cos * (gx - cx) - sin * (gy - cy) + cx
        sy = sin * (gx - cx) + cos * (gy - cy) + cy
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = (sx - x0).reshape(-1)[:, None]
        wy = (sy - y0).reshape(-1)[:, None]
        valid = (
            (sx >= -0.5) & (sx <= ww - 0.5) & (sy >= -0.5) & (sy <= hh - 0.5)
        ).reshape(-1)[:, None]
        xi = jnp.clip(x0, 0, ww - 1).astype(jnp.int32)
        yi = jnp.clip(y0, 0, hh - 1).astype(jnp.int32)
        xi1 = jnp.clip(x0 + 1, 0, ww - 1).astype(jnp.int32)
        yi1 = jnp.clip(y0 + 1, 0, hh - 1).astype(jnp.int32)
        lin00 = (yi * ww + xi).reshape(-1)
        lin01 = (yi * ww + xi1).reshape(-1)
        lin10 = (yi1 * ww + xi).reshape(-1)
        lin11 = (yi1 * ww + xi1).reshape(-1)
        g00 = jnp.take(xf, lin00, axis=0)
        g01 = jnp.take(xf, lin01, axis=0)
        g10 = jnp.take(xf, lin10, axis=0)
        g11 = jnp.take(xf, lin11, axis=0)
        out = (
            g00 * (1 - wx) * (1 - wy)
            + g01 * wx * (1 - wy)
            + g10 * (1 - wx) * wy
            + g11 * wx * wy
        )
        out = jnp.where(valid, out, 128.0)
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
        return out.reshape(hh, ww, tt, cc).transpose(2, 0, 1, 3)

    def warp_one_take(x):
        # all 4 corners in ONE take call (stacked indices)
        tt, hh, ww, cc = x.shape
        xf = x.transpose(1, 2, 0, 3).reshape(hh * ww, tt * cc)
        theta = -21.0 * jnp.pi / 180.0
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        cx, cy = (ww - 1) / 2.0, (hh - 1) / 2.0
        ys = jnp.arange(hh, dtype=jnp.float32)
        xs = jnp.arange(ww, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys)
        sx = cos * (gx - cx) - sin * (gy - cy) + cx
        sy = sin * (gx - cx) + cos * (gy - cy) + cy
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = (sx - x0).reshape(-1)[:, None]
        wy = (sy - y0).reshape(-1)[:, None]
        valid = (
            (sx >= -0.5) & (sx <= ww - 0.5) & (sy >= -0.5) & (sy <= hh - 0.5)
        ).reshape(-1)[:, None]
        xi = jnp.clip(x0, 0, ww - 1).astype(jnp.int32)
        yi = jnp.clip(y0, 0, hh - 1).astype(jnp.int32)
        xi1 = jnp.clip(x0 + 1, 0, ww - 1).astype(jnp.int32)
        yi1 = jnp.clip(y0 + 1, 0, hh - 1).astype(jnp.int32)
        lins = jnp.stack([
            (yi * ww + xi).reshape(-1),
            (yi * ww + xi1).reshape(-1),
            (yi1 * ww + xi).reshape(-1),
            (yi1 * ww + xi1).reshape(-1),
        ])  # [4, HW]
        g = jnp.take(xf, lins.reshape(-1), axis=0).reshape(4, hh * ww, tt * cc)
        out = (
            g[0] * (1 - wx) * (1 - wy)
            + g[1] * wx * (1 - wy)
            + g[2] * (1 - wx) * wy
            + g[3] * wx * wy
        )
        out = jnp.where(valid, out, 128.0)
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
        return out.reshape(hh, ww, tt, cc).transpose(2, 0, 1, 3)

    for name, fn in [
        ("current [T,h,w,C] idx", warp_current),
        ("flat [HW,TC] 4 takes", warp_flat_take),
        ("flat [HW,TC] 1 take", warp_one_take),
    ]:
        dt = timeit(jax.jit(fn), clip)
        print(f"  warp {name:22s} {dt*1e3:8.2f} ms")

    # numeric check: flat take matches current rotate away from borders
    a = np.asarray(jax.jit(warp_current)(clip))
    b = np.asarray(jax.jit(warp_flat_take)(clip))
    interior = np.abs(a - b)
    print(f"  warp flat-vs-current max|diff| = {interior.max():.1f} "
          f"(border fill blending differs by design)")


if __name__ == "__main__":
    main()
