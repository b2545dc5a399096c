"""Chip A/B of the column-packed Pallas stem kernel (TPU.PALLAS_STEM,
ops/pallas/stem_conv.py) against XLA's lowering of the same s2d conv
(layers/stem.py s2d_conv) at the SlowFast flagship fast-stem shape
([32,32,112,112,12] bf16 -> 8 channels; BASELINE.md r3 trace: XLA fwd
23.9 ms, weight-grad 44.1 ms).

Usage: python scripts/microbench_pallas_stem.py [--check]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "JAX_PLATFORMS" in os.environ:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: jnp.sum(a).item(), out
    )  # value-fetch barrier (axon: block_until_ready lies, BASELINE.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: jnp.sum(a).item(), out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="numeric cross-check vs the XLA conv on this "
                    "backend before timing")
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=112)
    args = ap.parse_args()

    from advise_tpu.models.layers.stem import s2d_conv
    from advise_tpu.ops.pallas.stem_conv import pallas_s2d_stem

    kt, c, f = 5, 12, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(
            (args.views, args.frames, args.size, args.size, c)
        ),
        jnp.bfloat16,
    )
    w = jnp.asarray(rng.standard_normal((kt, 4, 4, c, f)) * 0.1,
                    jnp.bfloat16)
    print(f"backend={jax.default_backend()} x={x.shape} bf16")

    # forwards
    f_xla = jax.jit(lambda xx, ww: s2d_conv(xx, ww, kt))
    f_pal = jax.jit(lambda xx, ww: pallas_s2d_stem(xx, ww, kt))

    if args.check:
        a = np.asarray(f_xla(x, w), np.float32)
        b = np.asarray(f_pal(x, w), np.float32)
        err = np.abs(a - b).max()
        scale = np.abs(a).max()
        print(f"fwd max abs err: {err:.4f} (scale {scale:.1f})")
        assert err < 0.1 * scale

    t_xla = timed(f_xla, x, w)
    t_pal = timed(f_pal, x, w)
    print(f"fwd  XLA:    {t_xla * 1e3:8.2f} ms")
    print(f"fwd  Pallas: {t_pal * 1e3:8.2f} ms  ({t_xla / t_pal:.2f}x)")

    # fwd + weight grad (the flagship's actual backward need: the input
    # grad is dead at the stem's position and DCE'd in both paths)
    def wg(conv):
        def run(xx, ww):
            def loss(w_):
                y = conv(xx, w_)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            return jax.value_and_grad(loss)(ww)

        return jax.jit(run)

    g_xla = wg(lambda xx, ww: s2d_conv(xx, ww, kt))
    g_pal = wg(lambda xx, ww: pallas_s2d_stem(xx, ww, kt))
    if args.check:
        _, ga = g_xla(x, w)
        _, gb = g_pal(x, w)
        ga, gb = np.asarray(ga, np.float32), np.asarray(gb, np.float32)
        err = np.abs(ga - gb).max() / max(np.abs(ga).max(), 1e-6)
        print(f"wgrad max rel err: {err:.4f}")
        assert err < 0.05
    t_xla_g = timed(g_xla, x, w)
    t_pal_g = timed(g_pal, x, w)
    print(f"fwd+wgrad  XLA:    {t_xla_g * 1e3:8.2f} ms")
    print(
        f"fwd+wgrad  Pallas: {t_pal_g * 1e3:8.2f} ms  "
        f"({t_xla_g / t_pal_g:.2f}x)"
    )


if __name__ == "__main__":
    main()
