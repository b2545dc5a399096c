"""Fast-pathway stem conv lowering study (round-3 trace: the s2d stem's
weight-grad runs 44 ms/step and each forward 24 ms at <1 TF/s — XLA
lowers the 12->8-channel conv gradient as VPU reductions, not MXU work).

Hypothesis: padding the OUTPUT channel dim (8 -> 32/64/128, zeros sliced
off after) tips the lowering onto the MXU. This measures fwd and
fwd+wgrad for the s2d stem shape at several widths.

Usage: python scripts/microbench_stem.py
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
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0]).item()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # flagship fast-pathway s2d stem shape: [N*K, T, H/2, W/2, 4*3]
    x = jnp.asarray(
        rng.normal(size=(32, 32, 112, 112, 12)).astype(np.float32),
        jnp.bfloat16,
    )
    print(f"backend={jax.devices()[0].platform} x={x.shape}")
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (5, 4, 4, 12, 8), ("NTHWC", "THWIO", "NTHWC")
    )

    # fused online+EMA towers model: ONE conv at c16 (both towers'
    # weights concatenated); the EMA half's cotangent is zero
    # (stop_gradient'ed keys). Compare vs the current cost
    # [c8 fwd+wgrad (online) + c8 fwd (EMA)].
    w16 = jnp.asarray(
        rng.normal(size=(5, 4, 4, 12, 16)).astype(np.float32) * 0.01,
        jnp.bfloat16,
    )
    dn16 = jax.lax.conv_dimension_numbers(
        x.shape, w16.shape, ("NTHWC", "THWIO", "NTHWC")
    )

    def conv16(xx, w):
        return jax.lax.conv_general_dilated(
            xx, w, window_strides=(1, 1, 1),
            padding=((2, 2), (1, 2), (1, 2)), dimension_numbers=dn16,
        )

    def loss16(xx, w):
        y = conv16(xx, w)
        online = jnp.sum(y[..., :8].astype(jnp.float32) ** 2)
        ema = jnp.sum(
            jax.lax.stop_gradient(y[..., 8:]).astype(jnp.float32) ** 2
        )
        return online + ema

    dt_f16 = timeit(jax.jit(conv16), x, w16)
    dt_g16 = timeit(jax.jit(jax.value_and_grad(loss16, argnums=1)), x, w16)
    print(f"fused-towers c16: fwd {dt_f16*1e3:7.1f} ms   "
          f"fwd+wgrad(half-zero-g) {dt_g16*1e3:7.1f} ms", flush=True)

    for c_out in (8, 32, 64, 128):
        w = jnp.asarray(
            rng.normal(size=(5, 4, 4, 12, c_out)).astype(np.float32) * 0.01,
            jnp.bfloat16,
        )
        dn_c = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NTHWC", "THWIO", "NTHWC")
        )

        def conv(xx, w):
            return jax.lax.conv_general_dilated(
                xx, w, window_strides=(1, 1, 1),
                padding=((2, 2), (1, 2), (1, 2)),
                dimension_numbers=dn_c,
            )

        def loss(xx, w):
            y = conv(xx, w)[..., :8]  # only the real 8 channels matter
            return jnp.sum(y.astype(jnp.float32) ** 2)

        dt_f = timeit(jax.jit(conv), x, w)
        dt_g = timeit(jax.jit(jax.value_and_grad(loss, argnums=1)), x, w)
        print(f"c_out={c_out:4d}: fwd {dt_f*1e3:7.1f} ms   "
              f"fwd+wgrad {dt_g*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
