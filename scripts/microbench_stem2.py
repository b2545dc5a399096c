"""Stem pad-bwd under the step's ACTUAL context: vmapped views.

microbench_stem.py measured the unbatched padded weight-grad at 11.4 ms
vs 41.5 unpadded, but the full step with STEM_PAD_OUT showed no win —
this times the SpaceToDepthStemConv module (pad_out 0 vs 32) under
vmap over 2 views at flagship shapes to isolate whether the vmapped
lowering loses the MXU formulation.
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
    from advise_tpu.models.layers.stem import SpaceToDepthStemConv

    rng = np.random.default_rng(0)
    # pre-s2d layout: module takes [B, T, H, W, C] and repacks internally
    xv = jnp.asarray(
        rng.normal(size=(2, 16, 32, 224, 224, 3)).astype(np.float32),
        jnp.bfloat16,
    )  # [views, B, T, H, W, C]
    print(f"backend={jax.devices()[0].platform} views+batch={xv.shape}")

    for pad in (0, 32):
        m = SpaceToDepthStemConv(
            features=8, temp_kernel=5, pad_out=pad, dtype=jnp.bfloat16
        )
        v = m.init({"params": jax.random.PRNGKey(0)}, xv[0])
        params = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32), v["params"]
        )

        def loss_flat(p, xx):
            y = m.apply({"params": p}, xx.reshape(32, *xx.shape[2:]))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def loss_vmap(p, xx):
            y = jax.vmap(lambda one: m.apply({"params": p}, one))(xx)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        for name, fn in (("flat32", loss_flat), ("vmap2x16", loss_vmap)):
            dt = timeit(jax.jit(jax.value_and_grad(fn)), params, xv)
            print(f"pad={pad:3d} {name}: fwd+wgrad {dt*1e3:7.1f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
