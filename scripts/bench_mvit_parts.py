"""Bisect the MViT-S MaskFeat step: HOG target computation, forward,
forward+backward, and the aa/masking ingest — standalone timings on the
live backend (value-fetch barriers; see BASELINE.md)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)).item()
    return (time.perf_counter() - t0) / iters


def main():
    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.engine.train import build_train_state
    from advise_tpu.models import build_model
    from advise_tpu.models.layers.operators import hog_features

    n_dev = jax.device_count()
    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/MViT_S_rev_masked.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = n_dev
    cfg.TPU.MESH_SYNC = min(int(cfg.TPU.MESH_SYNC), n_dev)
    cfg.BN.NUM_SYNC_DEVICES = cfg.TPU.MESH_SYNC
    cfg = assert_and_infer_cfg(cfg)

    class _Tx:
        def init(self, params):
            return ()

    model = build_model(cfg, sync_axes=())
    state = build_train_state(cfg, model, _Tx(), jax.random.PRNGKey(0))
    params, bs = state.params, state.batch_stats

    b = cfg.DATA.BATCHSIZE_PER_GPU
    t = cfg.DATA.NUM_FRAMES
    s = int(cfg.AUG.TARGET_SIZE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(b, t, s, s, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    print(f"backend={jax.devices()[0].platform} b={b} t={t} {s}x{s} "
          f"remat={cfg.TPU.REMAT}")

    frames = jnp.asarray(
        rng.normal(size=(b * t, s, s, 3)).astype(np.float32)
    )
    dt = timeit(
        jax.jit(lambda f: hog_features(f, nbins=9, cell_sz=8)), frames
    )
    print(f"HOG targets standalone:  {dt*1e3:7.1f} ms")

    def fwd(p, xx):
        out = model.apply(
            {"params": p, "batch_stats": bs}, xx, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1),
                  "mask": jax.random.PRNGKey(2)},
        )[0]
        preds = out[0]
        return sum(jnp.sum(pr.astype(jnp.float32)) for pr in preds)

    dt = timeit(jax.jit(lambda xx: fwd(params, xx)), x)
    print(f"fwd only ({b} clips):     {dt*1e3:7.1f} ms")

    dt = timeit(jax.jit(jax.grad(fwd)), params, x)
    print(f"fwd+bwd ({b} clips):      {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
