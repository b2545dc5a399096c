"""Bisect the SlowFast-R50 BYOL step: time each component standalone on
the live backend (VERDICT #5 profile-guided pass; axon value-fetch
barriers throughout).

Components: device aug | online fwd+bwd (1 view) | EMA fwd (1 view) |
batched-views fwd+bwd (2B) | full step.
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
    from advise_tpu.data import build_device_aug, ingest_geometry
    from advise_tpu.engine.train import build_train_state
    from advise_tpu.models import build_model
    from advise_tpu.solver import build_tx

    n_dev = jax.device_count()
    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/SlowFast_R50_K400.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = n_dev
    cfg.TPU.MESH_SYNC = min(int(cfg.TPU.MESH_SYNC), n_dev)
    cfg.BN.NUM_SYNC_DEVICES = cfg.TPU.MESH_SYNC
    cfg = assert_and_infer_cfg(cfg)

    class _Tx:
        def init(self, params):
            return ()

    model = build_model(cfg, sync_axes=())  # single-chip: no psum axes
    state = build_train_state(cfg, model, _Tx(), jax.random.PRNGKey(0))
    params, bs = state.params, state.batch_stats
    compute_dtype = jnp.bfloat16

    b = cfg.DATA.BATCHSIZE_PER_GPU
    t = cfg.DATA.NUM_FRAMES
    w, h = ingest_geometry(cfg, "train")
    s = int(cfg.AUG.TARGET_SIZE)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(0, 256, (b, 2, t, h, w, 3), dtype=np.uint8)
    )
    view = jnp.asarray(
        rng.normal(size=(b, t, s, s, 3)).astype(np.float32)
    ).astype(compute_dtype)
    view2 = jnp.concatenate([view, view], axis=0)

    print(f"backend={jax.devices()[0].platform} b={b} t={t} {s}x{s}")

    aug = build_device_aug(cfg, "train")
    dt = timeit(jax.jit(aug), raw, jax.random.PRNGKey(0))
    print(f"aug (2 views, fused RA):      {dt*1e3:7.1f} ms")

    def fwd(p, x):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        proj = out[0] if isinstance(out, (list, tuple)) else out
        return jnp.sum(proj.astype(jnp.float32))

    dt = timeit(jax.jit(lambda x: fwd(params, x)), view)
    print(f"fwd only (1 view, {b} clips):  {dt*1e3:7.1f} ms")

    dt = timeit(jax.jit(lambda x: fwd(params, x)), view2)
    print(f"fwd only (2 views batched):   {dt*1e3:7.1f} ms")

    grad_fn = jax.jit(jax.grad(fwd), static_argnums=())
    dt = timeit(grad_fn, params, view)
    print(f"fwd+bwd (1 view, {b} clips):   {dt*1e3:7.1f} ms")

    dt = timeit(grad_fn, params, view2)
    print(f"fwd+bwd (2 views batched):    {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
