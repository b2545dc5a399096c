"""AdViSe step decomposition on the live backend: how much of the
tmodeling step is the frozen (bf16) CLIP spatial tower vs the trainable
temporal head + optimizer (VERDICT r2 item 4: the frozen-forward vs
trainable-head split; reference temporal_modeling.py:240-305).

Usage: python scripts/bench_advise_split.py [--steps 10]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/AdViSe.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = jax.device_count()
    cfg = assert_and_infer_cfg(cfg)

    model = build_model(cfg, sync_axes=())
    s = int(cfg.AUG.TARGET_SIZE)
    x0 = jnp.zeros((2, cfg.DATA.NUM_FRAMES, s, s, 3), jnp.float32)
    v = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, train=False, method="init_all",
    ))()

    n_frames = (
        cfg.DATA.BATCHSIZE_PER_GPU * cfg.DATA.NUM_CLIP * cfg.DATA.NUM_FRAMES
    )
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (n_frames, s, s, 3))
        .astype(np.float32)
    )
    print(f"backend={jax.devices()[0].platform} frames={frames.shape} "
          f"(bs{cfg.DATA.BATCHSIZE_PER_GPU} x {cfg.DATA.NUM_CLIP} clips x "
          f"{cfg.DATA.NUM_FRAMES}f)")

    spatial = jax.jit(
        lambda vv, f: model.apply(vv, f, False, method="spatial_forward")
    )
    dt = timeit(spatial, v, frames, iters=args.steps)
    print(f"frozen spatial tower (bf16 ViT-B/16, {n_frames} frames): "
          f"{dt*1e3:.1f} ms")

    feats = jax.jit(
        lambda vv, f: model.apply(
            vv, f, False, method="features",
        )
    )
    clips = frames.reshape(
        cfg.DATA.BATCHSIZE_PER_GPU * cfg.DATA.NUM_CLIP,
        cfg.DATA.NUM_FRAMES, s, s, 3,
    )
    dt2 = timeit(feats, v, clips, iters=args.steps)
    print(f"features (tower + temporal head fwd): {dt2*1e3:.1f} ms "
          f"(head fwd ~= {max(dt2-dt,0)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
