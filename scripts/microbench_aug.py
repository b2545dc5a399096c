"""Micro-benchmark the 'aa' (RandAugment) device aug pipeline on the live
backend — stage-level and per-op timings to drive profile-guided
optimization (VERDICT round-1 item #5: the 215 ms RandAugment tail of the
SlowFast-R50 BYOL step).

Usage: python scripts/microbench_aug.py [--ops]

Every timing uses the value-fetch completion barrier (see BASELINE.md:
on the axon relay block_until_ready returns early).
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
    ap.add_argument("--ops", action="store_true", help="also time each RA op")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--clips", type=int, default=16, help="B*K flat clips")
    args = ap.parse_args()

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug

    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/SlowFast_R50_K400.yaml")
    cfg = assert_and_infer_cfg(cfg)

    t, s = args.frames, int(cfg.AUG.TARGET_SIZE)
    w, h = (s * 4 // 3, s)
    rng = np.random.default_rng(0)
    bk = args.clips
    batch = jnp.asarray(
        rng.integers(0, 256, size=(bk // 2, 2, t, h, w, 3), dtype=np.uint8)
    )
    print(f"backend={jax.devices()[0].platform} input={batch.shape}")

    aug = build_device_aug(cfg, "train")
    jaug = jax.jit(aug)
    dt = timeit(jaug, batch, jax.random.PRNGKey(0))
    print(f"aa pipeline total: {dt*1e3:.1f} ms  ({bk/dt:.1f} clips/s)")

    # stage-level: RRC-only (no RA), RA-only on cropped clips
    from advise_tpu.data.device_aug import (
        normalize, resized_crop_clip, sample_rrc_box, hflip_clip,
    )
    from advise_tpu.data.erasing import random_erasing_clip
    from advise_tpu.data.rand_augment import make_rand_augment

    scale = (cfg.AUG.MIN_AREA, cfg.AUG.MAX_AREA)
    ratio = tuple(cfg.AUG.RAND_CROP_RATIO)

    def rrc_only(batch_u8, key):
        bsz, k = batch_u8.shape[:2]
        flat = batch_u8.reshape(bsz * k, *batch_u8.shape[2:])
        keys = jax.random.split(key, bsz * k)

        def one(clip_u8, kk):
            box = sample_rrc_box(kk, h, w, scale, ratio)
            c = jnp.clip(
                resized_crop_clip(clip_u8.astype(jnp.float32), box, (s, s)),
                0, 255)
            return normalize(c, cfg.DATA.MEAN, cfg.DATA.STD)

        return jax.lax.map(lambda a: one(*a), (flat, keys))

    dt_rrc = timeit(jax.jit(rrc_only), batch, jax.random.PRNGKey(0))
    print(f"RRC+normalize only: {dt_rrc*1e3:.1f} ms")

    ra = make_rand_augment(cfg.AUG.AA_TYPE)
    cropped = jnp.asarray(
        rng.integers(0, 256, size=(bk, t, s, s, 3)).astype(np.float32)
    )

    def ra_map(flat, key):
        keys = jax.random.split(key, flat.shape[0])
        return jax.lax.map(lambda a: ra(*a), (flat, keys))

    dt_ra = timeit(jax.jit(ra_map), cropped, jax.random.PRNGKey(0))
    print(f"RandAugment only (lax.map, n=4 slots): {dt_ra*1e3:.1f} ms")

    def re_map(flat, key):
        keys = jax.random.split(key, flat.shape[0])
        return jax.lax.map(
            lambda a: random_erasing_clip(
                a[0], a[1], probability=cfg.AUG.RE_PROB,
                mode=cfg.AUG.RE_MODE, count=cfg.AUG.RE_COUNT),
            (flat, keys))

    dt_re = timeit(jax.jit(re_map), cropped, jax.random.PRNGKey(0))
    print(f"RandomErasing only: {dt_re*1e3:.1f} ms")

    if args.ops:
        import advise_tpu.data.rand_augment as R

        one_clip = cropped[0]
        named = [
            ("autocontrast", lambda c: R.autocontrast(c)),
            ("equalize", lambda c: R.equalize(c)),
            ("invert", lambda c: R.invert(c)),
            ("rotate", lambda c: R.rotate(c, jnp.float32(21.0))),
            ("posterize", lambda c: R.posterize(c, jnp.float32(3.0))),
            ("solarize", lambda c: R.solarize(c, jnp.float32(77.0))),
            ("solarize_add", lambda c: R.solarize_add(c, jnp.float32(77.0))),
            ("color", lambda c: __import__(
                "advise_tpu.data.device_aug", fromlist=["adjust_saturation"]
            ).adjust_saturation(c, jnp.float32(1.6))),
            ("contrast", lambda c: __import__(
                "advise_tpu.data.device_aug", fromlist=["adjust_contrast"]
            ).adjust_contrast(c, jnp.float32(1.6))),
            ("brightness", lambda c: __import__(
                "advise_tpu.data.device_aug", fromlist=["adjust_brightness"]
            ).adjust_brightness(c, jnp.float32(1.6))),
            ("sharpness", lambda c: R.sharpness(c, jnp.float32(1.6))),
            ("shear_x", lambda c: R.shear_x(c, jnp.float32(0.2))),
            ("translate_x", lambda c: R.translate_x(c, jnp.float32(0.3))),
        ]
        print(f"-- per-op on one clip {one_clip.shape} --")
        for name, fn in named:
            dt = timeit(jax.jit(fn), one_clip, iters=20)
            print(f"  {name:14s} {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
