"""Localize the AUG.RA_BATCHED cost structure on the live backend.

Times, at flagship shapes ([32 clips, 32f, 224x298 u8] -> 224x224):
  1. full aa pipeline, RA_BATCHED on vs off (the serial r2 path)
  2. geometry phase alone: vmapped warp vs serial lax.map warp
  3. one batched color slot (mask-select pass) without the equalize loop
  4. the equalize while-loop at forced counts (0 / 2 / 8 clips)
  5. single-clip equalize (the nibble rewrite) in isolation

Usage: python scripts/microbench_ra_batched.py [--clips 32] [--frames 32]
Value-fetch barriers throughout (axon relay semantics, BASELINE.md).
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
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug
    from advise_tpu.data import rand_augment as R
    from advise_tpu.data.device_aug import sample_rrc_box

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

    for batched in (True, False):
        cfg.AUG.RA_BATCHED = batched
        aug = jax.jit(build_device_aug(cfg, "train"))
        dt = timeit(aug, batch, jax.random.PRNGKey(0))
        print(f"aa pipeline RA_BATCHED={batched}: {dt*1e3:.1f} ms "
              f"({bk/dt:.1f} clips/s)", flush=True)

    # ---- geometry phase alone: vmap vs serial map ----
    scale = (cfg.AUG.MIN_AREA, cfg.AUG.MAX_AREA)
    ratio = tuple(cfg.AUG.RAND_CROP_RATIO)
    ra_plan, _ = R.make_fused_rand_augment(cfg.AUG.AA_TYPE)

    def geom_one(clip_u8, sub):
        box = sample_rrc_box(sub[0], h, w, scale, ratio)
        p = ra_plan(sub[1], s)
        flip = jax.random.uniform(sub[2], ()) < 0.5
        sx, sy, valid = R.fused_warp_coords(p, box, flip, s)
        return R.warp_gather(clip_u8.astype(jnp.float32), sx, sy, valid)

    flat = batch.reshape(bk, t, h, w, 3)
    keys = jax.random.split(jax.random.PRNGKey(0), bk)
    subs = jax.vmap(lambda k: jax.random.split(k, 4))(keys)

    dt = timeit(jax.jit(jax.vmap(geom_one)), flat, subs)
    print(f"geometry vmapped: {dt*1e3:.1f} ms", flush=True)
    dt = timeit(
        jax.jit(lambda f, su: jax.lax.map(lambda a: geom_one(*a), (f, su))),
        flat, subs,
    )
    print(f"geometry lax.map: {dt*1e3:.1f} ms", flush=True)

    def geom_flat(f, su):
        def coords_one(sub):
            box = sample_rrc_box(sub[0], h, w, scale, ratio)
            p = ra_plan(sub[1], s)
            flip = jax.random.uniform(sub[2], ()) < 0.5
            return R.fused_warp_coords(p, box, flip, s)

        sx, sy, valid = jax.vmap(coords_one)(su)
        return R.warp_gather_batch(f.astype(jnp.float32), sx, sy, valid)

    dt = timeit(jax.jit(geom_flat), flat, subs)
    print(f"geometry flat-batched gather: {dt*1e3:.1f} ms", flush=True)

    # ---- one batched color slot, forced op (no equalize loop) ----
    apply_color = R.make_batched_color_apply(cfg.AUG.AA_TYPE, num_ops=1)
    cropped = jnp.asarray(
        rng.integers(0, 256, size=(bk, t, s, s, 3)).astype(np.float32)
    )
    slot_keys = jnp.stack(
        [jax.random.split(jax.random.PRNGKey(i), 1) for i in range(bk)]
    )

    def slot_with_sel(x, sel_value):
        plan = {
            "sel": jnp.full((bk, 1), sel_value, jnp.int32),
            "keys": slot_keys,
            "m_eff": jnp.full((bk, 1), 7.0),
        }
        return apply_color(x, plan)

    for name, sel in (
        ("brightness", R.OP_BRIGHTNESS),
        ("sharpness", R.OP_SHARPNESS),
        ("autocontrast", R.OP_AUTOCONTRAST),
        ("geo/identity", R.GEO_ROTATE),
    ):
        dt = timeit(jax.jit(lambda x, v=sel: slot_with_sel(x, v)), cropped)
        print(f"one batched slot, all-{name}: {dt*1e3:.1f} ms", flush=True)

    # ---- equalize while-loop at forced counts ----
    for count in (0, 2, 8, 32):
        sel = jnp.where(
            jnp.arange(bk) < count, R.OP_EQUALIZE, R.GEO_ROTATE
        )[:, None].astype(jnp.int32)

        def eq_loop(x, sel=sel):
            plan = {"sel": sel, "keys": slot_keys,
                    "m_eff": jnp.full((bk, 1), 7.0)}
            return apply_color(x, plan)

        dt = timeit(jax.jit(eq_loop), cropped)
        print(f"one batched slot, equalize count={count}: {dt*1e3:.1f} ms",
              flush=True)

    # ---- single-clip equalize (nibble internals) ----
    one = cropped[0]
    dt = timeit(jax.jit(R.equalize), one)
    print(f"single-clip equalize (nibble): {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
