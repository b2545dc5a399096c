"""Time the full SPMD train step of any preset on the live backend.

Usage:
  python scripts/bench_step.py --cfg configs/pretrain/SlowFast_R50_K400.yaml
  python scripts/bench_step.py --cfg ... --opts AUG.FUSED_RA False

Prints step time, clips/s/chip, and a train-FLOPs-based MFU estimate from
XLA's cost analysis. Value-fetch completion barriers throughout (axon
relay: block_until_ready returns early, BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "JAX_PLATFORMS" in os.environ:
    # sitecustomize pre-imports jax on the axon backend; honor the env
    # override so CPU repros don't land on the chip (same as bench.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--profile", default="",
                    help="capture a jax.profiler trace of 3 steps into DIR")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug, ingest_geometry
    from advise_tpu.engine.steps import make_train_step
    from advise_tpu.engine.train import build_train_state
    from advise_tpu.models import build_model
    from advise_tpu.parallel import build_mesh
    from advise_tpu.solver import build_tx

    n_dev = jax.device_count()
    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = n_dev
    cfg.TPU.MESH_SYNC = min(int(cfg.TPU.MESH_SYNC), n_dev)
    cfg.BN.NUM_SYNC_DEVICES = cfg.TPU.MESH_SYNC
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg = assert_and_infer_cfg(cfg)
    from advise_tpu.tools.run import enable_compile_cache

    enable_compile_cache(cfg)

    class _TxProxy:
        def init(self, params):
            return ()

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    rng0 = jax.random.PRNGKey(0)
    state = build_train_state(cfg, model_init, _TxProxy(), rng0)
    bundle = build_tx(cfg, state.params)
    state = state.replace(opt_state=bundle.tx.init(state.params))
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        from advise_tpu.engine.contrastive import init_ssl_state

        state = state.replace(ssl=init_ssl_state(
            cfg, state.params, state.batch_stats, jax.random.fold_in(rng0, 7)
        ))
    elif cfg.MODEL.MODEL_NAME == "TemporalModel":
        from advise_tpu.engine.steps import init_tmodeling_ssl

        state = state.replace(ssl=init_tmodeling_ssl(cfg, state.params))
    aug = build_device_aug(cfg, "train")
    step = make_train_step(cfg, mesh, model, bundle, aug)

    b = cfg.DATA.BATCHSIZE_PER_GPU * n_dev
    k = cfg.DATA.NUM_CLIP
    t = cfg.DATA.NUM_FRAMES
    w, h = ingest_geometry(cfg, "train")
    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.integers(0, 256, size=(b, k, t, h, w, 3), dtype=np.uint8)
    )
    infos = {
        "spd_label": jnp.asarray(rng.integers(0, 4, size=(b, k))),
        "item_id": jnp.asarray(rng.integers(0, cfg.CONTRASTIVE.LENGTH, (b,))),
        "time_idx": jnp.zeros((b,), jnp.float32),
        "cls_id": jnp.asarray(rng.integers(0, 4, size=(b,))),
    }
    if cfg.TASK == "masked" and not cfg.MASK.MAE_RND_MASK:
        # the real pipeline ships loader-side blockwise masks; replicate
        from advise_tpu.data.masking import MaskingGenerator3D

        # token grid at the POST-AUG geometry (TARGET_SIZE crops), matching
        # the real loader (data/__init__.py build_dataset)
        pt, ph, pw = cfg.MVIT.PATCH_STRIDE
        grid = (
            max(t // pt, 1),
            cfg.AUG.TARGET_SIZE // ph,
            cfg.AUG.TARGET_SIZE // pw,
        )
        gen = MaskingGenerator3D(
            grid, int(round(cfg.AUG.MASK_RATIO * grid[0] * grid[1] * grid[2])),
            max_num_patches=(cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK or None),
        )
        infos["mask"] = jnp.asarray(
            np.stack([gen(rng) for _ in range(b * k)]).reshape(
                b, k, *grid
            ).astype(np.uint8)
        )
    extra = ()
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        extra = (jnp.float32(1.0),)  # epoch_exact

    print(f"backend={jax.devices()[0].platform} clips={clips.shape} "
          f"model={cfg.MODEL.MODEL_NAME}/{cfg.MODEL.ARCH}")

    t0 = time.perf_counter()
    for i in range(2):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(i), jnp.float32(1e-3),
            *extra,
        )
    float(jnp.sum(stats["grad_norm"]))
    print(f"compile+warmup: {time.perf_counter()-t0:.1f} s")

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(100 + i),
            jnp.float32(1e-3), *extra,
        )
    float(jnp.sum(stats["grad_norm"]))
    dt = (time.perf_counter() - t0) / args.steps

    if args.profile:
        jax.profiler.start_trace(args.profile)
        for i in range(3):
            state, stats = step(
                state, clips, infos, jax.random.PRNGKey(500 + i),
                jnp.float32(1e-3), *extra,
            )
        float(jnp.sum(stats["grad_norm"]))
        jax.profiler.stop_trace()
        print(f"trace written -> {args.profile}")

    clips_per_step = b * k
    print(f"step: {dt*1e3:.1f} ms  "
          f"{clips_per_step/dt/n_dev:.1f} clips/s/chip")

    # FLOPs estimate from XLA cost analysis of the compiled step
    try:
        lowered = step.lower(
            state, clips, infos, jax.random.PRNGKey(0), jnp.float32(1e-3),
            *extra,
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", 0.0)
        # v5e lite: 197 TFLOP/s bf16 peak per chip
        peak = 197e12
        mfu = flops / n_dev / dt / peak
        print(f"XLA-counted step FLOPs: {flops/1e9:.1f} G  "
              f"-> MFU ~{mfu*100:.1f}% of v5e bf16 peak")
    except Exception as e:  # noqa: BLE001
        print(f"cost analysis unavailable: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
