"""Headline benchmark: the north-star recipe BASELINE.json names —
SlowFast-R50 contrastive (BYOL) pretrain with the full RandAugment +
RandomErasing pipeline (config #2), measured as clips/sec/chip on the
steady-state SPMD train step (fused on-device aug + 2-view online
forward/backward + EMA momentum encoder + LARS-SGD + kNN bank update).

Runs on whatever `jax.devices()` provides — the real TPU chip under the
driver, a tiny CPU smoke variant elsewhere. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md). The
denominator is the documented GPU-equivalent estimate in BASELINE.md:
supervised SlowFast-R50 32f training runs ~25-35 clips/s/A100 in public
PySlowFast-era logs. BYOL does ~2.7x that work per CLIP (each clip
becomes 2 views: two online fwd+bwd + two EMA forwards, vs one
supervised fwd+bwd) -> 25-35/2.7 = 9-13 clips/s, and each clip counts
as 2 clip-view units -> ~18-26 clip-views/s/GPU, midpoint 22. The
BASELINE.json target is vs_baseline >= 2.0.
"""

from __future__ import annotations

import json
import time

GPU_BASELINE_CLIPS_PER_SEC = 22.0


def main():
    import os

    import jax

    if "JAX_PLATFORMS" in os.environ:
        # sitecustomize may have pre-imported jax with another backend;
        # honor the env override (same dance as tools/run.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug, ingest_geometry
    from advise_tpu.engine.contrastive import init_ssl_state
    from advise_tpu.engine.steps import make_train_step
    from advise_tpu.engine.train import build_train_state
    from advise_tpu.models import build_model
    from advise_tpu.parallel import build_mesh
    from advise_tpu.solver import build_tx

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_dev = jax.device_count()

    cfg = get_cfg()
    if on_tpu:
        cfg.merge_from_file("configs/pretrain/SlowFast_R50_K400.yaml")
    else:
        # CPU smoke variant so the bench runs anywhere (tiny Slow R3D-10
        # BYOL — same step structure, minutes not hours to compile)
        cfg.merge_from_file("configs/smoke/byol_r10_synth.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = n_dev
    cfg.TPU.MESH_SYNC = min(int(cfg.TPU.MESH_SYNC), n_dev)
    cfg.BN.NUM_SYNC_DEVICES = cfg.TPU.MESH_SYNC
    cfg = assert_and_infer_cfg(cfg)
    from advise_tpu.tools.run import enable_compile_cache

    enable_compile_cache(cfg)

    class _TxProxy:  # placeholder so build_train_state sizes the state
        def init(self, params):
            return ()

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    rng0 = jax.random.PRNGKey(0)
    state = build_train_state(cfg, model_init, _TxProxy(), rng0)
    bundle = build_tx(cfg, state.params)
    state = state.replace(opt_state=bundle.tx.init(state.params))
    state = state.replace(
        ssl=init_ssl_state(
            cfg, state.params, state.batch_stats, jax.random.fold_in(rng0, 7)
        )
    )
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
        "item_id": jnp.asarray(rng.integers(0, cfg.CONTRASTIVE.LENGTH, (b,))),
        "time_idx": jnp.zeros((b,), jnp.float32),
    }
    epoch_exact = jnp.float32(1.0)

    # warmup / compile. NOTE: on the axon TPU relay, block_until_ready
    # returns before execution completes; fetching a VALUE is the only
    # reliable completion barrier. The steps are state-chained, so fetching
    # a scalar from the final step forces the whole sequence to execute.
    for i in range(3):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(i), jnp.float32(1e-3),
            epoch_exact,
        )
    float(jnp.sum(stats["grad_norm"]))

    n_steps = 20 if on_tpu else 5
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(100 + i),
            jnp.float32(1e-3), epoch_exact,
        )
    float(jnp.sum(stats["grad_norm"]))  # completion barrier (value fetch)
    dt = time.perf_counter() - t0

    clips_per_step = b * k
    clips_per_sec_per_chip = clips_per_step * n_steps / dt / n_dev
    result = {
        "metric": (
            "clips/sec/chip (SlowFast-R50 BYOL K400 pretrain step: 32f 224^2 "
            "2-view, fused RandAugment+RandomErasing on device, EMA encoder, "
            "LARS, bf16)"
            if on_tpu
            else "clips/sec/chip (CPU smoke variant: tiny Slow R3D-10 BYOL)"
        ),
        "value": round(clips_per_sec_per_chip, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(
            clips_per_sec_per_chip / GPU_BASELINE_CLIPS_PER_SEC, 3
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
