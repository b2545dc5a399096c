"""Headline benchmark: clips/sec/chip on the flagship recipe.

Measures the steady-state SPMD train step (on-device aug + R3D-50 forward
+ backward + SyncBN + SGD) on whatever `jax.devices()` provides — the real
TPU chip under the driver, CPU elsewhere. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the documented GPU-equivalent estimate in BASELINE.md
(R3D-50 8x224 speed-pretext training, ~45 clips/s/GPU on A100-class
hardware, derived from public PySlowFast-era training logs). The
BASELINE.json target is vs_baseline >= 2.0.
"""

from __future__ import annotations

import json
import sys
import time

GPU_BASELINE_CLIPS_PER_SEC = 45.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug, ingest_geometry
    from advise_tpu.engine.state import TrainState
    from advise_tpu.engine.steps import make_train_step
    from advise_tpu.models import build_model
    from advise_tpu.parallel import build_mesh
    from advise_tpu.solver import build_tx

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    n_dev = jax.device_count()

    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/SpeedPro_R50.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = n_dev
    if not on_tpu:
        # CPU smoke variant so the bench runs anywhere
        cfg.RESNET.DEPTH = 18
        cfg.RESNET.TRANS_FUNC = "basic_transform"
        cfg.RESNET.WIDTH_PER_GROUP = 8
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
        cfg.SSL.MLP_DIM = 64
        cfg.DATA.NUM_CLIP = 2
        cfg.DATA.NUM_FRAMES = 4
        cfg.DATA.BATCHSIZE_PER_GPU = 1
        cfg.AUG.TARGET_SIZE = 32
        cfg.AUG.RESIZE = [48, 40]
        cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.MESH_SYNC = min(int(cfg.TPU.MESH_SYNC), n_dev)
    cfg.BN.NUM_SYNC_DEVICES = cfg.TPU.MESH_SYNC
    cfg = assert_and_infer_cfg(cfg)

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    t = cfg.DATA.NUM_FRAMES
    s = cfg.AUG.TARGET_SIZE
    sample = jnp.zeros((1, t, s, s, 3), jnp.float32)
    variables = jax.jit(
        lambda: model_init.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            sample,
            train=False,
        )
    )()
    bundle = build_tx(cfg, variables["params"])
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=bundle.tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    aug = build_device_aug(cfg, "train")
    step = make_train_step(cfg, mesh, model, bundle, aug)

    b = cfg.DATA.BATCHSIZE_PER_GPU * n_dev
    k = cfg.DATA.NUM_CLIP
    w, h = ingest_geometry(cfg, "train")
    rng = np.random.default_rng(0)
    clips = jnp.asarray(
        rng.integers(0, 256, size=(b, k, t, h, w, 3), dtype=np.uint8)
    )
    infos = {"spd_label": jnp.asarray(rng.integers(0, 4, size=(b, k)))}

    # warmup / compile. NOTE: on the axon TPU relay, block_until_ready
    # returns before execution completes; fetching a VALUE is the only
    # reliable completion barrier. The steps are state-chained, so fetching
    # a scalar from the final step forces the whole sequence to execute.
    for i in range(3):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(i), jnp.float32(1e-3)
        )
    float(jnp.sum(stats["grad_norm"]))

    n_steps = 20 if on_tpu else 5
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, stats = step(
            state, clips, infos, jax.random.PRNGKey(100 + i), jnp.float32(1e-3)
        )
    float(jnp.sum(stats["grad_norm"]))  # completion barrier (value fetch)
    dt = time.perf_counter() - t0

    clips_per_step = b * k
    clips_per_sec_per_chip = clips_per_step * n_steps / dt / n_dev
    result = {
        "metric": (
            "clips/sec/chip (R3D-50 slow 8x224 speed-pretext train step, "
            "fused on-device aug, bf16)"
            if on_tpu
            else "clips/sec/chip (CPU smoke variant R3D-18 tiny)"
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
