"""Benchmark + numerically cross-check the Pallas fused 'simple' aug
(TPU.PALLAS_AUG, ops/pallas/fused_aug.py) against the XLA lowering of
the same chain, on the live backend at the speed-flagship shape.

The two paths draw different parameter streams (documented), so the
numeric check runs the PALLAS path twice — compiled vs interpret-mode —
which must agree bitwise-ish (interpret is the tested-correct oracle).

Usage: python scripts/bench_pallas_aug.py [--clips 32] [--frames 8]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "JAX_PLATFORMS" in os.environ:
    # sitecustomize pre-imports jax on axon; honor the override so the
    # --ref subprocess really runs on CPU (same dance as bench.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jnp.sum(out).item()  # value-fetch barrier (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jnp.sum(out).item()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)  # bs8 x 4 clips
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="also run the interpret-mode numeric cross-check: "
                    "the compiled kernel output (this backend) is compared "
                    "against interpret mode run on CPU in a subprocess — "
                    "interpret-through-the-axon-relay dies with a backend "
                    "Unavailable error, so the oracle runs off-chip")
    ap.add_argument("--ref", default="",
                    help="(internal) write the CPU interpret-mode reference "
                    "for the small check shape to this .npy path and exit")
    args = ap.parse_args()

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug, ingest_geometry

    cfg = get_cfg()
    cfg.merge_from_file("configs/pretrain/SpeedPro_R50.yaml")
    cfg.DATA.DECODE_BACKEND = "synthetic"
    cfg.NUM_WORLDS = 1
    cfg = assert_and_infer_cfg(cfg)
    w, h = ingest_geometry(cfg, "train")
    n, t = args.clips, args.frames
    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.integers(0, 256, size=(n, 1, t, h, w, 3), dtype=np.uint8)
    )
    key = jax.random.PRNGKey(3)

    if args.ref:
        # CPU-interpret oracle for the check shape (deterministic inputs)
        from jax.experimental.pallas import tpu as pltpu

        cfg.TPU.PALLAS_AUG = True
        small = batch[:4, :, :2]
        with pltpu.force_tpu_interpret_mode():
            want = np.asarray(build_device_aug(cfg, "train")(small, key))
        np.save(args.ref, want)
        return

    print(f"backend={jax.devices()[0].platform} ingest={h}x{w} "
          f"clips={n} frames={t} target={cfg.AUG.TARGET_SIZE}")

    cfg.TPU.PALLAS_AUG = False
    xla_aug = jax.jit(build_device_aug(cfg, "train"))
    cfg.TPU.PALLAS_AUG = True
    pl_aug = jax.jit(build_device_aug(cfg, "train"))

    ms_xla = timed(xla_aug, batch, key) * 1e3
    print(f"XLA simple aug:    {ms_xla:7.2f} ms")
    ms_pl = timed(pl_aug, batch, key) * 1e3
    print(f"Pallas fused aug:  {ms_pl:7.2f} ms  ({ms_xla / ms_pl:.2f}x)")

    if args.check:
        small = batch[:4, :, :2]
        got = np.asarray(pl_aug(small, key))
        ref_path = "/tmp/pallas_aug_ref.npy"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--clips",
             str(args.clips), "--frames", str(args.frames), "--ref",
             ref_path],
            env=env, check=True,
        )
        want = np.load(ref_path)
        err = np.abs(got - want).max()
        print(f"compiled-vs-CPU-interpret max abs err: {err:.2e}")
        assert err < 1e-4, "Pallas kernel compiled output diverges"
        print("NUMERIC CHECK OK")


if __name__ == "__main__":
    main()
