"""Host-ingest throughput bench: items/s through the full ClipLoader
(decode + sampling + resize + batch assembly) for any preset over a real
or synthetic video tree. Pairs with scripts/make_mini_k400.py.

Usage:
  python scripts/make_mini_k400.py /tmp/minik400 128
  python scripts/bench_loader.py --cfg configs/pretrain/SlowFast_R50_K400.yaml \
      --datadir /tmp/minik400/videos --labeldir /tmp/minik400/lists
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--datadir", default=None)
    ap.add_argument("--labeldir", default=None)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    # host-only bench: force CPU unconditionally (sitecustomize may have
    # baked the axon TPU backend into the env AND pre-imported jax)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_loader

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.datadir:
        if not args.labeldir:
            ap.error("--datadir requires --labeldir (the split-CSV dir)")
        cfg.DATA.DATADIR = args.datadir
        cfg.DATA.LABELDIR = args.labeldir
        cfg.DATA.DECODE_BACKEND = "cv2"
        cfg.DATA.DATASET = "ucf"
    cfg.NUM_WORLDS = 1
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg = assert_and_infer_cfg(cfg)
    loader = build_loader(cfg, "train")

    n_items, t0 = 0, None
    for ep in range(args.epochs):
        for clips, infos in loader.epoch(ep):
            if t0 is None:
                t0 = time.perf_counter()  # skip warmup batch
                print(f"batch {clips.shape} {clips.dtype}, "
                      f"workers={cfg.DATA.WORKERS}")
            else:
                n_items += clips.shape[0]
    if t0 is None:
        sys.exit(
            "loader yielded no batches (dataset smaller than the batch "
            "size with drop_last?) — nothing to measure"
        )
    dt = time.perf_counter() - t0
    k = cfg.DATA.NUM_CLIP
    print(
        f"loader: {n_items} items in {dt:.1f}s -> {n_items/dt:.1f} items/s"
        f" ({k*n_items/dt:.1f} clips/s)"
    )


if __name__ == "__main__":
    main()
