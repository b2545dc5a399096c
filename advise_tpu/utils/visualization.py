"""Offline visualization: clip dumps, feature extraction, CAM heatmaps.

Reference: ``utils/visualization.py:38-231`` (clips2gifs with speed-label
overlay, get_feat penultimate-feature dump via forward hook, CLIP ln_post
CAM via cv2). Hook-free functional equivalents: features come from
``include_head=False`` model twins instead of forward hooks.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def denormalize(clip: np.ndarray, mean, std) -> np.ndarray:
    """Normalized float clip [T, H, W, C] -> uint8 (reference denorm)."""
    mean = np.asarray(mean) * 255.0
    std = np.asarray(std) * 255.0
    return np.clip(clip * std + mean, 0, 255).astype(np.uint8)


def clips2videos(
    clips: np.ndarray,
    out_dir: str,
    mean,
    std,
    labels: Optional[Sequence[int]] = None,
    fps: int = 8,
    prefix: str = "clip",
):
    """Dump normalized clips [N, T, H, W, C] as .mp4 with optional label
    overlay (reference clips2gifs :38-96; mp4 via cv2 instead of moviepy
    gifs — moviepy is not in this image)."""
    assert _HAS_CV2, "cv2 required for video dumps"
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, clip in enumerate(np.asarray(clips)):
        frames = denormalize(clip, mean, std)
        t, h, w, _ = frames.shape
        path = os.path.join(out_dir, f"{prefix}_{i:04d}.mp4")
        wr = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for f in frames:
            bgr = cv2.cvtColor(f, cv2.COLOR_RGB2BGR)
            if labels is not None:
                cv2.putText(
                    bgr, f"spd={labels[i]}", (4, 16),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
                )
            wr.write(bgr)
        wr.release()
        paths.append(path)
    logger.info("wrote %d clip videos to %s", len(paths), out_dir)
    return paths


def get_features(cfg, model_backbone, state, loader, out_path: str,
                 max_batches: Optional[int] = None):
    """Penultimate-feature dump (reference get_feat :98-163, which uses a
    forward hook; here the backbone twin returns features directly).

    model_backbone: model built with include_head=False.
    Writes {features [N, D], labels [N], item_ids [N]} to out_path (.npz).
    """
    feats, labels, ids = [], [], []

    @jax.jit
    def embed(params, batch_stats, x):
        out = model_backbone.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        if isinstance(out, (list, tuple)):
            out = out[0]
        if out.ndim > 2:
            out = out.mean(axis=tuple(range(1, out.ndim - 1)))
        return out

    from advise_tpu.data import build_device_aug

    aug = jax.jit(build_device_aug(cfg, "train"))
    for i, (clips, infos) in enumerate(loader.epoch(0)):
        if max_batches is not None and i >= max_batches:
            break
        x = aug(jnp.asarray(clips), jax.random.PRNGKey(i))
        b, k = x.shape[:2]
        out = embed(
            state.params, state.batch_stats,
            x.reshape(b * k, *x.shape[2:]),
        )
        feats.append(np.asarray(out.reshape(b, k, -1).mean(axis=1)))
        labels.append(np.asarray(infos["cls_id"]).reshape(-1))
        ids.append(np.asarray(infos["item_id"]).reshape(-1))
    features = np.concatenate(feats)
    np.savez(
        out_path,
        features=features,
        labels=np.concatenate(labels),
        item_ids=np.concatenate(ids),
    )
    logger.info("dumped %s features to %s", features.shape, out_path)
    return out_path


def cam_heatmaps(tokens: np.ndarray, grid_hw: int, frame_hw: int) -> np.ndarray:
    """Token-norm CAM (reference cam :165-231: CLIP ln_post token norms
    upsampled over frames). tokens [N, L, D] -> heatmaps [N, H, W] in [0,1]."""
    energy = np.linalg.norm(np.asarray(tokens), axis=-1)  # [N, L]
    n = energy.shape[0]
    maps = energy.reshape(n, grid_hw, grid_hw)
    maps = maps - maps.min(axis=(1, 2), keepdims=True)
    maps = maps / np.maximum(maps.max(axis=(1, 2), keepdims=True), 1e-6)
    if _HAS_CV2:
        maps = np.stack(
            [cv2.resize(m, (frame_hw, frame_hw)) for m in maps]
        )
    return maps


# jitted (aug + masked-forward) programs keyed by (model, aug) identity
_VIS_FORWARD_CACHE: dict = {}


def dump_mask_visualization(
    cfg, model, params, batch_stats, clips_u8, device_aug, rng,
    epoch: int, max_items: int = 4,
) -> Optional[str]:
    """VIS_MASK.ENABLE: write (input | masked-input | reconstruction)
    comparison videos for a batch (reference masked.py:464-540: the MAE
    forward returns the triple and plot_input_normed writes mp4s under
    OUTPUT_DIR/vis_mask/vid/{pfx}... with the TEST.CHECKPOINT_FILE_PATH
    basename as prefix). Called from the trainer at epoch end on one
    batch — the hot train step never carries the videos.

    Returns the output directory (None when nothing was written).
    """
    if not cfg.VIS_MASK.ENABLE:
        return None
    aug_rng, mask_rng, drop_rng = jax.random.split(rng, 3)
    compute = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )

    # ONE jitted program for aug + masked forward: op-by-op dispatch of
    # an MViT forward through a remote-compile backend (this image's
    # axon relay: ~30s-4min PER program) would turn the epoch-end dump
    # into hours. Cached per (model, aug) pair so later epochs reuse it.
    key = (id(model), id(device_aug))
    jitted = _VIS_FORWARD_CACHE.get(key)
    if jitted is None:

        def _forward(p, bs, u8, a_rng, m_rng, d_rng):
            c = device_aug(u8, a_rng) if device_aug is not None else u8
            b, k = c.shape[:2]
            xx = c.reshape(b * k, *c.shape[2:])[:max_items]
            out = model.apply(
                {"params": p, "batch_stats": bs},
                xx.astype(compute), train=False,
                rngs={"mask": m_rng, "dropout": d_rng},
            )
            return out[-1]

        jitted = jax.jit(_forward)
        _VIS_FORWARD_CACHE[key] = jitted
    vis = jitted(
        params, batch_stats, clips_u8, aug_rng, mask_rng, drop_rng
    )  # (input, masked, recon), each [N, T, H, W, 3]
    pfx = os.path.basename(str(cfg.TEST.CHECKPOINT_FILE_PATH or ""))
    pfx = pfx.rsplit(".", 1)[0]
    mr = cfg.AUG.MASK_RATIO
    # reference writes under cfg.OUTPUT_DIR (masked.py:537); this tree
    # names the run directory LOGDIR (tools/run.py --output)
    out_dir = os.path.join(
        cfg.LOGDIR, "vis_mask", "vid",
        f"{pfx}vis_video_in_mask_out_mr{mr}",
    )
    os.makedirs(out_dir, exist_ok=True)
    triple = np.stack([np.asarray(v, np.float32) for v in vis], axis=1)
    # comparison grid [N, 3, T, H, W, 3]: de-normalize with DATA.MEAN/STD
    for i in range(triple.shape[0]):
        frames = [
            np.concatenate(
                [denormalize(triple[i, j, f], cfg.DATA.MEAN, cfg.DATA.STD)
                 for j in range(3)],
                axis=1,
            )
            for f in range(triple.shape[2])
        ]
        np.save(os.path.join(out_dir, f"vis_{epoch}_{i}.npy"), triple[i])
        if _HAS_CV2:
            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(
                os.path.join(out_dir, f"vis_{epoch}_{i}.mp4"),
                cv2.VideoWriter_fourcc(*"mp4v"), 4, (w, h),
            )
            for f in frames:
                vw.write(f[..., ::-1])  # RGB -> BGR
            vw.release()
    logger.info("VIS_MASK: wrote %d comparisons to %s", triple.shape[0], out_dir)
    return out_dir
