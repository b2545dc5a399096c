"""Speed validation: dense clip sweep -> confusion matrix.

Reference: ``tools/validate.py:20-68``. Per-video clip counts vary (one
start per FPS frames x |VAL.RANGE| labels), so the host flattens clips
into fixed-size chunks for the jitted eval step; the confusion matrix
accumulates on host and per-class accuracies land in
``LOGDIR/Metrics.csv`` (rank-0 only — the reference wrote it from every
rank, SURVEY.md §8.10).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.data import build_dataset, build_device_aug, ingest_geometry
from advise_tpu.engine.steps import make_eval_step
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.mesh import mesh_batch_axes

logger = logging.getLogger(__name__)


def validation(cfg, model, state, mesh=None, max_videos: Optional[int] = None):
    """Returns the confusion matrix [n_labels, n_labels] (rows = true)."""
    mesh = mesh or build_mesh(cfg)
    n_labels = len(cfg.VAL.RANGE)
    dataset = build_dataset(cfg, "speed")
    aug = build_device_aug(cfg, "speed")
    eval_step = make_eval_step(cfg, mesh, model, aug)

    # batch-CARRYING devices only: 'model'/'seq'/'pipe' axes replicate
    # the batch, so sizing by the full device count would feed each
    # batch device that many times its configured per-chip eval batch
    n_dev = int(
        np.prod([mesh.shape[a] for a in mesh_batch_axes(mesh)])
    )
    chunk = max(cfg.VAL.BATCHSIZE_PER_GPU, 1) * n_dev

    confusion = np.zeros((n_labels, n_labels), np.int64)
    rng = np.random.default_rng(cfg.INFER.SEED)
    n_items = len(dataset)
    if max_videos is not None:
        n_items = min(n_items, max_videos)
    pending_clips, pending_labels = [], []

    def flush():
        nonlocal pending_clips, pending_labels
        while len(pending_clips) >= chunk:
            batch = np.stack(pending_clips[:chunk])[:, None]  # [B,1,T,H,W,C]
            labels = np.asarray(pending_labels[:chunk])
            pending_clips = pending_clips[chunk:]
            pending_labels = pending_labels[chunk:]
            logits = eval_step(
                state.params,
                state.batch_stats,
                jnp.asarray(batch),
                {},
                jax.random.PRNGKey(0),
            )
            preds = np.asarray(jnp.argmax(logits[:, 0], axis=-1))
            for t, p in zip(labels, preds):
                confusion[int(t), int(p)] += 1

    from advise_tpu.data.loader import threaded_items

    for _, (clips, infos) in threaded_items(
        dataset, n_items, lambda idx: [cfg.INFER.SEED, 0, idx],
        num_workers=cfg.DATA.WORKERS,
    ):
        for c, lbl in zip(clips, infos["spd_label"]):
            pending_clips.append(c)
            pending_labels.append(int(lbl))
        flush()
    # pad the tail chunk
    if pending_clips:
        pad = chunk - len(pending_clips)
        real = len(pending_clips)
        pending_clips += [pending_clips[-1]] * pad
        pending_labels += [-1] * pad
        batch = np.stack(pending_clips)[:, None]
        logits = eval_step(
            state.params,
            state.batch_stats,
            jnp.asarray(batch),
            {},
            jax.random.PRNGKey(0),
        )
        preds = np.asarray(jnp.argmax(logits[:, 0], axis=-1))
        for t, p in zip(pending_labels[:real], preds[:real]):
            confusion[int(t), int(p)] += 1

    per_class = confusion.diagonal() / np.maximum(confusion.sum(axis=1), 1)
    acc = confusion.diagonal().sum() / max(confusion.sum(), 1)
    logger.info("speed val acc: %.4f per-class: %s", acc, np.round(per_class, 4))
    if jax.process_index() == 0 and getattr(cfg, "LOGDIR", None):
        os.makedirs(cfg.LOGDIR, exist_ok=True)
        with open(os.path.join(cfg.LOGDIR, "Metrics.csv"), "w") as f:
            f.write("label," + ",".join(str(r) for r in cfg.VAL.RANGE) + ",acc\n")
            for i, r in enumerate(cfg.VAL.RANGE):
                row = ",".join(str(int(v)) for v in confusion[i])
                f.write(f"{r},{row},{per_class[i]:.4f}\n")
            f.write(f"total,,,,{acc:.4f}\n")
    return confusion
