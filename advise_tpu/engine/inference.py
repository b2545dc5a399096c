"""Action inference: multi-clip x multi-crop evaluation.

Reference: ``tools/inference.py:17-85``. Per video, INFER.NUM_CLIPS starts
x INFER.NUM_CROPS crops are sampled (reference DuplicSpeedStampsGenerator),
logits are averaged over all views, top-1 compared to cls_id, and
correct/total aggregate across the mesh. Unlike the reference (batch=1 per
video, mean over a mixed crop/clip axis — SURVEY.md §8.5), views here are
batched across videos at a fixed views-per-video count and the mean is an
explicit per-video reduction.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.data import build_dataset, build_device_aug
from advise_tpu.engine.steps import make_eval_step
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.mesh import mesh_batch_axes

logger = logging.getLogger(__name__)


def inference(cfg, model, state, mesh=None, max_videos: Optional[int] = None):
    """Returns (top1_acc, correct, total)."""
    mesh = mesh or build_mesh(cfg)
    dataset = build_dataset(cfg, "action")
    aug = build_device_aug(cfg, "action")
    eval_step = make_eval_step(cfg, mesh, model, aug)

    # batch-carrying devices only (see validate.py: replicating axes
    # like 'model'/'seq'/'pipe' must not inflate the per-chip batch)
    n_dev = int(
        np.prod([mesh.shape[a] for a in mesh_batch_axes(mesh)])
    )
    views = cfg.INFER.NUM_CLIPS * cfg.INFER.NUM_CROPS
    # videos per batch: keep the flattened view count mesh-divisible
    vids_per_batch = max(n_dev // max(views, 1), 1) * max(
        cfg.INFER.BATCHSIZE_PER_GPU, 1
    )
    while (vids_per_batch * views) % n_dev != 0:
        vids_per_batch += 1

    n_items = len(dataset)
    if max_videos is not None:
        n_items = min(n_items, max_videos)

    correct, total = 0, 0
    buf_clips, buf_labels = [], []

    def flush():
        nonlocal correct, total, buf_clips, buf_labels
        if not buf_clips:
            return
        pad = vids_per_batch - len(buf_clips)
        real = len(buf_clips)
        clips = np.stack(buf_clips + [buf_clips[-1]] * pad)  # [V, views, ...]
        # flatten views into the sharded batch dim (the eval step shards
        # dim 0 over the mesh)
        flat = clips.reshape(vids_per_batch * views, 1, *clips.shape[2:])
        logits = eval_step(
            state.params,
            state.batch_stats,
            jnp.asarray(flat),
            {},
            jax.random.PRNGKey(cfg.INFER.SEED),
        )  # [V*views, 1, classes]
        logits = logits.reshape(vids_per_batch, views, -1)
        # mean over views per video (fixing the reference's mixed-axis mean)
        preds = np.asarray(jnp.argmax(jnp.mean(logits, axis=1), axis=-1))
        for lbl, p in zip(buf_labels[:real], preds[:real]):
            total += 1
            correct += int(p == lbl)
        buf_clips, buf_labels = [], []

    from advise_tpu.data.loader import threaded_items

    for _, (clips, infos) in threaded_items(
        dataset, n_items, lambda idx: [cfg.INFER.SEED, 1, idx],
        num_workers=cfg.DATA.WORKERS,
    ):
        buf_clips.append(clips)  # [views, T, H, W, C]
        buf_labels.append(int(infos["cls_id"]))
        if len(buf_clips) == vids_per_batch:
            flush()
    flush()

    acc = correct / max(total, 1)
    logger.info(
        "action inference: Acc@1 %.4f (%d/%d), %d views/video",
        acc, correct, total, views,
    )
    return acc, correct, total
