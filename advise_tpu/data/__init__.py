"""Data pipeline factory.

``build_loader(cfg, mode)`` mirrors the reference factory
(reference ``datasets/__init__.py:105-303``): picks the sampler for the
task/mode, builds the dataset and the host loader. The augmentation half
lives on device (``build_device_aug``) — the loader yields uint8 clips at a
fixed ingest geometry plus infos.
"""

from __future__ import annotations

import jax

from advise_tpu.data import sampling as spl
from advise_tpu.data.dataset import ClipDataset
from advise_tpu.data.device_aug import build_device_aug, ingest_geometry
from advise_tpu.data.loader import ClipLoader
from advise_tpu.data.prefetch import device_put_batch, prefetch_to_device

__all__ = [
    "build_sampler",
    "build_dataset",
    "build_loader",
    "build_device_aug",
    "ingest_geometry",
    "prefetch_to_device",
    "device_put_batch",
    "ClipDataset",
    "ClipLoader",
]


def build_sampler(cfg, mode: str = "train"):
    """Sampler dispatch (reference build_spl_func, datasets/__init__.py:105)."""
    if mode == "train":
        if cfg.TASK == "speed":
            return spl.SpeedClipSampler(
                num_clips=cfg.DATA.NUM_CLIP,
                num_frames=cfg.DATA.NUM_FRAMES,
                stride=cfg.DATA.STRIDE,
                speed_range=cfg.SSL.RANGE,
                jitter=cfg.SSL.JITTER,
                method=cfg.SSL.METHOD,
            )
        if cfg.TASK == "tmodeling":
            return spl.TemporalModelingSampler(
                num_clips=cfg.DATA.NUM_CLIP,
                num_frames=cfg.DATA.NUM_FRAMES,
                stride=cfg.DATA.STRIDE,
                speed_range=cfg.SSL.RANGE,
                jitter=cfg.SSL.JITTER,
                method=cfg.SSL.METHOD,
            )
        if cfg.TASK in ("action_recog", "contrastive", "masked"):
            return spl.UniformClipSampler(
                num_clips=cfg.DATA.NUM_CLIP,
                num_frames=cfg.DATA.NUM_FRAMES,
                stride=cfg.DATA.STRIDE,
            )
        raise NotImplementedError(f"TASK={cfg.TASK}")
    if mode == "speed":
        return spl.SpeedValSampler(
            num_frames=cfg.VAL.NUM_FRAME,
            stride=cfg.VAL.STRIDE,
            speed_range=cfg.VAL.RANGE,
            jitter=cfg.VAL.JITTER,
            fps=cfg.VAL.FPS,
        )
    if mode == "action":
        return spl.InferenceClipSampler(
            num_clips=cfg.INFER.NUM_CLIPS,
            num_crops=cfg.INFER.NUM_CROPS,
            num_frames=cfg.INFER.NUM_FRAMES,
            stride=cfg.INFER.STRIDE,
            jitter=cfg.INFER.JITTER,
            method=cfg.INFER.SAMPLE_METHOD,
        )
    raise NotImplementedError(f"mode={mode}")


def _mode_cfg(cfg, mode: str):
    if mode == "speed":
        return cfg.VAL.DATADIR, cfg.VAL.LABELDIR, cfg.VAL.SPLITFILE
    if mode == "action":
        return cfg.INFER.DATADIR, cfg.INFER.LABELDIR, cfg.INFER.SPLITFILE
    return cfg.DATA.DATADIR, cfg.DATA.LABELDIR, cfg.DATA.SPLITFILE


def build_dataset(cfg, mode: str = "train") -> ClipDataset:
    data_dir, label_dir, split = _mode_cfg(cfg, mode)
    host_aug = None
    if mode == "train" and not cfg.TPU.DEVICE_AUG:
        from advise_tpu.data.host_aug import build_host_aug

        host_aug = build_host_aug(cfg, mode)
    mask_gen = None
    if mode == "train" and cfg.TASK == "masked" and not cfg.MASK.MAE_RND_MASK:
        # MASK.MAE_RND_MASK=False (reference masked.py:350,552): masks
        # come from the loader's blockwise generator at the token grid
        from advise_tpu.data.masking import MaskingGenerator3D

        pt, ph, pw = cfg.MVIT.PATCH_STRIDE
        grid = (
            max(cfg.DATA.NUM_FRAMES // pt, 1),
            cfg.AUG.TARGET_SIZE // ph,
            cfg.AUG.TARGET_SIZE // pw,
        )
        total = grid[0] * grid[1] * grid[2]
        mask_gen = MaskingGenerator3D(
            grid,
            int(round(cfg.AUG.MASK_RATIO * total)),
            max_num_patches=(cfg.AUG.MAX_MASK_PATCHES_PER_BLOCK or None),
        )
    return ClipDataset(
        name=cfg.DATA.DATASET,
        data_dir=data_dir,
        label_dir=label_dir,
        split_name=split,
        sampler=build_sampler(cfg, mode),
        host_aug=host_aug,
        ingest_wh=ingest_geometry(cfg, mode),
        backend=cfg.DATA.DECODE_BACKEND,
        synthetic_size=cfg.DATA.SYNTHETIC_SIZE,
        synthetic_length=cfg.DATA.SYNTHETIC_LENGTH,
        synthetic_res=cfg.DATA.SYNTHETIC_RES,
        synthetic_num_classes=cfg.DATA.SYNTHETIC_NUM_CLASSES,
        synthetic_motion=cfg.DATA.SYNTHETIC_MOTION,
        synthetic_class_coded=cfg.DATA.SYNTHETIC_CLASS_CODED,
        mask_gen=mask_gen,
    )


def build_loader(cfg, mode: str = "train") -> ClipLoader:
    """Host loader (reference build_loader, datasets/__init__.py:249-303).

    Batch size follows the reference meaning: BATCHSIZE_PER_GPU x device
    count is the global batch; this host loads global_batch / process_count.
    """
    dataset = build_dataset(cfg, mode)
    if mode == "train":
        per_dev, workers, shuffle, drop_last = (
            cfg.DATA.BATCHSIZE_PER_GPU,
            cfg.DATA.WORKERS,
            True,
            True,
        )
    elif mode == "speed":
        per_dev, workers, shuffle, drop_last = (
            cfg.VAL.BATCHSIZE_PER_GPU,
            cfg.VAL.WORKERS,
            False,
            False,
        )
    else:
        per_dev, workers, shuffle, drop_last = (
            cfg.INFER.BATCHSIZE_PER_GPU,
            cfg.INFER.WORKERS,
            False,
            False,
        )
    from advise_tpu.parallel.mesh import batch_device_count

    global_batch = per_dev * batch_device_count(cfg)
    local_batch = max(global_batch // jax.process_count(), 1)
    return ClipLoader(
        dataset,
        batch_size=local_batch,
        shuffle=shuffle,
        seed=cfg.TRAIN.SEED,
        num_workers=workers,
        drop_last=drop_last,
        rank=jax.process_index(),
        world=jax.process_count(),
    )
