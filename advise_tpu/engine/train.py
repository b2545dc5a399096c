"""Trainer: the epoch/iteration loop.

Reference: ``tools/train.py:250-344``. Differences are the SPMD shape of
the work: a single process drives the mesh, the per-iteration python is
only {host-load -> device_put (prefetched) -> one jitted step -> meters};
aug/forward/backward/optimizer/collectives all live inside the step.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.data import build_device_aug, build_loader
from advise_tpu.data.prefetch import device_put_batch
from advise_tpu.engine.checkpoint import CheckpointManager, auto_resume
from advise_tpu.engine.meters import TrainingHelper
from advise_tpu.engine.state import TrainState, param_count
from advise_tpu.engine.steps import make_train_step
from advise_tpu.models import build_model
from advise_tpu.parallel import build_mesh
from advise_tpu.parallel.mesh import batch_device_count
from advise_tpu.solver import adjust_base_lr, build_tx, get_lr_at_epoch
from advise_tpu.solver.lr_policy import PlateauController

logger = logging.getLogger(__name__)

# infos fields each task needs on device
TASK_INFO_FIELDS = {
    "speed": ("spd_label",),
    "action_recog": ("cls_id",),
    "tmodeling": ("spd_label", "speeds"),
    "contrastive": ("item_id",),
    "masked": ("mask",),
}


def select_infos(cfg, infos: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        # cls_id feeds the epoch-end online kNN probe
        fields = ("item_id", "time_idx", "cls_id")
    else:
        fields = TASK_INFO_FIELDS.get(cfg.TASK, ())
    return {k: infos[k] for k in fields if k in infos}


def build_train_state(cfg, model_init, tx, rng) -> TrainState:
    t = cfg.DATA.NUM_FRAMES
    s = cfg.AUG.TARGET_SIZE
    sample = jnp.zeros((1, t, s, s, 3), jnp.float32)
    init_kwargs = {}
    if cfg.MODEL.MODEL_NAME == "TemporalModel":
        # touch BYOL heads too so the full param tree materializes
        init_kwargs["method"] = "init_all"
    variables = jax.jit(
        lambda: model_init.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            sample,
            train=False,
            **init_kwargs,
        )
    )()
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def trainer(cfg, tb_logger=None) -> TrainState:
    """(reference tools/train.py trainer :290-344)."""
    mesh = build_mesh(cfg)
    cfg.NUM_WORLDS = batch_device_count(cfg, int(mesh.devices.size))
    adjust_base_lr(cfg)

    loader = build_loader(cfg, "train")
    # model twin pair: same params, BN sync axes only matter inside shard_map
    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    rng = jax.random.PRNGKey(cfg.TRAIN.SEED)
    bundle = None
    state = None

    state = build_train_state(cfg, model_init, _TxProxy(), rng)  # placeholder
    # build_tx needs params; rebuild state with the real tx
    bundle = build_tx(cfg, state.params)
    state = state.replace(opt_state=bundle.tx.init(state.params))
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        from advise_tpu.engine.contrastive import (
            init_ssl_state,
            knn_labels_from_dataset,
        )

        ssl = init_ssl_state(
            cfg, state.params, state.batch_stats, jax.random.fold_in(rng, 7)
        )
        if cfg.CONTRASTIVE.KNN_ON:
            # label bank for the online kNN monitor (reference
            # init_knn_labels, models/contrastive.py:143-149)
            ssl["knn_labels"] = knn_labels_from_dataset(
                loader.dataset, cfg.CONTRASTIVE.LENGTH
            )
        state = state.replace(ssl=ssl)
    elif cfg.MODEL.MODEL_NAME == "TemporalModel":
        from advise_tpu.engine.steps import init_tmodeling_ssl

        if cfg.MODEL.SPATIAL_MODEL_PATH:
            # reference temporal_modeling.py:16-43 load_spatial_model:
            # the frozen CLIP tower's weights come from
            # MODEL.SPATIAL_MODEL_PATH/open_clip_pytorch_model.bin
            from advise_tpu.models.clip_vit import load_openclip_weights

            wp = cfg.MODEL.SPATIAL_MODEL_PATH
            if os.path.isdir(wp):
                wp = os.path.join(wp, "open_clip_pytorch_model.bin")
            if not os.path.exists(wp):
                raise FileNotFoundError(
                    f"MODEL.SPATIAL_MODEL_PATH: no checkpoint at {wp}"
                )
            params = dict(state.params)
            params["spatial_encoder"] = load_openclip_weights(
                wp, dict(params["spatial_encoder"])
            )
            state = state.replace(params=params)
            logger.info("loaded open_clip visual tower from %s", wp)
        state = state.replace(ssl=init_tmodeling_ssl(cfg, state.params))
    logger.info("model %s params: %s", cfg.MODEL.MODEL_NAME, f"{param_count(state.params):,}")

    ckpt = CheckpointManager(cfg)
    state, start_epoch, resumed = auto_resume(cfg, ckpt, state)
    if not resumed and cfg.RESUME:
        # top-level RESUME = fine-tune / linear-probe init from a pretrain
        # checkpoint (reference tools/train.py:316-319 + utils/misc.py
        # training_resume non-strict branch): backbone params + BN stats
        # only, head/optimizer/step fresh
        from advise_tpu.engine.checkpoint import load_pretrained

        state, _, _ = load_pretrained(cfg.RESUME, state)

    if cfg.TPU.PARTITION_MODE == "auto":
        from advise_tpu.parallel.auto_shard import (
            describe_sharding,
            shard_train_state,
        )

        state, specs = shard_train_state(
            cfg, mesh, state, bundle, reinit_opt=not resumed
        )
        logger.info(describe_sharding(state.params, specs))

    device_aug = build_device_aug(cfg, "train") if cfg.TPU.DEVICE_AUG else None
    step_fn = make_train_step(cfg, mesh, model, bundle, device_aug)

    knn_probe_fn = None
    if (
        cfg.MODEL.MODEL_NAME == "ContrastiveModel"
        and cfg.CONTRASTIVE.KNN_ON
        and cfg.CONTRASTIVE.KNN_EVAL_BATCHES > 0
    ):
        from advise_tpu.engine.steps import make_knn_probe_step

        knn_probe_fn = make_knn_probe_step(
            cfg, mesh, model, device_aug,
            num_classes=int(np.asarray(state.ssl["knn_labels"]).max()) + 1,
        )

    helper = TrainingHelper(cfg, tb_logger)
    plateau = (
        PlateauController(cfg.SOLVER.BASE_LR)
        if cfg.SOLVER.LR_POLICY == "plateau"
        else None
    )

    for epoch in range(start_epoch, cfg.SOLVER.MAX_EPOCH):
        epoch_iters = loader.steps_per_epoch(epoch)
        helper.epoch_start(epoch, epoch_iters)
        # TPU.PREFETCH: keep N async H2D transfers in flight so the next
        # batch's DMA overlaps the current step (prefetch_to_device);
        # <=1 falls back to a synchronous per-iteration device_put
        n_prefetch = int(getattr(cfg.TPU, "PREFETCH", 2) or 0)
        batches = (
            (clips, select_infos(cfg, infos))
            for clips, infos in loader.epoch(epoch)
        )
        if n_prefetch > 1:
            from advise_tpu.data.prefetch import prefetch_to_device

            device_iter = prefetch_to_device(batches, mesh, size=n_prefetch)
        else:
            device_iter = (device_put_batch(mesh, c, i) for c, i in batches)
        for it, (clips_d, infos_d) in enumerate(device_iter):
            helper.iter_start()
            epoch_exact = epoch + (it + 1) / max(epoch_iters, 1)
            if plateau is not None and epoch_exact > cfg.SOLVER.WARMUP_EPOCHS:
                lr = plateau.lr
            else:
                lr = get_lr_at_epoch(cfg, epoch_exact)
            helper.rt["curr_lr"] = lr
            step_rng = jax.random.fold_in(rng, epoch * 100003 + it)
            if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
                state, stats = step_fn(
                    state, clips_d, infos_d, step_rng, jnp.float32(lr),
                    jnp.float32(epoch_exact),
                )
            else:
                state, stats = step_fn(
                    state, clips_d, infos_d, step_rng, jnp.float32(lr)
                )
            helper.update_stats({k: np.asarray(v) for k, v in stats.items()})
            helper.iter_end(it)
            _maybe_profile(cfg, int(state.step))
        if knn_probe_fn is not None:
            accs = []
            probe_iter = loader.epoch(epoch + 999983)  # fresh shuffle stream
            # Dedicated probe key stream, disjoint from the train step's
            # fold_in(rng, epoch*100003+it) stream, folded per batch so
            # each probe batch draws independent aug parameters.
            probe_rng = jax.random.fold_in(rng, 2**31 - 1 - epoch)
            for i, (clips, infos) in zip(
                range(cfg.CONTRASTIVE.KNN_EVAL_BATCHES), probe_iter
            ):
                clips_d, infos_d = device_put_batch(
                    mesh, clips, select_infos(cfg, infos)
                )
                acc = knn_probe_fn(
                    state.params, state.batch_stats, state.ssl,
                    clips_d, infos_d, jax.random.fold_in(probe_rng, i),
                )
                accs.append(float(acc))
            helper.rt["knn_acc"] = float(np.mean(accs))
            logger.info(
                "epoch %d online kNN top-1: %.4f (%d batches)",
                epoch, helper.rt["knn_acc"], len(accs),
            )
        if cfg.VIS_MASK.ENABLE and cfg.MODEL.MODEL_NAME == "MaskMViT":
            # reference masked.py:464-540: dump (input|masked|recon)
            # comparison videos; done here on ONE batch so the hot step
            # never carries the videos
            from advise_tpu.utils.visualization import (
                dump_mask_visualization,
            )

            vis_batch = loader.take_one(epoch + 424243)
            if vis_batch is not None:
                vis_clips, _ = vis_batch
                dump_mask_visualization(
                    cfg, model_init, state.params, state.batch_stats,
                    jnp.asarray(vis_clips), device_aug,
                    jax.random.fold_in(rng, 424243 + epoch), epoch,
                )
        summary = helper.epoch_end()
        if knn_probe_fn is not None:
            summary["knn_acc"] = helper.rt["knn_acc"]
        if plateau is not None:
            crit = summary.get("loss_spd", summary.get("loss_cls", 0.0))
            plateau.step(crit)
        ckpt.save(state, epoch, summary)
    return state


_PROFILE_ACTIVE = [False]


def _maybe_profile(cfg, step: int):
    """jax.profiler trace window over training steps (SURVEY §5: the
    reference had wall-clock meters only; this adds real device traces).
    Called after each step with the post-increment step counter."""
    if not cfg.TPU.PROFILE_DIR:
        return
    # post-increment counters run 1..N; the window covers steps
    # (PROFILE_START, PROFILE_START + PROFILE_STEPS]
    start = cfg.TPU.PROFILE_START
    end = start + cfg.TPU.PROFILE_STEPS
    if not _PROFILE_ACTIVE[0] and start < step <= end:
        jax.profiler.start_trace(cfg.TPU.PROFILE_DIR)
        _PROFILE_ACTIVE[0] = True
        logger.info("profiler trace started -> %s", cfg.TPU.PROFILE_DIR)
    elif _PROFILE_ACTIVE[0] and step > end:
        jax.profiler.stop_trace()
        _PROFILE_ACTIVE[0] = False
        logger.info("profiler trace stopped")


class _TxProxy:
    """init-only stand-in so state can be created before build_tx sees the
    params; replaced immediately after."""

    def init(self, params):
        return ()
