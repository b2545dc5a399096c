"""Jitted SPMD train/eval steps.

One ``jit(shard_map(...))`` program per task (reference: the per-iteration
python in ``tools/train.py:27-287``). Inside the per-device function:

  device aug (fused)  ->  forward  ->  loss  ->  grad  ->  pmean(grads)
  ->  optimizer direction  ->  params update

The gradient pmean over BATCH_AXES is the DDP allreduce; BN layers psum
their statistics over the sync axis internally. The whole chain compiles
into a single XLA program per step — aug, compute, and collectives fuse,
which is the performance thesis of this rebuild (SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from advise_tpu.engine.state import TrainState
from advise_tpu.models import losses as L
from advise_tpu.parallel.collectives import pmean_tree, replica_index
from advise_tpu.parallel.mesh import BATCH_AXES
from advise_tpu.solver.optimizer import apply_direction, global_grad_norm


def _apply_model(model, params, batch_stats, x, rng, train):
    """Forward with batch_stats mutation in train mode."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        return out, mutated.get("batch_stats", batch_stats)
    return model.apply(variables, x, train=False), batch_stats


def speed_task_loss(cfg, model, params, batch_stats, clips, infos, rng, train=True):
    """Speed-pretext loss (reference tools/train.py output_handler for
    TASK='speed': CE or smoothed-BCE over speed logits + acc@1).

    clips: [B, K, T, H, W, C] normalized; labels infos['spd_label'] [B, K].
    The reference flattens clips into the batch (tools/train.py:56-61).
    """
    b, k = clips.shape[:2]
    x = clips.reshape(b * k, *clips.shape[2:])
    labels = infos["spd_label"].reshape(b * k)
    logits, new_bs = _apply_model(model, params, batch_stats, x, rng, train)
    # one metric per (SSL.STAT, SSL.METRIC) pair, keyed by the STAT name
    # (reference metrics_init, tools/train.py:94-116); the backward loss
    # is metrics['loss_spd'] BY NAME, exactly like the reference's
    # output_handler lookup (:147-156)
    stats = {}
    for stat, met in zip(cfg.SSL.STAT, cfg.SSL.METRIC):
        if met == "ce":
            if cfg.SSL.SMOOTHING > 0:
                c = logits.shape[-1]
                soft = (
                    jax.nn.one_hot(labels, c) * (1.0 - cfg.SSL.SMOOTHING)
                    + cfg.SSL.SMOOTHING / c
                )
                stats[stat] = L.soft_cross_entropy(logits, soft)
            else:
                stats[stat] = L.cross_entropy(logits, labels)
        elif met in ("bce_logit", "smoothing_bce_logit"):
            onehot = jax.nn.one_hot(labels, logits.shape[-1])
            stats[stat] = L.bce_logit(
                logits, onehot,
                smoothing=(
                    cfg.SSL.SMOOTHING if met == "smoothing_bce_logit" else 0.0
                ),
            )
        elif met == "margin":
            # reference :104-105 hardcodes mode='intra' and SSL.MARGIN
            stats[stat] = L.margin_ranking_intra(
                logits.reshape(b, k, -1),
                infos["spd_label"].reshape(b, k),
                margin=cfg.SSL.MARGIN,
            )
        elif met == "acc@1":
            stats[stat] = L.top_k_accuracy(logits, labels, k=1)
        elif met == "acc@5":
            stats[stat] = L.top_k_accuracy(logits, labels, k=5)
        else:
            # 'mse'/'contrastive_loss' are constructible in the reference
            # metrics_init but shape-error in its speed output_handler
            raise NotImplementedError(f"SSL.METRIC={met!r} for TASK=speed")
    loss = stats["loss_spd"]
    return loss, (new_bs, stats)


def action_task_loss(cfg, model, params, batch_stats, clips, infos, rng, train=True):
    """Action recognition / linear probe (reference output_handler for
    TASK='action_recog': CE + acc@1/acc@5)."""
    b, k = clips.shape[:2]
    x = clips.reshape(b * k, *clips.shape[2:])
    labels = jnp.repeat(infos["cls_id"].reshape(b), k)
    out, new_bs = _apply_model(model, params, batch_stats, x, rng, train)
    loss = L.cross_entropy(out, labels)
    stats = {
        "loss_cls": loss,
        "acc@1": L.top_k_accuracy(out, labels, 1),
        "acc@5": L.top_k_accuracy(out, labels, 5),
    }
    return loss, (new_bs, stats)


def masked_task_loss(cfg, model, params, batch_stats, clips, infos, rng, train=True):
    """Masked prediction (MAE/MaskFeat): weighted masked MSE over the
    pretrain depths (reference MultipleMSELoss applied to MaskMViT
    outputs). With MASK.JOINT_CONTRASTIVE (config #5 groundwork, no
    reference equivalent) an NT-Xent term between the two views' pooled
    projections — negatives gathered across the mesh — joins the loss."""
    from advise_tpu.models.masked import masked_mse

    b, k = clips.shape[:2]
    x = clips.reshape(b * k, *clips.shape[2:])
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": rng, "mask": jax.random.fold_in(rng, 13)}
    # MASK.MAE_RND_MASK=False: loader-generated blockwise token masks
    # ride in infos['mask'] [B, K, t, h, w] (reference masked.py:550-560
    # "take masks and labels from loader")
    lm = infos.get("mask")
    if lm is not None:
        lm = lm.reshape(b * k, -1)
    extra = {"loader_mask": lm} if lm is not None else {}
    if train:
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"], rngs=rngs,
            **extra,
        )
        new_bs = mutated.get("batch_stats", batch_stats)
    else:
        out = model.apply(variables, x, train=False, rngs=rngs, **extra)
        new_bs = batch_stats
    joint = cfg.MASK.JOINT_CONTRASTIVE
    if joint:
        preds, labels, masks, weights, proj = out
    elif cfg.VIS_MASK.ENABLE:
        # the model also returns the (input, masked, recon) videos for
        # the offline VIS_MASK dump; the train step drops them (dead
        # outputs cost nothing under XLA DCE)
        preds, labels, masks, weights, _vis = out
    else:
        preds, labels, masks, weights = out
    loss = 0.0
    for p, l, m, w in zip(preds, labels, masks, weights):
        loss = loss + w * masked_mse(p, l, m)
    stats = {"loss_mask": loss}
    if joint:
        assert k >= 2, "MASK.JOINT_CONTRASTIVE needs DATA.NUM_CLIP >= 2"
        from advise_tpu.engine.contrastive import batch_axes, l2_normalize
        from advise_tpu.parallel.collectives import all_gather_cat

        proj_bk = proj.reshape(b, k, -1)
        q1 = l2_normalize(proj_bk[:, 0].astype(jnp.float32))
        q2 = l2_normalize(proj_bk[:, 1].astype(jnp.float32))
        if train:
            q1g = all_gather_cat(q1, batch_axes(cfg))
            q2g = all_gather_cat(q2, batch_axes(cfg))
        else:
            q1g, q2g = q1, q2
        t = cfg.CONTRASTIVE.T
        cat = jnp.concatenate([q1g, q2g], axis=0)  # [2B_g, dim]
        sim = jnp.exp(cat @ cat.T / t)
        mask_diag = 1.0 - jnp.eye(sim.shape[0], dtype=sim.dtype)
        denom = jnp.sum(sim * mask_diag, axis=-1)
        pos = jnp.exp(jnp.sum(q1g * q2g, axis=-1) / t)
        pos = jnp.concatenate([pos, pos], axis=0)
        loss_nce = (-jnp.log(pos / denom)).mean()
        loss = loss + cfg.MASK.JOINT_WEIGHT * loss_nce
        stats = {
            "loss_mask": stats["loss_mask"],
            "loss_nce": loss_nce,
            "loss_total": loss,
        }
    return loss, (new_bs, stats)


TASK_LOSSES: Dict[str, Callable] = {
    "speed": speed_task_loss,
    "action_recog": action_task_loss,
    "masked": masked_task_loss,
}


def make_train_step(cfg, mesh, model, bundle, device_aug: Optional[Callable]):
    """Build the jitted SPMD train step.

    Signature: (state, clips_u8, infos, rng, lr) -> (state, stats)
    clips_u8 is the raw loader batch (uint8, ingest geometry), sharded on
    dim 0 over the whole mesh; aug runs on device inside the step.

    ContrastiveModel routes to the SSL step (reference tools/train.py:63-77
    dispatches on the model class the same way).
    """
    if cfg.TPU.PARTITION_MODE == "auto":
        return make_auto_train_step(cfg, mesh, model, bundle, device_aug)
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        return make_contrastive_train_step(cfg, mesh, model, bundle, device_aug)
    if cfg.MODEL.MODEL_NAME == "TemporalModel":
        return make_tmodeling_train_step(cfg, mesh, model, bundle, device_aug)
    if cfg.MODEL.MODEL_NAME == "MaskMViT":
        task_loss = masked_task_loss
    else:
        task_loss = TASK_LOSSES[cfg.TASK]
    compute_dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32

    def per_device(state: TrainState, clips_u8, infos, rng, lr):
        my = replica_index(BATCH_AXES)
        rng = jax.random.fold_in(jax.random.fold_in(rng, my), state.step)
        aug_rng, drop_rng = jax.random.split(rng)
        if device_aug is not None:
            clips = device_aug(clips_u8, aug_rng)
        else:
            clips = clips_u8
        clips = clips.astype(compute_dtype)

        if cfg.TRAIN.SEQUENTIAL and clips.shape[1] > 1:
            # sequential clip micro-batching (reference TRAIN.SEQUENTIAL,
            # tools/train.py:32-50): process one clip at a time under
            # lax.scan — peak activation memory of a single clip, grads
            # averaged over clips. The TPU memory-axis substitute for the
            # reference's per-sub-batch backward calls.
            k = clips.shape[1]
            kv = {key: jnp.swapaxes(v, 0, 1) for key, v in infos.items()
                  if hasattr(v, "ndim") and v.ndim >= 2}

            def scan_body(carry, xs):
                grads_acc, loss_acc, bs = carry
                clip_i, infos_i = xs

                def loss_fn(params):
                    return task_loss(
                        cfg, model, params, bs, clip_i[:, None],
                        {**infos, **{key: v[:, None] for key, v in infos_i.items()}},
                        drop_rng, train=True,
                    )

                (l, (new_bs_i, st)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, loss_acc + l, new_bs_i), st

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, loss, new_bs), stats_seq = jax.lax.scan(
                scan_body,
                (zero_grads, jnp.float32(0.0), state.batch_stats),
                (jnp.swapaxes(clips, 0, 1), kv),
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            stats = jax.tree_util.tree_map(lambda v: v.mean(), stats_seq)
        else:
            def loss_fn(params):
                return task_loss(
                    cfg, model, params, state.batch_stats, clips, infos,
                    drop_rng, train=True,
                )

            (loss, (new_bs, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        grads = pmean_tree(grads, BATCH_AXES)
        stats = pmean_tree(stats, BATCH_AXES)
        stats["grad_norm"] = global_grad_norm(grads)
        direction, new_opt = bundle.tx.update(grads, state.opt_state, state.params)
        new_params = apply_direction(
            state.params, direction, lr, bundle.lr_scales
        )
        # batch_stats: running stats may differ across sync groups (the
        # reference keeps them per-replica too); average over the world so
        # the replicated state stays consistent.
        new_bs = pmean_tree(new_bs, BATCH_AXES)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, stats

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P(),  # state replicated
            P(BATCH_AXES),  # clips sharded on batch
            P(BATCH_AXES),  # infos sharded on batch
            P(),  # rng
            P(),  # lr
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if cfg.TPU.DONATE else ())


def make_auto_train_step(cfg, mesh, model, bundle, device_aug):
    """GSPMD train step (TPU.PARTITION_MODE='auto').

    Written over logically GLOBAL arrays under plain ``jax.jit``: params
    carry NamedShardings (tensor-parallel 'model' axis + optional FSDP,
    ``parallel/auto_shard.py``), the batch is sharded over 'data', and
    XLA's partitioner inserts every collective — grad reduce-scatters,
    qkv/MLP all-reduces, the BN batch reduction (which therefore spans
    the global batch: BN.GLOBAL_SYNC semantics). The explicit collective
    helpers degenerate to identities via ``contrastive.batch_axes``.

    Same signatures as the shard_map builders: contrastive gets the extra
    ``epoch_exact`` scalar.
    """
    from advise_tpu.engine.contrastive import (
        CONTRASTIVE_LOSSES,
        momentum_at,
        update_ema,
    )
    from advise_tpu.parallel.auto_shard import constrain_params

    assert not cfg.TRAIN.SEQUENTIAL, (
        "TRAIN.SEQUENTIAL clip micro-batching is a shard_map-path memory "
        "lever; use TPU.REMAT / TPU.FSDP in auto mode"
    )
    assert not cfg.CONTRASTIVE.SEQUENTIAL, (
        "CONTRASTIVE.SEQUENTIAL is a shard_map-path memory lever; use "
        "TPU.REMAT / TPU.FSDP in auto mode"
    )
    compute_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )
    contrastive = cfg.MODEL.MODEL_NAME == "ContrastiveModel"
    tmodeling = cfg.MODEL.MODEL_NAME == "TemporalModel"
    if contrastive:
        algo = CONTRASTIVE_LOSSES[cfg.CONTRASTIVE.TYPE]
    elif tmodeling:
        pass  # tmodeling_loss below
    elif cfg.MODEL.MODEL_NAME == "MaskMViT":
        task_loss = masked_task_loss
    else:
        task_loss = TASK_LOSSES[cfg.TASK]
    donate = (0,) if cfg.TPU.DONATE else ()

    def finish(state, loss_fn, lr):
        (loss, (new_bs, new_ssl, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        stats["grad_norm"] = global_grad_norm(grads)
        direction, new_opt = bundle.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = apply_direction(
            state.params, direction, lr, bundle.lr_scales
        )
        return state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            ssl=new_ssl,
        ), stats

    if contrastive:
        def step(state: TrainState, clips_u8, infos, rng, lr, epoch_exact):
            state = state.replace(
                params=constrain_params(state.params, mesh, cfg.TPU.FSDP)
            )
            rng = jax.random.fold_in(rng, state.step)
            aug_rng, drop_rng = jax.random.split(rng)
            clips = (
                device_aug(clips_u8, aug_rng)
                if device_aug is not None else clips_u8
            ).astype(compute_dtype)
            views = [clips[:, i] for i in range(clips.shape[1])]
            ssl = state.ssl
            if "ema_params" in ssl:
                m = momentum_at(cfg, epoch_exact)
                ssl = update_ema(ssl, state.params, state.batch_stats, m)
            infos = dict(infos)
            infos["epoch_exact"] = epoch_exact

            def loss_fn(params):
                loss, new_bs, new_ssl, stats = algo(
                    cfg, model, params, state.batch_stats, ssl, views,
                    infos, drop_rng,
                )
                return loss, (new_bs, new_ssl, stats)

            return finish(state, loss_fn, lr)
    elif tmodeling:
        use_byol = "byol" in cfg.SSL.TASK

        def step(state: TrainState, clips_u8, infos, rng, lr):
            state = state.replace(
                params=constrain_params(state.params, mesh, cfg.TPU.FSDP)
            )
            rng = jax.random.fold_in(rng, state.step)
            aug_rng, drop_rng = jax.random.split(rng)
            clips = (
                device_aug(clips_u8, aug_rng)
                if device_aug is not None else clips_u8
            ).astype(compute_dtype)
            ssl = state.ssl
            if use_byol:
                ssl = update_tmodeling_ema(cfg, ssl, state.params)

            def loss_fn(params):
                loss, (new_bs, stats) = tmodeling_loss(
                    cfg, model, params, state.batch_stats, ssl, clips,
                    infos, drop_rng,
                )
                return loss, (new_bs, ssl, stats)

            return finish(state, loss_fn, lr)
    else:
        def step(state: TrainState, clips_u8, infos, rng, lr):
            state = state.replace(
                params=constrain_params(state.params, mesh, cfg.TPU.FSDP)
            )
            rng = jax.random.fold_in(rng, state.step)
            aug_rng, drop_rng = jax.random.split(rng)
            clips = (
                device_aug(clips_u8, aug_rng)
                if device_aug is not None else clips_u8
            ).astype(compute_dtype)

            def loss_fn(params):
                loss, (new_bs, stats) = task_loss(
                    cfg, model, params, state.batch_stats, clips, infos,
                    drop_rng, train=True,
                )
                return loss, (new_bs, state.ssl, stats)

            return finish(state, loss_fn, lr)

    return jax.jit(step, donate_argnums=donate)


def make_contrastive_train_step(
    cfg, mesh, model, bundle, device_aug: Optional[Callable]
):
    """SSL train step: EMA update -> algorithm loss -> psum grads ->
    optimizer. infos must carry 'item_id'; epoch_exact rides in as a
    scalar for momentum annealing and the SwAV queue gate (the reference
    threads it through contrastive_forward, contrastive.py:1119)."""
    from advise_tpu.engine.contrastive import (
        CONTRASTIVE_LOSSES,
        momentum_at,
        update_ema,
    )

    algo = CONTRASTIVE_LOSSES[cfg.CONTRASTIVE.TYPE]
    compute_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )

    def per_device(state: TrainState, clips_u8, infos, rng, lr, epoch_exact):
        my = replica_index(BATCH_AXES)
        rng = jax.random.fold_in(jax.random.fold_in(rng, my), state.step)
        aug_rng, drop_rng = jax.random.split(rng)
        clips = device_aug(clips_u8, aug_rng) if device_aug is not None else clips_u8
        clips = clips.astype(compute_dtype)
        views = [clips[:, i] for i in range(clips.shape[1])]

        ssl = state.ssl
        if "ema_params" in ssl:
            m = momentum_at(cfg, epoch_exact)
            ssl = update_ema(ssl, state.params, state.batch_stats, m)
        infos = dict(infos)
        infos["epoch_exact"] = epoch_exact

        if cfg.CONTRASTIVE.SEQUENTIAL:
            # per-clip query forward+backward with precomputed keys
            # (reference contrastive_forward :1120-1167) — the memory
            # lever: peak activations of ONE view
            from advise_tpu.engine.contrastive import (
                sequential_contrastive_grads,
            )

            grads, loss, new_bs, new_ssl, stats = (
                sequential_contrastive_grads(
                    cfg, model, state.params, state.batch_stats, ssl,
                    views, infos, drop_rng,
                )
            )
        else:
            def loss_fn(params):
                loss, new_bs, new_ssl, stats = algo(
                    cfg, model, params, state.batch_stats, ssl, views, infos,
                    drop_rng,
                )
                return loss, (new_bs, new_ssl, stats)

            (loss, (new_bs, new_ssl, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        grads = pmean_tree(grads, BATCH_AXES)
        stats = pmean_tree(stats, BATCH_AXES)
        stats["grad_norm"] = global_grad_norm(grads)
        direction, new_opt = bundle.tx.update(grads, state.opt_state, state.params)
        new_params = apply_direction(state.params, direction, lr, bundle.lr_scales)
        new_bs = pmean_tree(new_bs, BATCH_AXES)
        if "ema_batch_stats" in new_ssl:
            # the momentum encoder's BN running stats accumulate per device
            # (each saw different keys); average so the replicated ssl state
            # stays bit-identical across the mesh
            new_ssl = dict(new_ssl)
            new_ssl["ema_batch_stats"] = pmean_tree(
                new_ssl["ema_batch_stats"], BATCH_AXES
            )
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            ssl=new_ssl,
        )
        return new_state, stats

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(BATCH_AXES), P(BATCH_AXES), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if cfg.TPU.DONATE else ())


def init_tmodeling_ssl(cfg, params) -> Dict[str, Any]:
    """EMA twins for the AdViSe BYOL branch (reference
    temporal_modeling.py:217-238): temporal encoder + projector copies."""
    if "byol" not in cfg.SSL.TASK:
        return {}
    return {
        "ema_temporal": jax.tree_util.tree_map(
            jnp.copy, params["temporal_encoder"]
        ),
        "ema_projector": jax.tree_util.tree_map(
            jnp.copy, params["head_projector"]
        ),
    }


def update_tmodeling_ema(cfg, ssl, params):
    """EMA update of the AdViSe BYOL twins (reference
    temporal_modeling.py:217-238, constant momentum)."""
    m = cfg.CONTRASTIVE.MOMENTUM
    ssl = dict(ssl)
    ssl["ema_temporal"] = jax.tree_util.tree_map(
        lambda h, p: h * m + p * (1.0 - m),
        ssl["ema_temporal"],
        params["temporal_encoder"],
    )
    ssl["ema_projector"] = jax.tree_util.tree_map(
        lambda h, p: h * m + p * (1.0 - m),
        ssl["ema_projector"],
        params["head_projector"],
    )
    return ssl


def tmodeling_loss(cfg, model, params, batch_stats, ssl, clips, infos, rng):
    """AdViSe loss: frozen-CLIP features -> temporal head; speed CE and/or
    BYOL contrast against the EMA twins (reference tools/train.py:79-88 +
    temporal_modeling.py forward :377-392; the +1/T loss offset kept).
    Shared by the shard_map and auto (GSPMD) step builders."""
    from advise_tpu.engine.contrastive import l2_normalize

    use_byol = "byol" in cfg.SSL.TASK
    use_speed = "speed" in cfg.SSL.TASK or "action" in cfg.SSL.TASK
    t_temp = cfg.CONTRASTIVE.T
    b, k = clips.shape[:2]
    variables = {"params": params, "batch_stats": batch_stats}
    flat = clips.reshape(b * k, *clips.shape[2:])
    feats, mutated = model.apply(
        variables, flat, train=True,
        method="features",
        mutable=["batch_stats"],
        rngs={"dropout": rng},
    )
    new_bs = mutated.get("batch_stats", batch_stats)
    loss = 0.0
    stats = {}
    if use_speed:
        # head MLPs may carry their own BN (SSL.BN_MLP, the AdViSe recipe):
        # thread their running-stat mutations through like the trunk's
        logits, mut = model.apply(
            {"params": params, "batch_stats": new_bs},
            feats, train=True, method="classify",
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        new_bs = mut.get("batch_stats", new_bs)
        labels = infos["spd_label"].reshape(b * k)
        loss_spd = L.cross_entropy(logits, labels)
        loss = loss + loss_spd
        stats["loss_spd"] = loss_spd
        stats["acc_spd"] = L.top_k_accuracy(logits, labels, 1)
    if use_byol:
        assert k >= 2, "BYOL tmodeling needs 2 clips"
        # keys: same features with EMA temporal encoder, no grad
        params_ema = dict(params)
        params_ema["temporal_encoder"] = ssl["ema_temporal"]
        keys = model.apply(
            {"params": params_ema, "batch_stats": batch_stats},
            jax.lax.stop_gradient(clips.reshape(b * k, *clips.shape[2:])),
            train=False, method="features",
        )
        keys = jax.lax.stop_gradient(keys.reshape(b, k, -1))
        feats_bk = feats.reshape(b, k, -1)
        params_ema_p = dict(params)
        params_ema_p["head_projector"] = ssl["ema_projector"]
        loss_byol = 0.0
        for i in range(2):
            q, mut = model.apply(
                {"params": params, "batch_stats": new_bs},
                feats_bk[:, i], train=True, method="project",
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            new_bs = mut.get("batch_stats", new_bs)
            q, mut = model.apply(
                {"params": params, "batch_stats": new_bs},
                q, train=True, method="predict",
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            new_bs = mut.get("batch_stats", new_bs)
            k_feat = model.apply(
                {"params": params_ema_p, "batch_stats": batch_stats},
                keys[:, 1 - i], train=False, method="project",
            )
            q = l2_normalize(q)
            k_feat = l2_normalize(jax.lax.stop_gradient(k_feat))
            loss_byol += -(jnp.sum(q * k_feat, axis=-1) / t_temp).mean()
        loss_byol = loss_byol / 2.0 + 1.0 / t_temp
        loss = loss + loss_byol
        stats["loss_byol"] = loss_byol
    return loss, (new_bs, stats)


def make_tmodeling_train_step(cfg, mesh, model, bundle, device_aug):
    """AdViSe step, shard_map path (see :func:`tmodeling_loss`)."""
    compute_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )
    use_byol = "byol" in cfg.SSL.TASK

    def per_device(state: TrainState, clips_u8, infos, rng, lr):
        my = replica_index(BATCH_AXES)
        rng = jax.random.fold_in(jax.random.fold_in(rng, my), state.step)
        aug_rng, drop_rng = jax.random.split(rng)
        clips = device_aug(clips_u8, aug_rng) if device_aug is not None else clips_u8
        clips = clips.astype(compute_dtype)

        ssl = state.ssl
        if use_byol:
            ssl = update_tmodeling_ema(cfg, ssl, state.params)

        def loss_fn(params):
            return tmodeling_loss(
                cfg, model, params, state.batch_stats, ssl, clips, infos,
                drop_rng,
            )

        (loss, (new_bs, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = pmean_tree(grads, BATCH_AXES)
        stats = pmean_tree(stats, BATCH_AXES)
        stats["grad_norm"] = global_grad_norm(grads)
        direction, new_opt = bundle.tx.update(grads, state.opt_state, state.params)
        new_params = apply_direction(state.params, direction, lr, bundle.lr_scales)
        new_bs = pmean_tree(new_bs, BATCH_AXES)
        return state.replace(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            ssl=ssl,
        ), stats

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(BATCH_AXES), P(BATCH_AXES), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if cfg.TPU.DONATE else ())


def make_knn_probe_step(cfg, mesh, model, device_aug: Optional[Callable],
                        num_classes: Optional[int] = None):
    """Epoch-end online kNN monitor (reference eval-mode eval_knn returns,
    models/contrastive.py:233-241 used at :388,:475,:546,:607,:684,:745):
    eval forward of the first view -> l2-normalized projection -> top-k
    vote against ssl['knn_mem'] with ssl['knn_labels'].

    Signature: (params, batch_stats, ssl, clips_u8, infos, rng) -> acc
    (global batch top-1, pmean'd over the mesh)."""
    from advise_tpu.engine.contrastive import (
        _proj_and_preds,
        knn_probe,
        l2_normalize,
    )
    from advise_tpu.parallel.mesh import mesh_batch_axes

    compute_dtype = (
        jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    )
    auto = cfg.TPU.PARTITION_MODE == "auto"
    axes = () if auto else mesh_batch_axes(mesh)
    knn_k = int(cfg.CONTRASTIVE.KNN_K)
    # vote width must cover the DATASET's label range (the trainer passes
    # it from the built label bank); MODEL.NUM_CLASSES is only a fallback
    if num_classes is None:
        num_classes = int(cfg.MODEL.NUM_CLASSES)

    use_batch_stats = bool(cfg.CONTRASTIVE.KNN_BATCH_STATS)
    assert not (use_batch_stats and auto), (
        "CONTRASTIVE.KNN_BATCH_STATS needs the shard_map path (train-mode "
        "BN reduces over named sync axes)"
    )

    def per_device(params, batch_stats, ssl, clips_u8, infos, rng):
        my = replica_index(axes)
        rng = jax.random.fold_in(rng, my)
        clips = device_aug(clips_u8, rng) if device_aug is not None else clips_u8
        clips = clips.astype(compute_dtype)
        x = clips[:, 0]  # first view
        if use_batch_stats:
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            )
        else:
            out = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=False
            )
        proj, _ = _proj_and_preds(out)
        q = l2_normalize(proj.astype(jnp.float32))
        acc = knn_probe(
            cfg, ssl, ssl["knn_labels"], q, infos["cls_id"],
            knn_k=knn_k, t=cfg.CONTRASTIVE.T, num_classes=num_classes,
        )
        if axes:
            acc = jax.lax.pmean(acc, axes)
        return acc

    if auto:
        return jax.jit(per_device)
    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axes), P(axes), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_eval_step(cfg, mesh, model, device_aug: Optional[Callable]):
    """Forward-only step returning per-device logits and labels gathered
    back as global arrays (for validation confusion matrices).

    Uses the mesh's actual batch axes so it also runs on an auto
    ('data','model') mesh (there the batch rides 'data' only and the
    model is the GSPMD-partitioned twin with no named BN axes)."""
    from advise_tpu.parallel.mesh import mesh_batch_axes

    compute_dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    # auto mode runs under plain jit: no named axes exist
    axes = () if cfg.TPU.PARTITION_MODE == "auto" else mesh_batch_axes(mesh)

    def per_device(params, batch_stats, clips_u8, infos, rng):
        my = replica_index(axes)
        rng = jax.random.fold_in(rng, my)
        clips = device_aug(clips_u8, rng) if device_aug is not None else clips_u8
        clips = clips.astype(compute_dtype)
        b, k = clips.shape[:2]
        x = clips.reshape(b * k, *clips.shape[2:])
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return logits.reshape(b, k, -1)

    if cfg.TPU.PARTITION_MODE == "auto":
        # plain jit: batch arrives 'data'-sharded, params TP/FSDP-sharded;
        # GSPMD partitions the forward
        return jax.jit(per_device)

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(axes), P(axes), P()),
        out_specs=P(axes),
        check_vma=False,
    )
    return jax.jit(sharded)
