"""Contrastive SSL algorithms as pure per-device step functions.

Reference: ``models/contrastive.py:130-1171``. Functional mapping:

| reference mutable state           | here (TrainState.ssl)                 |
|-----------------------------------|----------------------------------------|
| backbone_hist EMA twin            | ssl['ema_params'] / ['ema_batch_stats']|
| queue_x ring buffer + ptr         | ssl['queue_x'], ssl['ptr']             |
| queue_swav                        | ssl['queue_swav'], ssl['swav_started'] |
| Memory / Memory1D banks           | ssl['memory']                          |
| knn_mem + train_labels            | ssl['knn_mem'], ssl['knn_labels']      |
| iter counter                      | TrainState.step                        |

All functions run inside shard_map: cross-replica communication is
explicit (all_gather for keys/queue updates and memory scatter, psum for
the distributed Sinkhorn), reproducing the reference's collective pattern
(SURVEY.md §2.2 census). One deliberate deviation: MoCo/memory-bank
updates all_gather keys before writing so the replicated buffers stay
bit-identical across replicas (the reference lets per-rank queue replicas
silently diverge by enqueueing only local keys).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from advise_tpu.models import losses as L
from advise_tpu.parallel.collectives import (
    all_gather_cat,
    batch_shuffle,
    batch_unshuffle,
    replica_index,
    world_size,
)
from advise_tpu.parallel.mesh import BATCH_AXES, SYNC_AXIS


def batch_axes(cfg) -> Tuple[str, ...]:
    """Mesh axes carrying the batch for explicit collectives.

    Under the auto (jit+GSPMD) partition mode the step sees logically
    GLOBAL arrays — XLA inserts the collectives — so every explicit
    gather/psum here degenerates to the identity (empty axes)."""
    if getattr(cfg.TPU, "PARTITION_MODE", "shard_map") == "auto":
        return ()
    return BATCH_AXES


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """(reference Normalize module, contrastive.py:934-946). The norm is
    floored before the sqrt so the gradient stays finite at x=0 (JAX's
    sqrt has a NaN grad there; torch F.normalize clamps the same way)."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, 1e-12))


def init_ssl_state(cfg, params, batch_stats, rng) -> Dict[str, Any]:
    ssl: Dict[str, Any] = {}
    ctype = cfg.CONTRASTIVE.TYPE
    dim = cfg.CONTRASTIVE.DIM
    k = cfg.CONTRASTIVE.QUEUE_LEN
    length = cfg.CONTRASTIVE.LENGTH
    stdv = 1.0 / math.sqrt(dim / 3)
    r1, r2, r3 = jax.random.split(rng, 3)
    if ctype in ("moco", "byol"):
        ssl["ema_params"] = jax.tree_util.tree_map(jnp.copy, params)
        ssl["ema_batch_stats"] = jax.tree_util.tree_map(jnp.copy, batch_stats)
    if ctype == "moco":
        # queue init uniform(-stdv, stdv) (reference contrastive.py:87-90)
        ssl["queue_x"] = jax.random.uniform(
            r1, (k, dim), jnp.float32, -stdv, stdv
        )
        ssl["ptr"] = jnp.zeros((), jnp.int32)
    if ctype == "swav" and cfg.CONTRASTIVE.SWAV_QEUE_LEN > 0:
        ssl["queue_swav"] = jnp.zeros(
            (2, cfg.CONTRASTIVE.SWAV_QEUE_LEN, dim), jnp.float32
        )
        ssl["swav_started"] = jnp.zeros((), jnp.bool_)
    if ctype == "mem":
        # MEM_TYPE '2d': time-indexed bank [length, duration, dim]
        # (reference Memory :937-1040; the reference pins duration=1 at
        # :48 — CONTRASTIVE.DURATION makes the 2D path reachable)
        duration = (
            max(int(cfg.CONTRASTIVE.DURATION), 1)
            if cfg.CONTRASTIVE.MEM_TYPE == "2d"
            else 1
        )
        ssl["memory"] = jax.random.uniform(
            r2, (length, duration, dim), jnp.float32, -stdv, stdv
        )
    if cfg.CONTRASTIVE.KNN_ON:
        ssl["knn_mem"] = jax.random.uniform(
            r3, (length, dim), jnp.float32, -stdv, stdv
        )
    return ssl


def momentum_at(cfg, epoch_exact: jnp.ndarray) -> jnp.ndarray:
    """Cosine momentum annealing (reference momentum_anneal_cosine
    :252-261); constant momentum otherwise."""
    m0 = cfg.CONTRASTIVE.MOMENTUM
    if not cfg.CONTRASTIVE.MOMENTUM_ANNEALING:
        return jnp.float32(m0)
    return 1.0 - (1.0 - m0) * (
        jnp.cos(jnp.pi * epoch_exact / cfg.SOLVER.MAX_EPOCH) + 1.0
    ) * 0.5


def update_ema(ssl, params, batch_stats, m) -> Dict[str, Any]:
    """_update_history (reference :158-172): hist = hist*m + cur*(1-m).

    Only params are EMA'd; the momentum encoder's BN running stats
    (``ema_batch_stats``) accumulate during its own key forwards in
    :func:`compute_keys`, matching the reference where the momentum
    encoder is a full module owning its own BN buffers
    (contrastive.py:308-371)."""
    new = dict(ssl)
    new["ema_params"] = jax.tree_util.tree_map(
        lambda h, p: h * m + p * (1.0 - m), ssl["ema_params"], params
    )
    return new


def _apply_backbone(model, params, batch_stats, x, train, rng=None):
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=train,
        mutable=["batch_stats"] if train else [],
        rngs={"dropout": rng} if (train and rng is not None) else None,
    )
    if train:
        return out[0], out[1].get("batch_stats", batch_stats)
    return out, batch_stats


def _proj_and_preds(out):
    if isinstance(out, (list, tuple)):
        return out[0], [l2_normalize(p) for p in out[1:]]
    return out, []


def _vmap_views_apply(model, params, batch_stats, views_stacked, rng):
    """Run several views through the network as ONE batched program via
    ``jax.vmap`` over the leading view dim.

    TPU rationale (measured, scripts/bench_byol_parts.py): a 2x-batch
    SlowFast-R50 forward costs 1.30x a 1x forward (fwd+bwd 1.38x) — vmap
    folds the view dim into the conv/matmul batch so the MXU sees the
    bigger batch, while BN reductions stay PER VIEW (vmap keeps the view
    dim out of the (N,T,H,W) reduction), reproducing the reference's
    sequential per-view forwards' normalization exactly
    (contrastive.py:308-371 runs views one at a time).

    Deviation (documented): the mutated BN running stats of the views are
    averaged instead of chained sequentially — normalization in train mode
    uses batch statistics, so only the running-stat bookkeeping differs.
    Returns (outs with leading view dim, averaged batch_stats).

    ``rng`` may be a single key (shared by all views, matching the
    sequential online-view path which reuses one key) or a stacked
    ``[n_views]`` key array (per-view dropout/drop-path masks, matching
    the sequential ``compute_keys`` fold_in-per-view path — a shared key
    would correlate the momentum keys for stochastic encoders)."""

    def one(v, r):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            v, train=True, mutable=["batch_stats"],
            rngs={"dropout": r} if r is not None else None,
        )

    if rng is None:
        out, mutated = jax.vmap(lambda v: one(v, None))(views_stacked)
    else:
        # A single legacy uint32 key is [2] (ndim 1) and a typed
        # jax.random.key is scalar (ndim 0); a STACKED [n_views] batch is
        # one dim higher in each representation. Branch on the key dtype so
        # typed stacked keys are not silently broadcast as one shared key
        # (which would correlate per-view dropout masks).
        single_ndim = 0 if jax.dtypes.issubdtype(
            rng.dtype, jax.dtypes.prng_key) else 1
        if rng.ndim > single_ndim:  # stacked per-view keys [n_views, ...]
            out, mutated = jax.vmap(one)(views_stacked, rng)
        else:
            out, mutated = jax.vmap(lambda v: one(v, rng))(views_stacked)
    new_bs = jax.tree_util.tree_map(
        lambda x: x.mean(axis=0), mutated.get("batch_stats", batch_stats)
    ) if mutated else batch_stats
    return out, new_bs


def compute_keys(cfg, model, ssl, views, rng):
    """Momentum-encoder keys for a list of views (reference
    compute_key_feat :308-371), with optional shuffle-BN over the sync
    axis (reference _batch_shuffle :174-214 with LOCAL_SHUFFLE_BN).

    Returns (keys, new_ema_batch_stats): the momentum encoder runs its BN
    in train mode and accumulates its own running stats, as the
    reference's momentum module does — callers must write the returned
    stats back into ``ssl['ema_batch_stats']``.

    With TPU.VMAP_VIEWS (default) and no shuffle-BN, all views run as one
    vmapped batched forward (see :func:`_vmap_views_apply`)."""
    shuffle_on = (
        cfg.BN.NORM_TYPE == "sync_batchnorm"
        and not cfg.BN.GLOBAL_SYNC
        and cfg.CONTRASTIVE.TYPE != "byol"
        and cfg.TPU.MESH_SYNC != -1  # shuffle within sync groups
        # auto mode has no named axes; BN there reduces over the global
        # batch (= GLOBAL_SYNC), where the reference disables shuffling too
        and batch_axes(cfg)
    )
    ema_bs = ssl["ema_batch_stats"]
    if cfg.TPU.VMAP_VIEWS and not shuffle_on and len(views) > 1:
        stacked = jax.lax.stop_gradient(jnp.stack(views))
        # per-view keys, same fold-in schedule as the sequential path below
        view_keys = jnp.stack(
            [jax.random.fold_in(rng, 100 + i) for i in range(len(views))]
        )
        out, ema_bs = _vmap_views_apply(
            model, ssl["ema_params"], ema_bs, stacked, view_keys,
        )
        proj = out[0] if isinstance(out, (list, tuple)) else out
        keys = [
            jax.lax.stop_gradient(l2_normalize(proj[i]))
            for i in range(len(views))
        ]
        return keys, jax.lax.stop_gradient(ema_bs)
    keys = []
    # CONTRASTIVE.LOCAL_SHUFFLE_BN (reference :187,219): True shuffles
    # within the local replica group (du.get_local_size = the BN 'sync'
    # subgroup here); False shuffles across ALL devices (global gather +
    # rank-0-broadcast permutation = same-rng permutation in SPMD)
    shuf_axes = (
        SYNC_AXIS if cfg.CONTRASTIVE.LOCAL_SHUFFLE_BN else batch_axes(cfg)
    )
    for i, v in enumerate(views):
        v = jax.lax.stop_gradient(v)
        if shuffle_on:
            v, perm = batch_shuffle(
                v, jax.random.fold_in(rng, i), shuf_axes
            )
        out, ema_bs = _apply_backbone(
            model, ssl["ema_params"], ema_bs, v, train=True,
            rng=jax.random.fold_in(rng, 100 + i),
        )
        proj, _ = _proj_and_preds(out)
        key = l2_normalize(proj)
        if shuffle_on:
            key = batch_unshuffle(key, perm, shuf_axes)
        keys.append(jax.lax.stop_gradient(key))
    return keys, jax.lax.stop_gradient(ema_bs)


def dequeue_and_enqueue(ssl, keys, axes=BATCH_AXES,
                        multi_view: bool = False) -> Dict[str, Any]:
    """Ring-buffer enqueue of the (globally gathered) first-view keys —
    or ALL views' keys with CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE (reference
    _dequeue_and_enqueue :263-292: keys_queue_update = [keys[0]] vs
    keys)."""
    new = dict(ssl)
    use = list(keys) if multi_view else [keys[0]]
    key = jnp.concatenate(
        [all_gather_cat(kk, axes) for kk in use], axis=0
    )  # [n_views * global_B, dim]
    k = ssl["queue_x"].shape[0]
    n = key.shape[0]
    # mirror the reference's `assert self.k % num_items == 0`: otherwise the
    # final dynamic_update_slice would clamp and silently overwrite rows
    assert k % n == 0, (
        f"CONTRASTIVE.QUEUE_LEN ({k}) must be divisible by the global key "
        f"batch ({n})"
    )
    ptr = ssl["ptr"]
    queue = jax.lax.dynamic_update_slice(
        ssl["queue_x"], key.astype(ssl["queue_x"].dtype), (ptr, 0)
    )
    new["queue_x"] = queue
    new["ptr"] = jnp.where(ptr + n >= k, 0, ptr + n)
    return new


def knn_update(cfg, ssl, q, index) -> Dict[str, Any]:
    """knn_mem_update (reference :130-139): momentum=1 scatter of the
    gathered projections at gathered indices."""
    if not cfg.CONTRASTIVE.KNN_ON or "knn_mem" not in ssl:
        return ssl
    new = dict(ssl)
    axes = batch_axes(cfg)
    q_all = all_gather_cat(jax.lax.stop_gradient(q), axes)
    ind_all = all_gather_cat(index, axes)
    new["knn_mem"] = ssl["knn_mem"].at[ind_all].set(
        q_all.astype(ssl["knn_mem"].dtype)
    )
    return new


# ---------------------------------------------------------------------------
# per-algorithm losses. Each: (cfg, model, params, batch_stats, ssl, views,
# infos, rng) -> (loss, new_batch_stats, new_ssl, stats)
# views: list of [B, T, H, W, C] clips (NUM_CLIP entries)
# ---------------------------------------------------------------------------


def _fused_stem_conv_outs(cfg, params, ema_params, flat, dtype):
    """TPU.FUSE_EMA_STEM: compute BOTH towers' SlowFast stem convs as ONE
    channel-concatenated s2d conv per pathway.

    Round-3 chip measurement (scripts/microbench_stem.py fused-towers
    case, flagship s2d shapes): one c16 conv with the EMA half's
    cotangent zero costs 61.7 ms where the separate towers cost
    [c8 fwd+wgrad 73.0 (online)] + [c8 fwd 31.5 (EMA)] = 104.5 ms — a
    ~43 ms/step saving. Channel outputs of a conv are independent, so
    slicing the concat result is algebraically identical to two convs.

    flat: [N, T, H, W, C] (views folded into batch — the stem has no
    batch-coupled ops, so folding is exact). Returns
    ((online_slow, online_fast), (ema_slow, ema_fast)) conv outputs.
    """
    from advise_tpu.models.layers.stem import (
        s2d_conv,
        s2d_remap_kernel,
        s2d_repack_input,
    )
    from advise_tpu.models.slowfast import SLOWFAST_TEMP_KERNELS as TK

    alpha = cfg.SLOWFAST.ALPHA
    # ContrastiveModel nests the backbone params one level down
    p_on = params.get("backbone", params)
    p_em = ema_params.get("backbone", ema_params)
    outs = {}
    for path, x_p, kt in (
        ("slow", flat[:, ::alpha], TK[0][0][0]),
        ("fast", flat, TK[0][1][0]),
    ):
        k_on = p_on[f"s1_{path}"]["conv"]["kernel"]
        k_em = jax.lax.stop_gradient(
            p_em[f"s1_{path}"]["conv"]["kernel"]
        )
        w_cat = jnp.concatenate(
            [s2d_remap_kernel(k_on, kt), s2d_remap_kernel(k_em, kt)],
            axis=-1,
        ).astype(dtype)
        y = s2d_conv(s2d_repack_input(x_p).astype(dtype), w_cat, kt)
        if getattr(cfg.TPU, "STEM_BARRIER", False):
            # pin the fused conv output against XLA HLO remat — the r3
            # trace showed this exact value recomputed in the backward
            # (fusion.3088 + .remat twin, 56.5 ms/step), erasing the
            # measured 43 ms fused-stem saving
            y = jax.lax.optimization_barrier(y)
        c = k_on.shape[-1]
        outs[path] = (y[..., :c], jax.lax.stop_gradient(y[..., c:]))
    return (
        (outs["slow"][0], outs["fast"][0]),
        (outs["slow"][1], outs["fast"][1]),
    )


def _byol_fused_stem(cfg, model, params, batch_stats, ssl, views, rng):
    """BYOL online + EMA forwards with the fused stem convs (see
    :func:`_fused_stem_conv_outs`). Returns (outs_per_view, new_bs,
    keys, ema_bs): the same quantities the VMAP_VIEWS path produces."""
    stacked = jnp.stack(views[:2])  # [2, B, ...]
    v2, b = stacked.shape[:2]
    flat = stacked.reshape(v2 * b, *stacked.shape[2:])
    (on_s, on_f), (em_s, em_f) = _fused_stem_conv_outs(
        cfg, params, ssl["ema_params"], flat, stacked.dtype
    )

    def unflat(y):
        return y.reshape(v2, b, *y.shape[1:])

    on_s, on_f = unflat(on_s), unflat(on_f)
    em_s, em_f = unflat(em_s), unflat(em_f)

    def one_online(v, s, f):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            v, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
            stem_conv_out=(s, f),
        )

    out, mutated = jax.vmap(one_online)(stacked, on_s, on_f)
    new_bs = jax.tree_util.tree_map(
        lambda x: x.mean(axis=0),
        mutated.get("batch_stats", batch_stats),
    )

    view_keys = jnp.stack(
        [jax.random.fold_in(rng, 100 + i) for i in range(v2)]
    )

    def one_ema(v, s, f, r):
        return model.apply(
            {"params": ssl["ema_params"],
             "batch_stats": ssl["ema_batch_stats"]},
            v, train=True, mutable=["batch_stats"],
            rngs={"dropout": r},
            stem_conv_out=(s, f),
        )

    ema_out, ema_mut = jax.vmap(one_ema)(
        jax.lax.stop_gradient(stacked), em_s, em_f, view_keys
    )
    ema_bs = jax.tree_util.tree_map(
        lambda x: x.mean(axis=0),
        ema_mut.get("batch_stats", ssl["ema_batch_stats"]),
    )
    ema_proj = (
        ema_out[0] if isinstance(ema_out, (list, tuple)) else ema_out
    )
    keys = [
        jax.lax.stop_gradient(l2_normalize(ema_proj[i])) for i in range(v2)
    ]
    return out, new_bs, keys, jax.lax.stop_gradient(ema_bs)


def _fuse_stem_on(cfg):
    return (
        getattr(cfg.TPU, "FUSE_EMA_STEM", False)
        and cfg.MODEL.ARCH == "slowfast"
        and cfg.TPU.STEM_S2D
        and cfg.TPU.VMAP_VIEWS
        and cfg.TPU.PARTITION_MODE == "shard_map"
    )


def byol_loss(cfg, model, params, batch_stats, ssl, views, infos, rng):
    """(reference :508-597): symmetric predictor-vs-EMA-key similarity,
    sim_loss = -(q_hat . k_hat)/T averaged (:243-249).

    TPU.VMAP_VIEWS (default): both online forwards run as ONE vmapped
    batched program (BN statistics still per view — see
    :func:`_vmap_views_apply`); measured 1.35x on the SlowFast-R50 step.
    TPU.FUSE_EMA_STEM additionally computes the online and EMA towers'
    stem convs as one channel-concatenated conv (slowfast + s2d only;
    see :func:`_fused_stem_conv_outs`)."""
    assert len(views) >= 2, "BYOL needs 2 clips per video"
    t = cfg.CONTRASTIVE.T
    if _fuse_stem_on(cfg):
        out, bs2, keys, ema_bs = _byol_fused_stem(
            cfg, model, params, batch_stats, ssl, views, rng
        )
        outs = [
            jax.tree_util.tree_map(lambda x: x[i], out) for i in range(2)
        ]
        proj1, preds1 = _proj_and_preds(outs[0])
        _, preds2 = _proj_and_preds(outs[1])
        assert preds1, "BYOL requires CONTRASTIVE.PREDICTOR_DEPTHS"
        loss = (
            -(jnp.sum(preds1[0] * keys[1], axis=-1)).mean() / t
            + -(jnp.sum(preds2[0] * keys[0], axis=-1)).mean() / t
        )
        ssl = dict(ssl)
        ssl["ema_batch_stats"] = ema_bs
        ssl = knn_update(cfg, ssl, l2_normalize(proj1), infos["item_id"])
        return loss, bs2, ssl, {"loss_byol": loss}
    if cfg.TPU.VMAP_VIEWS:
        out, bs2 = _vmap_views_apply(
            model, params, batch_stats, jnp.stack(views[:2]), rng
        )
        outs = [
            jax.tree_util.tree_map(lambda x: x[i], out) for i in range(2)
        ]
        proj1, preds1 = _proj_and_preds(outs[0])
        _, preds2 = _proj_and_preds(outs[1])
        assert preds1, "BYOL requires CONTRASTIVE.PREDICTOR_DEPTHS"
    else:
        out1, bs1 = _apply_backbone(
            model, params, batch_stats, views[0], True, rng
        )
        proj1, preds1 = _proj_and_preds(out1)
        assert preds1, "BYOL requires CONTRASTIVE.PREDICTOR_DEPTHS"
        out2, bs2 = _apply_backbone(model, params, bs1, views[1], True, rng)
        _, preds2 = _proj_and_preds(out2)

    keys, ema_bs = compute_keys(cfg, model, ssl, views[:2], rng)
    loss = (
        -(jnp.sum(preds1[0] * keys[1], axis=-1)).mean() / t
        + -(jnp.sum(preds2[0] * keys[0], axis=-1)).mean() / t
    )
    ssl = dict(ssl)
    ssl["ema_batch_stats"] = ema_bs
    ssl = knn_update(cfg, ssl, l2_normalize(proj1), infos["item_id"])
    return loss, bs2, ssl, {"loss_byol": loss}


def moco_loss(cfg, model, params, batch_stats, ssl, views, infos, rng):
    """(reference :466-506): q vs EMA keys + queue negatives, CE@0."""
    t = cfg.CONTRASTIVE.T
    out, new_bs = _apply_backbone(model, params, batch_stats, views[0], True, rng)
    proj, _ = _proj_and_preds(out)
    q = l2_normalize(proj)
    keys, ema_bs = compute_keys(cfg, model, ssl, views[1:], rng)
    ssl = dict(ssl)
    ssl["ema_batch_stats"] = ema_bs
    queue_neg = q @ jax.lax.stop_gradient(ssl["queue_x"]).T  # [B, K]
    logits_list = []
    for key in keys:
        pos = jnp.sum(q * key, axis=-1, keepdims=True)
        logits_list.append(jnp.concatenate([pos, queue_neg], axis=1))
    logits = jnp.concatenate(logits_list, axis=0) / t
    loss = L.contrastive_loss(logits)
    ssl = dequeue_and_enqueue(
        ssl, keys, batch_axes(cfg),
        multi_view=cfg.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE,
    )
    ssl = knn_update(cfg, ssl, q, infos["item_id"])
    acc = L.top_k_accuracy(logits, jnp.zeros((logits.shape[0],), jnp.int32), 1)
    return loss, new_bs, ssl, {"loss_nce": loss, "acc_ins": acc}


def simclr_loss(cfg, model, params, batch_stats, ssl, views, infos, rng):
    """NT-Xent with cross-replica gathered views (reference :733-800, the
    exercised `cat_across_gpus` branch; the gather is differentiable like
    AllGatherWithGradient)."""
    t = cfg.CONTRASTIVE.T
    if cfg.TPU.VMAP_VIEWS:
        out, bs2 = _vmap_views_apply(
            model, params, batch_stats, jnp.stack(views[:2]), rng
        )
        proj = out[0] if isinstance(out, (list, tuple)) else out
        q = l2_normalize(proj[0])
        q2 = l2_normalize(proj[1])
    else:
        out1, bs1 = _apply_backbone(
            model, params, batch_stats, views[0], True, rng
        )
        proj1, _ = _proj_and_preds(out1)
        q = l2_normalize(proj1)
        out2, bs2 = _apply_backbone(model, params, bs1, views[1], True, rng)
        proj2, _ = _proj_and_preds(out2)
        q2 = l2_normalize(proj2)
    if cfg.CONTRASTIVE.SIMCLR_DIST_ON:
        qg = all_gather_cat(q, batch_axes(cfg))
        qg2 = all_gather_cat(q2, batch_axes(cfg))
    else:
        qg, qg2 = q, q2
    out = jnp.concatenate([qg, qg2], axis=0)  # [2B, dim]
    n = out.shape[0]
    sim = jnp.exp(out @ out.T / t)
    mask = 1.0 - jnp.eye(n, dtype=sim.dtype)
    denom = jnp.sum(sim * mask, axis=-1)
    pos = jnp.exp(jnp.sum(qg * qg2, axis=-1) / t)
    pos = jnp.concatenate([pos, pos], axis=0)
    loss = (-jnp.log(pos / denom)).mean()
    ssl = knn_update(cfg, ssl, q, infos["item_id"])
    return loss, bs2, ssl, {"loss_simclr": loss}


def sinkhorn(Q: jnp.ndarray, iters: int = 3, axes=BATCH_AXES):
    """Sinkhorn-Knopp normalization of [B, K] scores (reference
    sinkhorn/distributed_sinkhorn :875-910). Under SPMD every replica holds
    its own rows; row sums psum over the batch axes (empty axes -> the
    single-program / auto-partition case: plain sums already span the
    global batch)."""
    Q = Q.T  # [K, B_local]
    k = Q.shape[0]

    def allsum(x, axis=None):
        s = jnp.sum(x, axis=axis)
        if axes:
            s = jax.lax.psum(s, axes)
        return s

    total_b = Q.shape[1] * (world_size(axes) if axes else 1)
    Q = Q / allsum(Q)
    r = jnp.ones((k,), Q.dtype) / k
    c = jnp.ones((Q.shape[1],), Q.dtype) / total_b
    for _ in range(iters):
        row = allsum(Q, axis=1)
        Q = Q * (r / (row + 1e-12))[:, None]
        Q = Q * (c / (jnp.sum(Q, axis=0) + 1e-12))[None, :]
    Q = Q / (jnp.sum(Q, axis=0, keepdims=True) + 1e-12)
    return Q.T  # [B_local, K]


def swav_loss(cfg, model, params, batch_stats, ssl, views, infos, rng):
    """Swapped prediction over prototype assignments (reference
    :599-731 public-code path): per assign-crop Sinkhorn codes, CE against
    every other crop's softmax; optional feature queue after epoch 15."""
    t = cfg.CONTRASTIVE.T
    eps = 0.05  # swav_eps_sinkhorn (reference :109)
    n_clips = len(views)
    embeddings, outputs = [], []
    if cfg.TPU.VMAP_VIEWS and n_clips > 1:
        out, new_bs = _vmap_views_apply(
            model, params, batch_stats, jnp.stack(views), rng
        )
        proj_all = out[0] if isinstance(out, (list, tuple)) else out
        for i in range(n_clips):
            proj = l2_normalize(proj_all[i])
            scores = model.apply(
                {"params": params, "batch_stats": new_bs},
                proj,
                method="prototypes",
            )
            embeddings.append(proj)
            outputs.append(scores)
    else:
        new_bs = batch_stats
        for v in views:
            out, new_bs = _apply_backbone(model, params, new_bs, v, True, rng)
            proj, _ = _proj_and_preds(out)
            proj = l2_normalize(proj)
            scores = model.apply(
                {"params": params, "batch_stats": new_bs},
                proj,
                method="prototypes",
            )
            embeddings.append(proj)
            outputs.append(scores)

    epoch_exact = infos.get("epoch_exact", jnp.float32(0.0))
    use_queue = "queue_swav" in ssl
    new_ssl = dict(ssl)
    loss_total = 0.0
    axes = batch_axes(cfg)
    crops_for_assign = range(min(2, n_clips))
    for i in crops_for_assign:
        out_i = jax.lax.stop_gradient(outputs[i])
        if use_queue:
            # after warmup, prepend queued features' scores (reference
            # :641-660); queue participates once it has filled
            w = model.apply(
                {"params": params, "batch_stats": new_bs},
                jax.lax.stop_gradient(new_ssl["queue_swav"][i]),
                method="prototypes",
            )
            started = jnp.logical_or(
                new_ssl["swav_started"],
                jnp.any(new_ssl["queue_swav"][i, -1] != 0),
            )
            gate = jnp.logical_and(started, epoch_exact >= 15.0)
            out_ext = jnp.concatenate([jnp.where(gate, w, -1e9), out_i], 0)
            codes_ext = sinkhorn(jnp.exp(out_ext / eps), 3, axes)
            codes = codes_ext[-out_i.shape[0]:]
            # roll queue and insert current embeddings
            bsz = embeddings[i].shape[0]
            emb_all = all_gather_cat(
                jax.lax.stop_gradient(embeddings[i]), axes
            )
            q_new = jnp.roll(new_ssl["queue_swav"][i], emb_all.shape[0], axis=0)
            q_new = q_new.at[: emb_all.shape[0]].set(emb_all)
            new_ssl["queue_swav"] = new_ssl["queue_swav"].at[i].set(q_new)
            new_ssl["swav_started"] = started
        else:
            codes = sinkhorn(jnp.exp(out_i / eps), 3, axes)
        codes = jax.lax.stop_gradient(codes)
        subloss = 0.0
        for v in range(n_clips):
            if v == i:
                continue
            p = jax.nn.log_softmax(outputs[v] / t, axis=-1)
            subloss -= jnp.mean(jnp.sum(codes * p, axis=1))
        loss_total += subloss / (n_clips - 1)
    loss = loss_total / len(list(crops_for_assign))
    new_ssl = knn_update(cfg, new_ssl, embeddings[0], infos["item_id"])
    return loss, new_bs, new_ssl, {"loss_swav": loss}


def _mem_interp_weights(time_f: jnp.ndarray, duration: int):
    """Adjacent-slot pair + the reference's interpolation weights
    (reference Memory.get/update :966-983, :996-1010) — INCLUDING the
    quirky ``w_t1 = 1 - (time - t0)`` ("hack for inverse"), reproduced
    verbatim so bank contents match the reference's."""
    t0 = jnp.clip(jnp.floor(time_f), 0, duration - 1).astype(jnp.int32)
    t1 = jnp.clip(t0 + 1, 0, duration - 1)
    w_t1 = 1.0 - (time_f - t0.astype(jnp.float32))
    return t0, t1, w_t1[..., None]


def mem_loss(cfg, model, params, batch_stats, ssl, views, infos, rng):
    """Memory-bank NCE (reference :380-441 + Memory :937-1040):
    positives = own bank entry, negatives = QUEUE_LEN random entries;
    bank updated with momentum at gathered indices. MEM_TYPE '2d' uses a
    time-indexed [length, duration, dim] bank: the query reads/writes its
    clip's time slot (infos['time_idx'] scaled by duration-1, reference
    :389), negatives draw random time slots (:408-415; the reference's
    torch.randint(0, duration-1) never draws the LAST slot — an
    off-by-one we do not replicate). CONTRASTIVE.INTERP_MEMORY draws
    float times and linearly interpolates between adjacent slots on read,
    and scatters the momentum update into BOTH slots on write
    (Memory.get/update interp branches, incl. their inverted-weight
    quirk — see _mem_interp_weights)."""
    t = cfg.CONTRASTIVE.T
    k = cfg.CONTRASTIVE.QUEUE_LEN
    index = infos["item_id"]
    out, new_bs = _apply_backbone(model, params, batch_stats, views[0], True, rng)
    proj, _ = _proj_and_preds(out)
    q = l2_normalize(proj)
    b = q.shape[0]
    length, duration, _ = ssl["memory"].shape
    interp = (
        bool(cfg.CONTRASTIVE.INTERP_MEMORY)
        and cfg.CONTRASTIVE.MEM_TYPE == "2d"
        and duration > 1
    )
    r_ind, r_time = jax.random.split(rng)
    clip_ind = jax.random.randint(r_ind, (b, k + 1), 0, length)
    clip_ind = clip_ind.at[:, 0].set(index)
    # own time slot: normalized clip time in [0,1] -> slot (reference :389)
    time01 = infos.get("time_idx", jnp.zeros((b,), jnp.float32))
    mem = jax.lax.stop_gradient(ssl["memory"])
    if interp:
        my_time_f = time01 * (duration - 1)
        time_f = jax.random.uniform(
            r_time, (b, k + 1), minval=0.0, maxval=float(duration - 1)
        )
        time_f = time_f.at[:, 0].set(my_time_f)  # examplar_type 'clip'
        t0, t1, w_t1 = _mem_interp_weights(time_f, duration)
        negs = (
            mem[clip_ind, t0] * (1.0 - w_t1) + mem[clip_ind, t1] * w_t1
        )  # [B, K+1, dim]
    else:
        my_time = jnp.round(time01 * (duration - 1)).astype(jnp.int32)
        if duration > 1:
            time_ind = jax.random.randint(r_time, (b, k + 1), 0, duration)
            time_ind = time_ind.at[:, 0].set(my_time)  # examplar 'clip'
        else:
            time_ind = jnp.zeros((b, k + 1), jnp.int32)
        negs = mem[clip_ind, time_ind]  # [B, K+1, dim]
    logits = jnp.einsum("nc,nkc->nk", q, negs) / t
    loss = L.contrastive_loss(logits)
    # momentum update at gathered (index, time) (reference Memory.update)
    new_ssl = dict(ssl)
    axes = batch_axes(cfg)
    q_all = all_gather_cat(jax.lax.stop_gradient(q), axes)
    ind_all = all_gather_cat(index, axes)
    m = cfg.CONTRASTIVE.MOMENTUM
    if interp:
        time_all = all_gather_cat(time01 * (duration - 1), axes)
        t0, t1, w_t1 = _mem_interp_weights(time_all, duration)
        w_t0 = 1.0 - w_t1
        old_t0 = ssl["memory"][ind_all, t0]
        old_t1 = ssl["memory"][ind_all, t1]
        upd_t0 = l2_normalize(q_all * w_t0 * m + old_t0 * (1.0 - m))
        upd_t1 = l2_normalize(q_all * w_t1 * m + old_t1 * (1.0 - m))
        memory = ssl["memory"].at[ind_all, t0].set(upd_t0)
        memory = memory.at[ind_all, t1].set(upd_t1)
        new_ssl["memory"] = memory
    else:
        time_all = all_gather_cat(my_time, axes)
        old = ssl["memory"][ind_all, time_all]
        # reference :1030 weights the NEW features by momentum:
        # mem_update = new * m + old * (1 - m)
        upd = l2_normalize(q_all * m + old * (1.0 - m))
        new_ssl["memory"] = ssl["memory"].at[ind_all, time_all].set(upd)
    new_ssl = knn_update(cfg, new_ssl, q, index)
    return loss, new_bs, new_ssl, {"loss_nce": loss}


CONTRASTIVE_LOSSES = {
    "byol": byol_loss,
    "moco": moco_loss,
    "simclr": simclr_loss,
    "swav": swav_loss,
    "mem": mem_loss,
}


def sequential_contrastive_grads(
    cfg, model, params, batch_stats, ssl, views, infos, rng
):
    """``CONTRASTIVE.SEQUENTIAL`` clip micro-batching (reference
    contrastive_forward, models/contrastive.py:1120-1167): momentum keys
    are precomputed for ALL clips once, then each clip runs a separate
    query forward+backward against the other clips' keys — peak
    activation memory of a single view, gradients ACCUMULATED (summed,
    un-normalized, exactly like the reference's repeated .backward()
    calls; for NUM_CLIP=2 BYOL this equals the batched symmetric loss's
    gradient). The reported ``loss_partial`` is scaled by
    1/(n_clips * 2) to match the reference's logging convention.

    Supported for 'byol' and 'moco' (the EMA-key algorithms the
    reference's sequential loop precomputes keys for; swav/simclr pair
    iteration is rejected in assert_and_infer_cfg). MoCo enqueues after
    the loop like the reference (:1166) — first-view keys, consistent
    with the batched path here.

    Returns (grads, loss_partial, new_batch_stats, new_ssl, stats).
    """
    ctype = cfg.CONTRASTIVE.TYPE
    assert ctype in ("byol", "moco"), (
        "CONTRASTIVE.SEQUENTIAL supports byol/moco only (reference "
        "sequential pair iteration for swav/simclr is not implemented)"
    )
    t = cfg.CONTRASTIVE.T
    n = len(views)
    assert n >= 2, "CONTRASTIVE.SEQUENTIAL needs >= 2 clips"
    keys, ema_bs = compute_keys(cfg, model, ssl, views, rng)
    ssl = dict(ssl)
    ssl["ema_batch_stats"] = ema_bs
    keys_arr = jnp.stack([jax.lax.stop_gradient(k) for k in keys])  # [n,B,d]
    stacked = jnp.stack(views)  # [n, B, ...]

    def one_clip_loss(params, vid, k_idx, bs):
        out, new_bs = _apply_backbone(model, params, bs, vid, True, rng)
        proj, preds = _proj_and_preds(out)
        q = l2_normalize(proj)
        other = (jnp.arange(n) != k_idx).astype(jnp.float32)  # [n]
        if ctype == "byol":
            assert_msg = "BYOL requires CONTRASTIVE.PREDICTOR_DEPTHS"
            assert preds, assert_msg
            # sum over the OTHER keys of -mean(pred . key)/T, / (n-1)
            # (reference :559-563: loss_reg summed over keys then /len)
            sims = jnp.einsum("bd,nbd->n", preds[0], keys_arr) / (
                preds[0].shape[0]
            )
            loss = jnp.sum(-sims / t * other) / (n - 1)
        else:  # moco
            queue_neg = q @ jax.lax.stop_gradient(ssl["queue_x"]).T  # [B,K]
            pos = jnp.einsum("bd,nbd->nb", q, keys_arr)  # [n, B]
            logits = jnp.concatenate(
                [pos[..., None], jnp.broadcast_to(
                    queue_neg[None], (n,) + queue_neg.shape)], axis=-1
            ) / t  # [n, B, 1+K]
            ce = -jax.nn.log_softmax(logits, axis=-1)[..., 0]  # [n, B]
            loss = jnp.sum(jnp.mean(ce, axis=-1) * other) / (n - 1)
        return loss, (new_bs, q)

    def body(carry, k_idx):
        grads_acc, loss_acc, bs = carry
        vid = stacked[k_idx]
        (loss_k, (new_bs, q)), g = jax.value_and_grad(
            one_clip_loss, has_aux=True
        )(params, vid, k_idx, bs)
        grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
        return (grads_acc, loss_acc + loss_k, new_bs), q

    zero = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params
    )
    (grads, loss_sum, new_bs), qs = jax.lax.scan(
        body, (zero, jnp.float32(0.0), batch_stats), jnp.arange(n)
    )
    loss_partial = loss_sum / (n * 2.0)  # reference :1164 logging scale
    if ctype == "moco":
        ssl = dequeue_and_enqueue(
        ssl, keys, batch_axes(cfg),
        multi_view=cfg.CONTRASTIVE.MOCO_MULTI_VIEW_QUEUE,
    )
    # Reference parity: the sequential loop (contrastive.py:1120-1167) calls
    # knn_mem_update on EVERY per-clip forward; the bank writes with
    # momentum=1, so the LAST clip's features are what survive there.
    ssl = knn_update(cfg, ssl, qs[-1], infos["item_id"])
    name = "loss_byol" if ctype == "byol" else "loss_nce"
    return grads, loss_partial, new_bs, ssl, {name: loss_partial}


def eval_knn(ssl, q: jnp.ndarray, knn_k: int = 200):
    """(reference eval_knn :233-241): top-k similarities vs the kNN bank."""
    dist = q @ ssl["knn_mem"].T
    k = min(knn_k, dist.shape[1])
    yd, yi = jax.lax.top_k(dist, k)
    return yd, yi


def knn_probe(cfg, ssl, labels_bank: jnp.ndarray, feats: jnp.ndarray,
              labels: jnp.ndarray, knn_k: int = 200, t: float = 0.07,
              num_classes: Optional[int] = None):
    """Online kNN classification accuracy against the kNN memory bank
    (reference ContrastiveModel.eval_knn + the kNN protocol of instance
    discrimination: similarity-weighted vote over the top-k neighbors).

    labels_bank: [LENGTH] class id per bank row (-1 = empty/padding row,
    its vote is dropped); feats: [N, dim] l2-normalized query features;
    labels: [N]. Returns top-1 accuracy. ``num_classes`` must be passed
    when tracing under jit (the eager fallback reads it off the bank).
    """
    yd, yi = eval_knn(ssl, feats, knn_k)
    neigh_labels = labels_bank[yi]  # [N, k]
    w = jnp.exp(yd / t)
    if num_classes is None:
        num_classes = int(labels_bank.max()) + 1
    # one_hot(-1) is all-zero: padded bank rows contribute no vote
    votes = jax.nn.one_hot(neigh_labels, num_classes) * w[..., None]
    pred = jnp.argmax(votes.sum(axis=1), axis=-1)
    return jnp.mean((pred == labels).astype(jnp.float32))


def knn_labels_from_dataset(dataset, length: int) -> jnp.ndarray:
    """Label bank for the online kNN monitor (reference init_knn_labels,
    models/contrastive.py:143-149: train_labels from the train loader's
    dataset). Row i = class id of item i; rows past the dataset are -1
    (no vote)."""
    import numpy as np

    labels = np.full((length,), -1, np.int32)
    n = min(len(dataset.items), length)
    labels[:n] = np.asarray([cls for _, cls in dataset.items[:n]], np.int32)
    return jnp.asarray(labels)
