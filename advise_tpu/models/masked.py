"""Masked visual prediction: MAE and MaskFeat over MViT.

Reference: ``models/masked.py:24-658`` + ``models/head_helper.py
MSSeparateHead:456-566`` (config-complete here — cfg.MASK.* restored).

TPU-first reformulation: the reference selects masked tokens with boolean
indexing (``label[output_mask]``), which is ragged; here every loss is a
**weighted masked MSE over all tokens** (identical value: mean over masked
positions), so shapes stay static for XLA. Targets:

- pixels: per-patch normalized patchify (reference ``_patchify`` /
  ``_get_pixel_label_3d``),
- HOG: vectorized histogram-of-gradients (see
  ``advise_tpu/models/layers/operators.hog_features``; reference
  ``HOGLayerC`` + ``_get_hog_label_3d``).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from advise_tpu.models.layers.attention import MultiScaleBlock, trunc02
from advise_tpu.models.layers.operators import hog_features
from advise_tpu.models.layers.stem import PatchEmbed
from advise_tpu.models.mvit import MViT, _pooled_thw, mvit_block_schedule
from advise_tpu.models.utils import get_3d_sincos_pos_embed


def random_masking(rng, b: int, thw: Tuple[int, int, int], mask_ratio: float,
                   tube: bool = False, per_frame: bool = False):
    """Per-sample random masking by argsort of noise (reference
    _mae_random_masking :296-333). Returns ids_keep [B, len_keep],
    mask [B, L] (1 = masked), ids_restore [B, L].

    ``per_frame`` (MASK.PER_FRAME_MASKING, reference masked.py:347,352):
    every frame draws its own mask at the same ratio, so the kept-token
    count per frame is constant. The returned indices stay in the FLAT
    token space (frame-major), so the encoder gather and decoder restore
    work unchanged — unlike the reference, whose per-frame decoder
    restore reshapes the flat [kept..., mask_tokens...] concat to
    [B*T, H*W] and thereby scrambles tokens across frames (a defect in
    the reference's per-frame MAE decode, not replicated; SURVEY.md §8
    family)."""
    t, h, w = thw
    l = t * h * w
    if per_frame:
        assert not tube, "PER_FRAME_MASKING and tube masking are exclusive"
        hw = h * w
        noise = jax.random.uniform(rng, (b, t, hw))
        ids_shuffle = jnp.argsort(noise, axis=-1)  # [b, t, hw] frame-local
        rl = jnp.argsort(ids_shuffle, axis=-1)  # local restore positions
        len_keep_f = max(int(hw * (1 - mask_ratio)), 1)
        n_mask_f = hw - len_keep_f
        offs = (jnp.arange(t) * hw)[None, :, None]
        ids_keep = (ids_shuffle[..., :len_keep_f] + offs).reshape(b, -1)
        # flat layout after the decoder concat: kept tokens frame-major
        # first (frame f at [f*len_keep_f, ...)), then mask tokens
        # frame-major (frame f at [t*len_keep_f + f*n_mask_f, ...))
        keep_offs = (jnp.arange(t) * len_keep_f)[None, :, None]
        mask_offs = (t * len_keep_f + jnp.arange(t) * n_mask_f)[None, :, None]
        ids_restore = jnp.where(
            rl < len_keep_f,
            keep_offs + rl,
            mask_offs + (rl - len_keep_f),
        ).reshape(b, l)
        mask = (rl >= len_keep_f).astype(jnp.float32).reshape(b, l)
        return ids_keep, mask, ids_restore
    if tube:
        noise = jax.random.uniform(rng, (b, 1, h * w))
        noise = jnp.tile(noise, (1, t, 1)).reshape(b, l)
    else:
        noise = jax.random.uniform(rng, (b, l))
    len_keep = max(int(l * (1 - mask_ratio)), 2)
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    mask = jnp.ones((b, l))
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, mask, ids_restore


def patchify_3d(imgs: jnp.ndarray, p: int, u: int) -> jnp.ndarray:
    """[B, T, H, W, 3] -> [B, t*h*w, u*p*p*3] (reference _patchify :185-196,
    channel-last layout)."""
    b, t_full, hh, ww, c = imgs.shape
    t, h, w = t_full // u, hh // p, ww // p
    x = imgs.reshape(b, t, u, h, p, w, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)  # b t h w u p p c
    return x.reshape(b, t * h * w, u * p * p * c)


def normalize_patches(x: jnp.ndarray) -> jnp.ndarray:
    """Per-patch normalization (reference :237-241)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-6)


def unpatchify_3d(patches: jnp.ndarray, thw, p: int, u: int) -> jnp.ndarray:
    """Inverse of :func:`patchify_3d`: [B, t*h*w, u*p*p*3] ->
    [B, t*u, h*p, w*p, 3] (the reference's _unpatchify, masked.py:199-214,
    used by its VIS_MASK visualization path :464-525)."""
    b = patches.shape[0]
    t, h, w = thw
    x = patches.reshape(b, t, h, w, u, p, p, 3)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # b t u h p w p c
    return x.reshape(b, t * u, h * p, w * p, 3)


def hog_label_3d(frames: jnp.ndarray, feat_hw: int, nbins: int, cell_sz: int):
    """HOG targets per token (reference _get_hog_label_3d :267-294).

    frames: [B, T, H, W, 3] (already temporally strided); returns
    [B, T*feat_hw*feat_hw, 3*nbins*ncell]."""
    b, t, hh, ww, c = frames.shape
    flat = frames.reshape(b * t, hh, ww, c)
    hog = hog_features(flat, nbins=nbins, cell_sz=cell_sz)  # [BT, hc, wc, c*nbins]
    hc = hog.shape[1]
    unfold = hc // feat_hw  # cells per token side
    hog = hog.reshape(b * t, feat_hw, unfold, feat_hw, unfold, hog.shape[-1])
    hog = hog.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, t, feat_hw, feat_hw, unfold * unfold * hog.shape[-1]
    )
    return hog.reshape(b, t * feat_hw * feat_hw, -1)


class SeparateHead(nn.Module):
    """Per-depth transform + projection (reference MSSeparateHead
    head_helper.py:456-566): optional MultiScaleBlock decoder stack
    ('separate_xformer') then LayerNorm + Linear."""

    num_classes: int
    feat_size: Tuple[int, int, int]
    decoder_depth: int = 0
    decoder_embed_dim: int = 512
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    kernel_kv: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool):
        for i in range(self.decoder_depth):
            x, _ = MultiScaleBlock(
                dim=x.shape[-1],
                dim_out=self.decoder_embed_dim,
                num_heads=max(self.decoder_embed_dim // 64, 1),
                input_size=tuple(self.feat_size),
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                kernel_kv=tuple(self.kernel_kv),
                stride_kv=tuple(self.stride_kv),
                mode=self.mode,
                has_cls_embed=self.has_cls,
                dtype=self.dtype,
                name=f"transform_{i}",
            )(x, tuple(self.feat_size), not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return nn.Dense(
            self.num_classes, kernel_init=trunc02, dtype=self.dtype,
            name="projection",
        )(x)


class MaskMViT(nn.Module):
    """MAE (MASK.MAE_ON) or MaskFeat masked prediction.

    Returns (preds, labels, masks, weights): parallel lists per pretrain
    depth; loss = sum_i w_i * masked_mse(preds_i, labels_i, masks_i).
    """

    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None
    # threaded to the inner MViT encoder (pipeline-parallel reversible
    # segments over the 'pipe' mesh axis; see models/mvit.py)
    pipeline: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 loader_mask=None):
        """``loader_mask`` [B, L] (1 = masked): loader-side blockwise
        token mask, consumed when ``MASK.MAE_RND_MASK`` is False
        (reference masked.py:550-560 "take masks and labels from
        loader"); with the flag True a uniform random mask is drawn
        in-model regardless (reference :552-556)."""
        cfg = self.cfg
        mae = cfg.MASK.MAE_ON
        pretrain_depth = list(cfg.MASK.PRETRAIN_DEPTH)
        imgs = x  # [B, T, H, W, 3]
        b = x.shape[0]
        mask_rng = self.make_rng("mask")

        if mae:
            # the MAE visible-token gather needs a STATIC keep count;
            # blockwise loader masks are not exact-count, so only the
            # random path is jittable (assert_and_infer_cfg rejects
            # MAE_ON with MAE_RND_MASK=False)
            return self._mae_forward(x, train, mask_rng)
        return self._maskfeat_forward(x, train, mask_rng, loader_mask)

    # -- MaskFeat -----------------------------------------------------------
    def _maskfeat_forward(self, imgs, train, rng, loader_mask=None):
        cfg = self.cfg
        pretrain_depth = list(cfg.MASK.PRETRAIN_DEPTH)
        embed_dim = cfg.MVIT.EMBED_DIM
        mask_token = self.param("mask_token", trunc02, (1, 1, embed_dim))

        # grid geometry from patch stride (reference feat geometry)
        pt, ph, pw = cfg.MVIT.PATCH_STRIDE
        t = cfg.DATA.NUM_FRAMES // pt
        h = w = cfg.DATA.TRAIN_CROP_SIZE // ph
        if not cfg.MASK.MAE_RND_MASK:
            # reference masked.py:558-560: masks come from the loader's
            # blockwise generator (MaskingGenerator3D cube masking — the
            # MaskFeat recipe's distribution, not uniform-random)
            if loader_mask is None and self.is_initializing():
                # init only shapes params; any mask works
                _, loader_mask, _ = random_masking(
                    rng, imgs.shape[0], (t, h, w), cfg.AUG.MASK_RATIO,
                    tube=cfg.AUG.MASK_TUBE,
                )
            if loader_mask is None:
                raise ValueError(
                    "MASK.MAE_RND_MASK=False needs loader-side masks "
                    "(infos['mask']); run through the data pipeline or "
                    "set MASK.MAE_RND_MASK=True for in-model random "
                    "masking"
                )
            mask = loader_mask.reshape(imgs.shape[0], t * h * w).astype(
                jnp.float32
            )
        else:
            _, mask, _ = random_masking(
                rng, imgs.shape[0], (t, h, w), cfg.AUG.MASK_RATIO,
                tube=cfg.AUG.MASK_TUBE,
            )

        encoder = MViT(
            cfg=self.cfg,
            norm=self.norm,
            dtype=self.dtype,
            include_head=False,
            depth_override=pretrain_depth[-1] + 1,
            return_intermediate=tuple(pretrain_depth),
            pipeline=self.pipeline,
            name="encoder",
        )
        inter = encoder(
            imgs, train, token_mask=mask.astype(bool),
            mask_token=mask_token.astype(imgs.dtype),
        )

        preds, labels, masks, weights = [], [], [], []
        schedule, _ = mvit_block_schedule(cfg)
        for (feat, thw), depth in zip(inter, pretrain_depth):
            if cfg.MVIT.CLS_EMBED_ON:
                feat = feat[:, 1:]
            feat_hw = thw[1]
            t_out = thw[0]
            # TRUE spatial stride of this depth's tokens: the product of
            # the patch stride and every Q-pool stride at blocks <= depth.
            # Dividing the crop size by the token count (the reference's
            # formulation) is only equal when tokens tile the image; with
            # conv-padded pooling at non-power-of-two crops (312 -> grid
            # 78 -> 39 -> 20 -> 10) the outer tokens see padding, so the
            # label frames are edge-padded to tokens*stride below (the
            # r4 MViT-L 32x312 AOT certification's geometry fix).
            stride_hw = cfg.MVIT.PATCH_STRIDE[1]
            for x in cfg.MVIT.POOL_Q_STRIDE:
                if x[0] <= depth:
                    stride_hw *= x[2]
            need = feat_hw * stride_hw
            size = cfg.DATA.TRAIN_CROP_SIZE

            def _pad_frames(fr, need=need, size=size):
                if need == size:
                    return fr
                lo = (need - size) // 2
                hi = need - size - lo
                return jnp.pad(
                    fr, ((0, 0), (0, 0), (lo, hi), (lo, hi), (0, 0)),
                    mode="edge",
                )

            if cfg.MASK.PRED_HOG:
                nbins = cfg.MASK.PRED_HOG_NBINS
                cell = cfg.MASK.PRED_HOG_CELL_SZ
                assert stride_hw >= cell and stride_hw % cell == 0, (
                    f"HOG cell ({cell}px) must divide the token stride "
                    f"({stride_hw}px at depth {depth}); add POOL_Q_STRIDE "
                    "stages or adjust PRED_HOG_CELL_SZ"
                )
                ncell = (stride_hw // cell) ** 2
                num_class = 3 * nbins * ncell
                frames = _pad_frames(imgs[:, ::pt][:, :t_out])
                label = hog_label_3d(frames, feat_hw, nbins, cell)
            else:
                u = 1 if cfg.MASK.TIME_STRIDE_LOSS else pt
                num_class = u * stride_hw * stride_hw * 3
                frames = imgs[:, ::pt] if cfg.MASK.TIME_STRIDE_LOSS else imgs
                label = patchify_3d(_pad_frames(frames), stride_hw, u)
                if cfg.MASK.NORM_PRED_PIXEL:
                    label = normalize_patches(label)
            # MASK.HEAD_TYPE (reference MSSeparateHead head_helper.py:474):
            # 'separate' = LayerNorm+Linear only; 'separate_xformer' adds
            # DECODER_DEPTH MultiScaleBlock transforms per depth head
            head_parts = cfg.MASK.HEAD_TYPE.split("_")
            assert head_parts[0] == "separate", cfg.MASK.HEAD_TYPE
            xformer = len(head_parts) > 1 and head_parts[1] == "xformer"
            if xformer:
                assert cfg.MASK.DECODER_DEPTH > 0, (
                    "MASK.HEAD_TYPE separate_xformer needs DECODER_DEPTH>0"
                )
            pred = SeparateHead(
                num_classes=num_class,
                feat_size=tuple(thw),
                decoder_depth=cfg.MASK.DECODER_DEPTH if xformer else 0,
                decoder_embed_dim=cfg.MASK.DECODER_EMBED_DIM,
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                kernel_kv=tuple(cfg.MASK.DEC_KV_KERNEL),
                stride_kv=tuple(cfg.MASK.DEC_KV_STRIDE),
                mode=cfg.MVIT.MODE,
                has_cls=False,  # cls already stripped from `feat` above
                dtype=self.dtype,
                name=f"pred_head_{depth}",
            )(feat, train)
            # token mask at this depth's resolution: max-pool the input
            # mask. Window = ceil ratio with symmetric zero padding so
            # non-tiling grids (78 -> 10 at the 312^2 preset) pool
            # correctly; for tiling grids this is the exact reshape-max.
            d_mask = mask.reshape(imgs.shape[0], t, h, w)
            if (t, h, w) != tuple(thw):
                ft, fh, fw = thw
                wins = tuple(
                    -(-src // dst) for src, dst in zip((t, h, w), thw)
                )
                pads = [(0, 0)] + [
                    ((dst * win - src) // 2,
                     dst * win - src - (dst * win - src) // 2)
                    for src, dst, win in zip((t, h, w), thw, wins)
                ]
                d_mask = jax.lax.reduce_window(
                    d_mask, -jnp.inf, jax.lax.max,
                    (1,) + wins, (1,) + wins, pads,
                )
            preds.append(pred)
            labels.append(jax.lax.stop_gradient(label))
            masks.append(d_mask.reshape(imgs.shape[0], -1))
            weights.append(1.0 / len(pretrain_depth))
        if cfg.MASK.JOINT_CONTRASTIVE:
            # joint contrastive+masked pretrain (BASELINE.json config #5,
            # no reference equivalent): pooled deepest feature -> projection
            # MLP; the train step contrasts the two views' projections
            from advise_tpu.models.layers.heads import MLPHead

            feat, _ = inter[-1]
            if cfg.MVIT.CLS_EMBED_ON:
                feat = feat[:, 1:]
            pooled = nn.LayerNorm(
                epsilon=1e-6, dtype=self.dtype, name="joint_norm"
            )(jnp.mean(feat, axis=1))
            proj = MLPHead(
                dim_out=cfg.CONTRASTIVE.DIM,
                mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
                num_layers=cfg.CONTRASTIVE.NUM_MLP_LAYERS,
                dtype=self.dtype,
                name="joint_proj",
            )(pooled, train)
            return preds, labels, masks, weights, proj
        return preds, labels, masks, weights

    # -- MAE ------------------------------------------------------------------
    def _mae_forward(self, imgs, train, rng):
        cfg = self.cfg
        assert not cfg.MVIT.CLS_EMBED_ON, "MAE path implemented without cls"
        embed_dim = cfg.MVIT.EMBED_DIM
        dec_dim = cfg.MASK.DECODER_EMBED_DIM
        pt = cfg.MVIT.PATCH_STRIDE[0]

        x, (t, h, w) = PatchEmbed(
            dim_out=embed_dim,
            kernel=tuple(cfg.MVIT.PATCH_KERNEL),
            stride=tuple(cfg.MVIT.PATCH_STRIDE),
            padding=tuple(cfg.MVIT.PATCH_PADDING),
            dtype=self.dtype,
            name="patch_embed",
        )(imgs)
        b, l, _ = x.shape
        ids_keep, mask, ids_restore = random_masking(
            rng, b, (t, h, w), cfg.AUG.MASK_RATIO,
            tube=cfg.AUG.MASK_TUBE,
            per_frame=cfg.MASK.PER_FRAME_MASKING,
        )
        if cfg.MVIT.USE_ABS_POS:
            if cfg.MVIT.USE_FIXED_SINCOS_POS:
                pe = jnp.asarray(
                    get_3d_sincos_pos_embed(embed_dim, h, t, cls_token=False)
                )[None]
            else:
                pe = self.param("pos_embed", trunc02, (1, l, embed_dim))
            x = x + pe.astype(x.dtype)
        x = jnp.take_along_axis(
            x, ids_keep[..., None].astype(jnp.int32), axis=1
        )

        # encoder blocks on visible tokens (pooling strides must be empty for
        # the ragged token set — same constraint as the reference MAE configs)
        schedule, final_dim = mvit_block_schedule(cfg, (t, h, w))
        for i, spec in enumerate(schedule[: cfg.MASK.PRETRAIN_DEPTH[-1] + 1]):
            assert not spec["stride_q"], "MAE requires no Q-pooling"
            x, _ = MultiScaleBlock(
                **{k: tuple(v) if isinstance(v, list) else v
                   for k, v in spec.items()},
                mlp_ratio=cfg.MVIT.MLP_RATIO,
                qkv_bias=cfg.MVIT.QKV_BIAS,
                has_cls_embed=False,
                mode=cfg.MVIT.MODE,
                init_div=(
                    (2.0 * (i + 1)) ** 0.5
                    if cfg.MASK.SCALE_INIT_BY_DEPTH else 1.0
                ),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, (t, h, w), not train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)

        # decoder (reference _mae_forward_decoder :415-468)
        x = nn.Dense(dec_dim, kernel_init=trunc02, dtype=self.dtype,
                     name="decoder_embed")(x)
        mask_token = self.param("mask_token", trunc02, (1, 1, dec_dim))
        mask_tokens = jnp.broadcast_to(
            mask_token, (b, l - x.shape[1], dec_dim)
        ).astype(x.dtype)
        x_ = jnp.concatenate([x, mask_tokens], axis=1)
        x_ = jnp.take_along_axis(
            x_, ids_restore[..., None].astype(jnp.int32), axis=1
        )
        if cfg.MASK.DECODER_SEP_POS_EMBED:
            # separable decoder pos embed (reference masked.py:79,425-440):
            # spatial table tiled over T + temporal table repeated over HW
            pe_s = self.param(
                "dec_pos_embed_spatial", trunc02, (1, h * w, dec_dim)
            )
            pe_t = self.param(
                "dec_pos_embed_temporal", trunc02, (1, t, dec_dim)
            )
            dec_pe = jnp.tile(pe_s, (1, t, 1)) + jnp.repeat(
                pe_t, h * w, axis=1
            )
        else:
            dec_pe = self.param("decoder_pos_embed", trunc02, (1, l, dec_dim))
        x_ = x_ + dec_pe.astype(x_.dtype)

        u = 1 if cfg.MASK.TIME_STRIDE_LOSS else pt
        stride_hw = cfg.DATA.TRAIN_CROP_SIZE // h
        num_class = u * stride_hw * stride_hw * 3
        pred = SeparateHead(
            num_classes=num_class,
            feat_size=(t, h, w),
            decoder_depth=cfg.MASK.DECODER_DEPTH,
            decoder_embed_dim=dec_dim,
            kernel_kv=tuple(cfg.MASK.DEC_KV_KERNEL),
            stride_kv=tuple(cfg.MASK.DEC_KV_STRIDE),
            mode=cfg.MVIT.MODE,
            dtype=self.dtype,
            name="pred_head",
        )(x_, train)

        frames = imgs[:, ::pt] if cfg.MASK.TIME_STRIDE_LOSS else imgs
        label = patchify_3d(frames, stride_hw, u)
        if cfg.MASK.NORM_PRED_PIXEL:
            label = normalize_patches(label)
        if cfg.VIS_MASK.ENABLE:
            # reference masked.py:464-525 (_mae_visualize under
            # cfg.VIS_MASK.ENABLE): return (input, masked-input,
            # reconstruction-pasted-into-input) videos for the offline
            # dump (engine/train epoch-end -> utils/visualization)
            raw = patchify_3d(frames, stride_hw, u)
            rec = pred.astype(jnp.float32)
            if cfg.MASK.NORM_PRED_PIXEL:
                # denormalize with the target patch statistics, like the
                # reference's norm_pix paste (:489-497)
                mean = raw.mean(axis=-1, keepdims=True)
                var = raw.var(axis=-1, keepdims=True)
                rec = rec * jnp.sqrt(var + 1e-6) + mean
            m = mask[..., None]
            vis = tuple(
                unpatchify_3d(v, (t, h, w), stride_hw, u)
                for v in (raw, raw * (1.0 - m), rec * m + raw * (1.0 - m))
            )
            return [pred], [jax.lax.stop_gradient(label)], [mask], [1.0], vis
        return [pred], [jax.lax.stop_gradient(label)], [mask], [1.0]


def masked_mse(pred, label, mask):
    """Mean squared error over masked tokens only (static-shape form of the
    reference's ``loss[output_mask]`` + MultipleMSELoss)."""
    err = jnp.mean(
        jnp.square(pred.astype(jnp.float32) - label.astype(jnp.float32)),
        axis=-1,
    )
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
