"""AdViSe TemporalModel: frozen CLIP spatial encoder + trainable temporal head.

Reference: ``models/temporal_modeling.py:16-392``. Structure preserved:

  clip [N, T, H, W, 3]
    -> per-frame CLIP ViT tokens [N*T, hw, D]   (frozen unless FROM_SCRATCH,
                                                 bf16 if TM.ENABLE_BF16)
    -> optional channel pool / spatial pool
    -> temporal encoder (conv3d | resnet3d ResStage | video_swin BasicLayer |
       transformer encoder layer)                (the trainable part)
    -> head_bridge (temporal concat pooling)
    -> head_cls MLP logits;  BYOL branch: projector/predictor vs EMA twins.

EMA twins (temporal_encoder_hist / head_projector_hist, reference
``:217-238``) live functionally in TrainState.ssl — the step computes keys
by applying the SAME modules with swapped EMA params (see
``engine/steps.tmodeling_task_loss``), so the module tree has no frozen
duplicates.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.utils import remat_policy

from advise_tpu.models.clip_vit import CLIPViT
from advise_tpu.models.layers.heads import MLPHead, ResNetBasicHead
from advise_tpu.models.layers.resnet import ResStage
from advise_tpu.models.swin3d import BasicLayer


class Conv3dTemporal(nn.Module):
    """conv3d temporal arch (reference load_temporal_model :46-66)."""

    hidden_dim: int
    out_dim: int
    ks: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        pad = "VALID" if self.ks == 1 else ((1, 1), (1, 1), (1, 1))
        x = nn.Conv(
            self.hidden_dim, (self.ks,) * 3, padding=pad, dtype=self.dtype,
            name="conv1",
        )(x)
        x = nn.silu(x)
        x = nn.Conv(
            self.out_dim, (self.ks,) * 3, padding=pad, dtype=self.dtype,
            name="conv2",
        )(x)
        return x


class TransformerTemporal(nn.Module):
    """tfmer_enc arch: one pre-norm transformer encoder layer over the
    flattened (T, H, W) token grid (reference :110-121)."""

    heads: int
    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        b, t, h, w, d = x.shape
        tokens = x.reshape(b, t * h * w, d)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tokens)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(y, y)
        tokens = tokens + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tokens)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        tokens = tokens + y
        return tokens.reshape(b, t, h, w, d)


class TemporalModel(nn.Module):
    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.cfg
        arch = (cfg.MODEL.SPATIAL_MODEL_ARCH or "").lower()
        width = cfg.MODEL.SPATIAL_EMBEDDING_DIM
        patch = 32 if "32" in arch else 16
        sdtype = jnp.bfloat16 if cfg.TM.ENABLE_BF16 else self.dtype
        self.spatial_encoder = CLIPViT(
            width=width,
            layers=cfg.MODEL.TEMPORAL_NUM_LAYERS * 2,  # ViT-B default 12
            heads=max(width // 64, 1),
            patch_size=patch,
            image_size=cfg.AUG.TARGET_SIZE * (2 if cfg.AUG.TARGET_SIZE == 112 else 1),
            dtype=sdtype,
            name="spatial_encoder",
        )
        chn = cfg.TM.CHANNEL_POOL_DIM or width
        ks = 1 if cfg.TM.SPATIAL_POOL_DIM == 1 else 3
        t_arch = cfg.TM.TEMPORAL_ARCH
        if not cfg.TM.SKIP_TM:
            if t_arch == "conv3d":
                self.temporal_encoder = Conv3dTemporal(
                    hidden_dim=cfg.MODEL.TEMPORAL_HIDDEN_DIM,
                    out_dim=cfg.MODEL.TEMPORAL_EMBEDDING_DIM,
                    ks=ks,
                    dtype=self.dtype,
                    name="temporal_encoder",
                )
            elif t_arch == "resnet3d":
                self.temporal_encoder = _ResStageTemporal(
                    cfg=self.cfg, norm=self.norm, chn=chn, dtype=self.dtype,
                    name="temporal_encoder",
                )
            elif t_arch == "video_swin":
                assert chn == cfg.MODEL.TEMPORAL_EMBEDDING_DIM
                self.temporal_encoder = _SwinTemporal(
                    cfg=self.cfg, dtype=self.dtype, name="temporal_encoder"
                )
            elif t_arch == "tfmer_enc":
                self.temporal_encoder = TransformerTemporal(
                    heads=cfg.TM.NUM_HEADS,
                    hidden_dim=cfg.MODEL.TEMPORAL_HIDDEN_DIM,
                    dtype=self.dtype,
                    name="temporal_encoder",
                )
            else:
                raise NotImplementedError(t_arch)

        if cfg.TM.TEMPORAL_CAT and cfg.TM.LINEAR_PROJ:
            # reference :178-180: nn.Linear(TEMPORAL_EMBEDDING_DIM, t_dim)
            self.bridge_proj = nn.Dense(
                cfg.MODEL.TEMPORAL_EMBEDDING_DIM // cfg.DATA.NUM_FRAMES,
                dtype=self.dtype,
                name="bridge_proj",
            )
        self.head_cls = _Head(
            cfg=self.cfg, num_classes=cfg.MODEL.NUM_CLASSES, dtype=self.dtype,
            name="head_cls",
        )
        if "byol" in cfg.SSL.TASK:
            self.head_projector = _Head(
                cfg=self.cfg, num_classes=cfg.CONTRASTIVE.DIM,
                dtype=self.dtype, name="head_projector",
            )
            self.head_predictor = _Head(
                cfg=self.cfg, num_classes=cfg.CONTRASTIVE.DIM,
                dtype=self.dtype, name="head_predictor",
            )

    # -- pieces ---------------------------------------------------------------
    def spatial_forward(self, x, train: bool):
        """[N, H, W, 3] -> [N, nh, nw, D] (reference :240-274)."""
        cfg = self.cfg
        if cfg.TM.ENABLE_BF16:
            x = x.astype(jnp.bfloat16)
        _, tokens = self.spatial_encoder(x)
        if not cfg.TM.FROM_SCRATCH:
            tokens = jax.lax.stop_gradient(tokens)
        n = tokens.shape[0]
        hw = int(tokens.shape[1] ** 0.5)
        d = tokens.shape[2]
        feats = tokens.reshape(n, hw, hw, d).astype(jnp.float32)
        if cfg.TM.CHANNEL_POOL_DIM and d != cfg.TM.CHANNEL_POOL_DIM:
            p = cfg.TM.CHANNEL_POOL_DIM
            feats = feats.reshape(n, hw, hw, p, d // p).mean(-1)
        if cfg.TM.SPATIAL_POOL_DIM and hw != cfg.TM.SPATIAL_POOL_DIM:
            sp = cfg.TM.SPATIAL_POOL_DIM
            feats = feats.reshape(n, sp, hw // sp, sp, hw // sp, -1).mean(
                axis=(2, 4)
            )
        return feats

    def head_bridge(self, feat):
        """Temporal concat pooling (reference :299-309). feat:
        [N, T, nh, nw, D] -> [N, TEMPORAL_EMBEDDING_DIM].

        TM.LINEAR_PROJ (reference :175-180, :301-307): instead of the
        adaptive avg-pool over (T, nh, nw), a learned Linear D -> t_dim
        projects each token, spatial dims average-pool, and the
        [t_dim, T] grid flattens channel-major like the torch reshape."""
        cfg = self.cfg
        n = feat.shape[0]
        if cfg.TM.TEMPORAL_CAT:
            t_dim = cfg.MODEL.TEMPORAL_EMBEDDING_DIM // cfg.DATA.NUM_FRAMES
            if cfg.TM.LINEAR_PROJ:
                proj = self.bridge_proj(feat)  # [N, T, nh, nw, t_dim]
                pooled = proj.mean(axis=(2, 3))  # [N, T, t_dim]
                return pooled.transpose(0, 2, 1).reshape(n, -1)
            # adaptive avg pool to (t_dim, 1, 1) over (T, nh, nw), then
            # flatten channels*t_dim
            nt = feat.shape[1]
            pooled = feat.mean(axis=(2, 3))  # [N, T, D]
            if nt != t_dim:
                assert nt % t_dim == 0, (nt, t_dim)
                pooled = pooled.reshape(n, t_dim, nt // t_dim, -1).mean(2)
            return pooled.reshape(n, -1)
        return feat.mean(axis=(1, 2, 3))

    def features(self, x, train: bool = True):
        """Online feature path for flat clips [N, T, H, W, 3] -> [N, D]."""
        cfg = self.cfg
        n, t = x.shape[:2]
        frames = x.reshape(n * t, *x.shape[2:])
        sp = self.spatial_forward(frames, train)
        _, nh, nw, d = sp.shape
        grid = sp.reshape(n, t, nh, nw, d)
        if not cfg.TM.SKIP_TM:
            grid = self.temporal_encoder(grid, train)
        return self.head_bridge(grid)

    def classify(self, feat, train: bool = True):
        return self.head_cls(feat, train)

    def project(self, feat, train: bool = True):
        return self.head_projector(feat, train)

    def predict(self, proj, train: bool = True):
        return self.head_predictor(proj, train)

    def __call__(self, x, train: bool = True):
        """x: [N, T, H, W, 3] flat clips -> logits [N, num_classes]."""
        feat = self.features(x, train)
        return self.classify(feat, train)

    def init_all(self, x, train: bool = False):
        """Touch every head so init materializes the full param tree
        (the BYOL projector/predictor are only used via methods)."""
        feat = self.features(x, train)
        logits = self.classify(feat, train)
        if "byol" in self.cfg.SSL.TASK:
            proj = self.project(feat, train)
            _ = self.predict(proj, train)
        return logits


class _Head(nn.Module):
    """load_head (reference :126-140): Linear or MLPHead."""

    cfg: Any
    num_classes: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.cfg
        if cfg.SSL.NUM_MLP_LAYERS == 1:
            return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        if cfg.MODEL.DROPOUT_RATE > 0:
            x = nn.Dropout(cfg.MODEL.DROPOUT_RATE)(x, deterministic=not train)
        return MLPHead(
            dim_out=self.num_classes,
            mlp_dim=cfg.SSL.MLP_DIM,
            num_layers=cfg.SSL.NUM_MLP_LAYERS,
            bn_on=cfg.SSL.BN_MLP,
            dtype=self.dtype,
            name="mlp",
        )(x, train)


class _ResStageTemporal(nn.Module):
    """resnet3d temporal arch (reference :67-90): one ResStage."""

    cfg: Any
    norm: Any
    chn: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.cfg
        return ResStage(
            dim_in=[self.chn],
            dim_out=[cfg.MODEL.TEMPORAL_EMBEDDING_DIM],
            dim_inner=[cfg.MODEL.TEMPORAL_HIDDEN_DIM],
            temp_kernel_sizes=[[1]],
            stride=[cfg.RESNET.SPATIAL_STRIDES[0][0]],
            num_blocks=[cfg.TM.NUM_BLOCKS],
            num_groups=[1],
            num_block_temp_kernel=[1],
            nonlocal_inds=[tuple(cfg.NONLOCAL.LOCATION[0][0])],
            nonlocal_group=[cfg.NONLOCAL.GROUP[0][0]],
            nonlocal_pool=[cfg.NONLOCAL.POOL[0][0]],
            instantiation=cfg.NONLOCAL.INSTANTIATION,
            trans_func_name=cfg.RESNET.TRANS_FUNC,
            stride_1x1=cfg.RESNET.STRIDE_1X1,
            dilation=[cfg.RESNET.SPATIAL_DILATIONS[0][0]],
            norm=self.norm,
            dtype=self.dtype,
            name="stage",
        )([x], train)[0]


class _SwinTemporal(nn.Module):
    """video_swin temporal arch (reference :91-109): one BasicLayer with
    window (4, 7, 7)."""

    cfg: Any
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = self.cfg
        return BasicLayer(
            dim=cfg.MODEL.TEMPORAL_EMBEDDING_DIM,
            depth=cfg.TM.NUM_BLOCKS,
            num_heads=cfg.TM.NUM_HEADS,
            window_size=(4, 7, 7),
            qkv_bias=False,
            dtype=self.dtype,
            remat=bool(cfg.TPU.REMAT),
            remat_pol=remat_policy(cfg),
            name="layer",
        )(x, not train)
