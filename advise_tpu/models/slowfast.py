"""SlowFast two-pathway network.

Reference: ``models/video_model_builder.py:112-418`` (a model family the
reference fork left unbuildable — cfg.SLOWFAST.* was dropped from its
defaults; restored first-class here, SURVEY.md §0).

The model takes ONE clip tensor ``[B, T_fast, H, W, C]`` and derives the
slow pathway internally by temporal subsampling every ALPHA-th frame (the
reference expects a pre-packed 2-tensor list from the dead
``pack_pathway_output`` helper; folding the split into the model keeps the
loader single-tensor and XLA-fusable).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.common import msra_init
from advise_tpu.models.layers.heads import ResNetBasicHead
from advise_tpu.models.layers.resnet import ResStage
from advise_tpu.models.layers.stem import ResNetBasicStem, max_pool_3d
from advise_tpu.models.resnet3d import MODEL_STAGE_DEPTH
from advise_tpu.models.utils import stage_remat

# reference video_model_builder.py:89-96 'slowfast' temporal kernel basis
SLOWFAST_TEMP_KERNELS = [
    ([1], [5]),  # conv1 (slow, fast)
    ([1], [3]),  # res2
    ([1], [3]),  # res3
    ([3], [3]),  # res4
    ([3], [3]),  # res5
]


class FuseFastToSlow(nn.Module):
    """Strided temporal conv from fast to slow, concat on channels
    (reference :112-169)."""

    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Any
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_s, x_f, train: bool):
        dim_in = x_f.shape[-1]
        fuse = nn.Conv(
            dim_in * self.fusion_conv_channel_ratio,
            kernel_size=(self.fusion_kernel, 1, 1),
            strides=(self.alpha, 1, 1),
            padding=((self.fusion_kernel // 2,) * 2, (0, 0), (0, 0)),
            use_bias=False,
            kernel_init=msra_init,
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        fuse = self.norm(name="bn", dtype=self.dtype)(fuse, train)
        fuse = nn.relu(fuse)
        return jnp.concatenate([x_s, fuse], axis=-1), x_f


class SlowFast(nn.Module):
    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None
    include_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 stem_conv_out=None):
        """``stem_conv_out``: optional (slow_conv, fast_conv) pair of
        precomputed stem-conv outputs (TPU.FUSE_EMA_STEM: the engine
        computes BOTH towers' stem convs as one channel-concatenated
        conv — see engine/contrastive.fused_stem_conv_outs); stems then
        run only their BN/relu/pool."""
        cfg = self.cfg
        alpha = cfg.SLOWFAST.ALPHA
        beta_inv = cfg.SLOWFAST.BETA_INV
        fuse_ratio = cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        fuse_k = cfg.SLOWFAST.FUSION_KERNEL_SZ
        out_dim_ratio = beta_inv // fuse_ratio

        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        stage_cls, stage_kwargs = stage_remat(cfg, ResStage)
        num_groups = cfg.RESNET.NUM_GROUPS
        w = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * w

        # derive pathways from a single clip: fast = all frames, slow = ::alpha
        x_f = x
        x_s = x[:, ::alpha]

        tk = SLOWFAST_TEMP_KERNELS
        slow_conv = fast_conv = None
        if stem_conv_out is not None:
            slow_conv, fast_conv = stem_conv_out
        x_s = ResNetBasicStem(
            dim_out=w, temp_kernel=tk[0][0][0], norm=self.norm, dtype=self.dtype,
            s2d=cfg.TPU.STEM_S2D, name="s1_slow",
        )(x_s, train, conv_out=slow_conv)
        x_f = ResNetBasicStem(
            dim_out=w // beta_inv, temp_kernel=tk[0][1][0], norm=self.norm,
            dtype=self.dtype, s2d=cfg.TPU.STEM_S2D,
            pad_out=int(cfg.TPU.STEM_PAD_OUT),
            pallas=bool(cfg.TPU.PALLAS_STEM),
            pallas_wgrad_only=bool(cfg.TPU.PALLAS_STEM_WGRAD_ONLY),
            pallas_chunk=int(cfg.TPU.PALLAS_STEM_CHUNK),
            name="s1_fast",
        )(x_f, train, conv_out=fast_conv)
        if cfg.TPU.STEM_BARRIER:
            # pin the stem outputs: XLA's HLO rematerialization pass may
            # not clone across an optimization barrier, so the backward
            # reuses these instead of recomputing the stem conv chain
            # (the traced fusion.3088 + .remat twin, BASELINE.md)
            x_s, x_f = jax.lax.optimization_barrier((x_s, x_f))
        x_s, x_f = FuseFastToSlow(
            fusion_conv_channel_ratio=fuse_ratio, fusion_kernel=fuse_k,
            alpha=alpha, norm=self.norm, dtype=self.dtype, name="s1_fuse",
        )(x_s, x_f, train)

        stage_dims = [
            # (slow_in_base, out_mult, inner_mult, n_blocks, stage_idx)
            (w, 4, 1, d2, 0),
            (w * 4, 8, 2, d3, 1),
            (w * 8, 16, 4, d4, 2),
            (w * 16, 32, 8, d5, 3),
        ]
        for si, (base_in, out_m, in_m, nblk, idx) in enumerate(stage_dims):
            slow_in = base_in + base_in // out_dim_ratio
            fast_in = base_in // beta_inv
            outs = stage_cls(
                dim_in=[slow_in, fast_in],
                dim_out=[w * out_m, w * out_m // beta_inv],
                dim_inner=[dim_inner * in_m, dim_inner * in_m // beta_inv],
                temp_kernel_sizes=[tk[si + 1][0], tk[si + 1][1]],
                stride=[cfg.RESNET.SPATIAL_STRIDES[idx][0]] * 2,
                num_blocks=[nblk] * 2,
                num_groups=[num_groups] * 2,
                num_block_temp_kernel=[
                    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[idx][0]
                ] * 2,
                nonlocal_inds=[
                    tuple(cfg.NONLOCAL.LOCATION[idx][0]),
                    tuple(
                        cfg.NONLOCAL.LOCATION[idx][1]
                        if len(cfg.NONLOCAL.LOCATION[idx]) > 1
                        else ()
                    ),
                ],
                nonlocal_group=[cfg.NONLOCAL.GROUP[idx][0]] * 2,
                nonlocal_pool=[cfg.NONLOCAL.POOL[idx][0]] * 2,
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=[cfg.RESNET.SPATIAL_DILATIONS[idx][0]] * 2,
                zero_init_final_bn=cfg.RESNET.ZERO_INIT_FINAL_BN,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                norm=self.norm,
                dtype=self.dtype,
                name=f"s{si + 2}",
                **stage_kwargs,
            )([x_s, x_f], train)
            x_s, x_f = outs[0], outs[1]
            if si < 3:  # fuse after s2..s4 (reference forward :183-193)
                x_s, x_f = FuseFastToSlow(
                    fusion_conv_channel_ratio=fuse_ratio, fusion_kernel=fuse_k,
                    alpha=alpha, norm=self.norm, dtype=self.dtype,
                    name=f"s{si + 2}_fuse",
                )(x_s, x_f, train)

        if not self.include_head:
            return x_s, x_f

        contrastive = cfg.MODEL.MODEL_NAME == "ContrastiveModel"
        head = ResNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES if not contrastive else cfg.CONTRASTIVE.DIM,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            detach_final_fc=cfg.MODEL.DETACH_FINAL_FC,
            l2norm=cfg.SSL.HEAD_L2_NORM,
            num_mlp_layers=(
                cfg.CONTRASTIVE.NUM_MLP_LAYERS if contrastive else cfg.SSL.NUM_MLP_LAYERS
            ),
            mlp_dim=cfg.CONTRASTIVE.MLP_DIM if contrastive else cfg.SSL.MLP_DIM,
            bn_mlp=cfg.CONTRASTIVE.BN_MLP if contrastive else cfg.SSL.BN_MLP,
            bn_sync_axes=(
                self.norm.keywords.get("sync_axes", ())
                if (cfg.CONTRASTIVE.BN_SYNC_MLP if contrastive else cfg.SSL.BN_SYNC_MLP)
                else ()
            ),
            predictor_depths=(
                tuple(cfg.CONTRASTIVE.PREDICTOR_DEPTHS) if contrastive else ()
            ),
            predictor_mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            predictor_bn=cfg.CONTRASTIVE.BN_MLP,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=self.dtype,
            name="head",
        )
        return head([x_s, x_f], train)
