"""X3D: progressive-expansion efficient video network.

Reference: ``models/video_model_builder.py:641-784`` (another family the
fork left unbuildable — cfg.X3D.* restored here). Channelwise Tx3x3 convs
+ SE + Swish via X3DTransform; width/depth expansion via round_width.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.heads import X3DHead
from advise_tpu.models.layers.resnet import ResStage
from advise_tpu.models.layers.stem import X3DStem
from advise_tpu.models.utils import round_width, stage_remat

# X3D temporal kernel basis (reference video_model_builder.py:92-99 "x3d")
X3D_TEMP_KERNELS = [[5], [3], [3], [3], [3]]


class X3D(nn.Module):
    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None
    include_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        cfg = self.cfg
        exp_stage = 2.0
        dim_c1 = cfg.X3D.DIM_C1
        dim_res2 = (
            round_width(dim_c1, exp_stage, divisor=8)
            if cfg.X3D.SCALE_RES2
            else dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        block_basis = [
            (1, dim_res2, 2),
            (2, dim_res3, 2),
            (5, dim_res4, 2),
            (3, dim_res5, 2),
        ]
        w_mul = cfg.X3D.WIDTH_FACTOR
        d_mul = cfg.X3D.DEPTH_FACTOR
        dim_res1 = round_width(dim_c1, w_mul)
        num_groups = cfg.RESNET.NUM_GROUPS

        x = X3DStem(
            dim_out=dim_res1,
            temp_kernel=X3D_TEMP_KERNELS[0][0],
            norm=self.norm,
            dtype=self.dtype,
            name="s1",
        )(x, train)

        dim_in = dim_res1
        dim_out = dim_in
        dim_inner = dim_in
        stage_cls, stage_kwargs = stage_remat(cfg, ResStage)
        for stage, (blocks, c, stride) in enumerate(block_basis):
            dim_out = round_width(c, w_mul)
            dim_inner = int(cfg.X3D.BOTTLENECK_FACTOR * dim_out)
            n_rep = int(math.ceil(d_mul * blocks))
            x = stage_cls(
                dim_in=[dim_in],
                dim_out=[dim_out],
                dim_inner=[dim_inner],
                temp_kernel_sizes=[X3D_TEMP_KERNELS[1]],
                stride=[stride],
                num_blocks=[n_rep],
                num_groups=[dim_inner]
                if cfg.X3D.CHANNELWISE_3x3x3
                else [num_groups],
                num_block_temp_kernel=[n_rep],
                nonlocal_inds=[tuple(cfg.NONLOCAL.LOCATION[0][0])],
                nonlocal_group=[cfg.NONLOCAL.GROUP[0][0]],
                nonlocal_pool=[cfg.NONLOCAL.POOL[0][0]],
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name="x3d_transform",
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=[cfg.RESNET.SPATIAL_DILATIONS[stage][0]],
                drop_connect_rate=cfg.MODEL.DROPCONNECT_RATE
                * (stage + 2)
                / (len(block_basis) + 1),
                zero_init_final_bn=cfg.RESNET.ZERO_INIT_FINAL_BN,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                norm=self.norm,
                dtype=self.dtype,
                name=f"s{stage + 2}",
                **stage_kwargs,
            )([x], train)[0]
            dim_in = dim_out

        if not self.include_head:
            return x

        contrastive = cfg.MODEL.MODEL_NAME == "ContrastiveModel"
        head = X3DHead(
            dim_inner=dim_inner,
            dim_out=cfg.X3D.DIM_C5,
            num_classes=(
                cfg.CONTRASTIVE.DIM if contrastive else cfg.MODEL.NUM_CLASSES
            ),
            norm=self.norm,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            bn_lin5_on=cfg.X3D.BN_LIN5,
            num_mlp_layers=(
                cfg.CONTRASTIVE.NUM_MLP_LAYERS if contrastive else 1
            ),
            mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            bn_mlp=cfg.CONTRASTIVE.BN_MLP if contrastive else False,
            bn_sync_axes=(
                self.norm.keywords.get("sync_axes", ())
                if (contrastive and cfg.CONTRASTIVE.BN_SYNC_MLP)
                else ()
            ),
            predictor_depths=(
                tuple(cfg.CONTRASTIVE.PREDICTOR_DEPTHS) if contrastive else ()
            ),
            predictor_mlp_dim=cfg.CONTRASTIVE.MLP_DIM,
            predictor_bn=cfg.CONTRASTIVE.BN_MLP if contrastive else False,
            dtype=self.dtype,
            name="head",
        )
        return head([x], train)
