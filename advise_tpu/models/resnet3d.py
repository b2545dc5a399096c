"""Single-pathway 3D ResNet (Slow / C2D / I3D / slow_c2d).

Reference: ``models/video_model_builder.py:38-109, 421-638``. Same stage
topology, temporal-kernel basis, pool placement, and head wiring; rebuilt
as one Flax module on NDHWC with optional per-stage rematerialization
(``TPU.REMAT`` / ``MODEL.ACT_CHECKPOINT``) instead of fairscale
checkpoint_wrapper.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.heads import ResNetBasicHead
from advise_tpu.models.layers.resnet import ResStage
from advise_tpu.models.layers.stem import ResNetBasicStem, max_pool_3d
from advise_tpu.models.utils import stage_remat

# reference video_model_builder.py:38
# depth 10 = (1,1,1,1) is an extension for fast CPU tests (not in reference)
MODEL_STAGE_DEPTH = {
    10: (1, 1, 1, 1),
    18: (2, 2, 2, 2),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}

# reference video_model_builder.py:41-99 (single-pathway entries)
TEMPORAL_KERNEL_BASIS = {
    "2d": [[1], [1], [1], [1], [1]],
    "c2d": [[1], [1], [1], [1], [1]],
    "slow_c2d": [[1], [1], [1], [1], [1]],
    "i3d": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "slow_i3d": [[5], [3], [3, 1], [3, 1], [1, 3]],
    "slow": [[1], [1], [1], [3], [3]],
    "x3d": [[5], [3], [3], [3], [3]],
}

# reference video_model_builder.py:102-109 (temporal pool after s2)
POOL1 = {
    "2d": (1, 1, 1),
    "c2d": (2, 1, 1),
    "slow_c2d": (1, 1, 1),
    "i3d": (2, 1, 1),
    "slow_i3d": (1, 1, 1),
    "slow": (1, 1, 1),
    "x3d": (1, 1, 1),
}


class ResNet3D(nn.Module):
    """cfg-driven single-pathway 3D ResNet.

    Input ``[B, T, H, W, C]``; returns head output (logits, or the
    [projection, *predictor] list when predictor_depths is set).
    """

    cfg: Any  # CfgRef(CfgNode)
    norm: type  # partial(SyncBatchNorm, ...)
    dtype: Optional[jnp.dtype] = None
    include_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        cfg = self.cfg
        arch = cfg.MODEL.ARCH.lower()
        assert arch in TEMPORAL_KERNEL_BASIS, arch
        d2, d3, d4, d5 = MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        num_groups = cfg.RESNET.NUM_GROUPS
        width = cfg.RESNET.WIDTH_PER_GROUP
        dim_inner = num_groups * width
        temp_kernel = TEMPORAL_KERNEL_BASIS[arch]

        stage_cls, stage_kwargs = stage_remat(cfg, ResStage)

        x = ResNetBasicStem(
            dim_out=width,
            temp_kernel=temp_kernel[0][0],
            norm=self.norm,
            dtype=self.dtype,
            s2d=cfg.TPU.STEM_S2D,
            name="s1",
        )(x, train)

        stage_args = [
            # dim_in,    dim_out,    dim_inner,    tks,          stride, n
            (width, width * 4, dim_inner, temp_kernel[1], cfg.RESNET.SPATIAL_STRIDES[0][0], d2, 0),
            (width * 4, width * 8, dim_inner * 2, temp_kernel[2], cfg.RESNET.SPATIAL_STRIDES[1][0], d3, 1),
            (width * 8, width * 16, dim_inner * 4, temp_kernel[3], cfg.RESNET.SPATIAL_STRIDES[2][0], d4, 2),
            (width * 16, width * 32, dim_inner * 8, temp_kernel[4], cfg.RESNET.SPATIAL_STRIDES[3][0], d5, 3),
        ]
        for si, (din, dout, dinn, tks, stride, nblk, idx) in enumerate(stage_args):
            x = stage_cls(
                dim_in=[din],
                dim_out=[dout],
                dim_inner=[dinn],
                temp_kernel_sizes=[tks],
                stride=[stride],
                num_blocks=[nblk],
                num_groups=[num_groups],
                num_block_temp_kernel=[cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[idx][0]],
                nonlocal_inds=[tuple(cfg.NONLOCAL.LOCATION[idx][0])],
                nonlocal_group=[cfg.NONLOCAL.GROUP[idx][0]],
                nonlocal_pool=[cfg.NONLOCAL.POOL[idx][0]],
                instantiation=cfg.NONLOCAL.INSTANTIATION,
                trans_func_name=cfg.RESNET.TRANS_FUNC,
                stride_1x1=cfg.RESNET.STRIDE_1X1,
                dilation=[cfg.RESNET.SPATIAL_DILATIONS[idx][0]],
                zero_init_final_bn=cfg.RESNET.ZERO_INIT_FINAL_BN,
                zero_init_final_conv=cfg.RESNET.ZERO_INIT_FINAL_CONV,
                norm=self.norm,
                dtype=self.dtype,
                name=f"s{si + 2}",
                **stage_kwargs,
            )([x], train)[0]
            if si == 0:  # pool after s2 (reference forward :628-632)
                pool = POOL1[arch]
                if any(p > 1 for p in pool):
                    x = max_pool_3d(x, pool, pool, "VALID")

        if not self.include_head:
            return x

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
        return head([x], train)
