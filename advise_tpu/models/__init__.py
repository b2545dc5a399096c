"""Model registry + builder.

Reference: ``models/build.py:17-88`` (fvcore Registry + DDP wrap). Here
``build_model`` returns a Flax module; there is no DDP wrap — data
parallelism is the train step's psum, and dtype policy replaces AMP.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax.numpy as jnp

from advise_tpu.config.node import CfgRef
from advise_tpu.models.layers.norm import get_norm
from advise_tpu.parallel.mesh import bn_axis_names

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def compute_dtype(cfg):
    return jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32


def build_model(cfg, sync_axes: Tuple[str, ...] = None):
    """Construct the configured model.

    ``sync_axes``: mesh axes for BN sync; pass None to derive from cfg (use
    () when the model will run outside shard_map). The same None/() signal
    gates the pipeline-parallel execution path (TPU.MESH_PIPE > 1): like
    subgroup SyncBN, the pipelined segment needs its mesh axis bound, so
    only the in-step model (sync_axes=None) enables it.
    """
    name = cfg.MODEL.MODEL_NAME
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown MODEL.MODEL_NAME={name}; known: {sorted(MODEL_REGISTRY)}"
        )
    in_step = sync_axes is None
    if sync_axes is None:
        sync_axes = bn_axis_names(cfg)
    norm = get_norm(cfg, tuple(sync_axes))
    pipeline = in_step and int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1) > 1
    return MODEL_REGISTRY[name](
        CfgRef(cfg), norm, compute_dtype(cfg), pipeline=pipeline
    )


# -- registrations (import order matters only for registry population) -----
from advise_tpu.models.resnet3d import ResNet3D  # noqa: E402
from advise_tpu.models.slowfast import SlowFast  # noqa: E402
from advise_tpu.models.x3d import X3D  # noqa: E402


@register_model("ResNet")
def _build_resnet(cfg, norm, dtype, **kw):
    return ResNet3D(cfg=cfg, norm=norm, dtype=dtype)


@register_model("SlowFast")
def _build_slowfast(cfg, norm, dtype, **kw):
    return SlowFast(cfg=cfg, norm=norm, dtype=dtype)


@register_model("X3D")
def _build_x3d(cfg, norm, dtype, **kw):
    return X3D(cfg=cfg, norm=norm, dtype=dtype)


from advise_tpu.models.contrastive import ContrastiveModel  # noqa: E402
from advise_tpu.models.mvit import MViT  # noqa: E402
from advise_tpu.models.masked import MaskMViT  # noqa: E402


@register_model("MViT")
def _build_mvit(cfg, norm, dtype, pipeline=False, **kw):
    return MViT(cfg=cfg, norm=norm, dtype=dtype, pipeline=pipeline)


@register_model("MaskMViT")
def _build_maskmvit(cfg, norm, dtype, pipeline=False, **kw):
    return MaskMViT(cfg=cfg, norm=norm, dtype=dtype, pipeline=pipeline)


from advise_tpu.models.swin3d import SwinTransformer3D  # noqa: E402
from advise_tpu.models.temporal_model import TemporalModel  # noqa: E402


@register_model("SwinTransformer3D")
def _build_swin3d(cfg, norm, dtype, **kw):
    return SwinTransformer3D(cfg=cfg, norm=norm, dtype=dtype)


@register_model("TemporalModel")
def _build_temporal(cfg, norm, dtype, **kw):
    return TemporalModel(cfg=cfg, norm=norm, dtype=dtype)



@register_model("ContrastiveModel")
def _build_contrastive(cfg, norm, dtype, **kw):
    return ContrastiveModel(cfg=cfg, norm=norm, dtype=dtype)
