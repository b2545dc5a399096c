"""Contrastive model: backbone dispatch + SwAV prototypes.

Reference: ``models/contrastive.py:31-128`` (ContrastiveModel构造).
The torch version is a stateful wrapper owning EMA twins, queues, and
memory banks as buffers; here the *module* is only the parametric part
(backbone with contrastive head + optional prototypes). All algorithm
state (EMA params, queue, pointer, memory banks, kNN memory) lives in
``TrainState.ssl`` and the algorithm logic in
``advise_tpu/engine/contrastive.py`` — the functional split SPMD needs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.mvit import MViT
from advise_tpu.models.resnet3d import ResNet3D
from advise_tpu.models.slowfast import SlowFast
from advise_tpu.models.swin3d import SwinTransformer3D
from advise_tpu.models.x3d import X3D

SWAV_NUM_PROTOTYPES = 1000  # reference contrastive.py:104 (hardcoded 1000)


def _backbone_cls(arch: str):
    """_MODEL_TYPES dispatch (reference contrastive.py:20-29 + build :40).
    'swin' has no reference counterpart (the reference carries
    SwinTransformer3D standalone only); it backs the Swin-B MoCo flagship
    (BASELINE.json config #4)."""
    arch = arch.lower()
    if arch == "slowfast":
        return SlowFast
    if arch == "x3d":
        return X3D
    if arch == "mvit":
        return MViT
    if arch in ("swin", "video_swin", "swin3d"):
        return SwinTransformer3D
    if arch in ("slow", "c2d", "i3d", "slow_c2d"):
        return ResNet3D
    raise KeyError(f"ContrastiveModel: unknown MODEL.ARCH={arch!r}")


class ContrastiveModel(nn.Module):
    """Backbone with CONTRASTIVE.DIM head (+ predictor stack for BYOL) and
    optional SwAV prototypes.

    ``__call__`` returns the raw head output: a single projection [B, dim],
    or a list [proj, pred...] when CONTRASTIVE.PREDICTOR_DEPTHS is set.
    """

    cfg: Any  # CfgRef
    norm: Any
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.backbone = _backbone_cls(self.cfg.MODEL.ARCH)(
            cfg=self.cfg, norm=self.norm, dtype=self.dtype, name="backbone"
        )
        if self.cfg.CONTRASTIVE.TYPE == "swav":
            # declared eagerly (not a lazy Dense) so init() creates it even
            # though __call__ never touches the prototypes
            self.swav_prototypes = self.param(
                "swav_prototypes",
                nn.initializers.lecun_normal(),
                (self.cfg.CONTRASTIVE.DIM, SWAV_NUM_PROTOTYPES),
            )

    def __call__(self, x: jnp.ndarray, train: bool = True,
                 stem_conv_out=None):
        if stem_conv_out is not None:
            # TPU.FUSE_EMA_STEM: precomputed stem-conv outputs (SlowFast)
            return self.backbone(x, train, stem_conv_out=stem_conv_out)
        return self.backbone(x, train)

    def prototypes(self, proj: jnp.ndarray) -> jnp.ndarray:
        """Scores against L2-normalized prototypes. The reference renorms
        the prototype weights in-place each step (contrastive.py:620-625);
        the straight-through form below has the same value and the same
        gradient (identity to the raw weight)."""
        w = self.swav_prototypes
        w_n = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-12)
        w_used = w + jax.lax.stop_gradient(w_n - w)
        return proj.astype(w.dtype) @ w_used
