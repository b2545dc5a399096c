"""Heads: MLP projector, ResNet basic head, X3D head, transformer head.

Reference: ``models/head_helper.py:20-566``. The BYOL predictor stack
(CONTRASTIVE.PREDICTOR_DEPTHS) hangs off the basic head exactly as in the
reference so ContrastiveModel can reuse it.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from advise_tpu.models.layers.common import fc_init
from advise_tpu.models.layers.norm import SyncBatchNorm


class MLPHead(nn.Module):
    """N-layer projection MLP with optional (sync) BN between layers
    (reference head_helper.py:20-68 MLPHead): [Linear -> BN -> ReLU] x
    (n-1) -> Linear. Xavier-uniform init like the reference's
    ``xavier_init=True`` default."""

    dim_out: int
    mlp_dim: int
    num_layers: int
    bn_on: bool = False
    use_bias: bool = True
    sync_axes: Tuple[str, ...] = ()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dim = x.shape[-1]
        init = nn.initializers.xavier_uniform()
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.mlp_dim,
                use_bias=self.use_bias and not self.bn_on,
                kernel_init=init,
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            if self.bn_on:
                x = SyncBatchNorm(
                    sync_axes=self.sync_axes, dtype=self.dtype, name=f"bn{i}"
                )(x, train)
            x = nn.relu(x)
        x = nn.Dense(
            self.dim_out,
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            name=f"fc{self.num_layers - 1}",
        )(x)
        return x


class ResNetBasicHead(nn.Module):
    """Global avg-pool -> dropout -> projection (linear or MLP) head with
    optional detach / l2norm / eval activation and BYOL predictors
    (reference head_helper.py:71-266)."""

    num_classes: int
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    l2norm: bool = False
    num_mlp_layers: int = 1
    mlp_dim: int = 2048
    bn_mlp: bool = False
    bn_sync_axes: Tuple[str, ...] = ()
    predictor_depths: Sequence[int] = ()
    predictor_mlp_dim: int = 2048
    predictor_bn: bool = False
    fc_init_std: float = 0.01
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool
    ) -> jnp.ndarray:
        # inputs: list of per-pathway [B, T, H, W, C]
        pooled = [jnp.mean(v, axis=(1, 2, 3)) for v in inputs]
        x = jnp.concatenate(pooled, axis=-1) if len(pooled) > 1 else pooled[0]
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        if self.l2norm:
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        if self.num_mlp_layers == 1:
            x = nn.Dense(
                self.num_classes,
                kernel_init=fc_init(self.fc_init_std),
                dtype=self.dtype,
                name="projection",
            )(x)
        else:
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.mlp_dim,
                num_layers=self.num_mlp_layers,
                bn_on=self.bn_mlp,
                sync_axes=self.bn_sync_axes,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        outputs = [x]
        # BYOL predictor chain (reference :165-182, :216-233): each predictor
        # maps the previous output; all stages are returned.
        for i, depth in enumerate(self.predictor_depths):
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.predictor_mlp_dim,
                num_layers=depth,
                bn_on=self.predictor_bn,
                sync_axes=self.bn_sync_axes,
                dtype=self.dtype,
                name=f"predictor{i}",
            )(x, train)
            outputs.append(x)
        out = outputs[-1] if len(outputs) == 1 else outputs
        if not train and self.act_func != "none" and len(outputs) == 1:
            if self.act_func == "softmax":
                out = nn.softmax(out, axis=-1)
            elif self.act_func == "sigmoid":
                out = nn.sigmoid(out)
            else:
                raise NotImplementedError(self.act_func)
        return out


class X3DHead(nn.Module):
    """conv5 (1x1x1 expand) -> BN -> ReLU -> pool -> lin5 -> (BN) -> ReLU ->
    dropout -> fc (reference head_helper.py X3DHead). With
    ``num_mlp_layers > 1`` the final fc becomes a contrastive projection
    MLP (+ optional BYOL predictor stack), mirroring ResNetBasicHead so
    X3D serves as a ContrastiveModel backbone (reference _MODEL_TYPES
    'x3d', contrastive.py:20-29)."""

    dim_inner: int
    dim_out: int
    num_classes: int
    norm: Callable
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    num_mlp_layers: int = 1
    mlp_dim: int = 2048
    bn_mlp: bool = False
    bn_sync_axes: Tuple[str, ...] = ()
    predictor_depths: Sequence[int] = ()
    predictor_mlp_dim: int = 2048
    predictor_bn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool):
        x = inputs[0]
        x = nn.Conv(
            self.dim_inner, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="conv_5",
        )(x)
        x = self.norm(name="conv_5_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = nn.Conv(
            self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
            name="lin_5",
        )(x)
        if self.bn_lin5_on:
            x = self.norm(name="lin_5_bn", dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.num_mlp_layers == 1:
            x = nn.Dense(
                self.num_classes, kernel_init=fc_init(0.01), dtype=self.dtype,
                name="projection",
            )(x)
        else:
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.mlp_dim,
                num_layers=self.num_mlp_layers,
                bn_on=self.bn_mlp,
                sync_axes=self.bn_sync_axes,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        outputs = [x]
        for i, depth in enumerate(self.predictor_depths):
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.predictor_mlp_dim,
                num_layers=depth,
                bn_on=self.predictor_bn,
                sync_axes=self.bn_sync_axes,
                dtype=self.dtype,
                name=f"predictor{i}",
            )(x, train)
            outputs.append(x)
        if len(outputs) > 1:
            return outputs
        x = outputs[0]
        if not train and self.act_func == "softmax":
            x = nn.softmax(x, axis=-1)
        return x


class TransformerBasicHead(nn.Module):
    """Linear (or contrastive-MLP) classification head for ViTs
    (reference head_helper.py:380-470)."""

    num_classes: int
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    detach_final_fc: bool = False
    num_mlp_layers: int = 1
    mlp_dim: int = 2048
    bn_mlp: bool = False
    bn_sync_axes: Tuple[str, ...] = ()
    # MVIT.HEAD_INIT_SCALE: the reference multiplies the projection's
    # initialized weight AND bias by this after init
    # (video_model_builder.py:1078-1079) — folded into the initializers
    head_init_scale: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if self.detach_final_fc:
            x = jax.lax.stop_gradient(x)
        if self.num_mlp_layers == 1:
            base_init = fc_init(0.01)
            scale = self.head_init_scale

            def scaled_init(key, shape, dtype=jnp.float32):
                return base_init(key, shape, dtype) * scale

            x = nn.Dense(
                self.num_classes,
                kernel_init=scaled_init if scale != 1.0 else base_init,
                dtype=self.dtype,
                name="projection",
            )(x)
        else:
            x = MLPHead(
                dim_out=self.num_classes,
                mlp_dim=self.mlp_dim,
                num_layers=self.num_mlp_layers,
                bn_on=self.bn_mlp,
                sync_axes=self.bn_sync_axes,
                dtype=self.dtype,
                name="projection",
            )(x, train)
        if not train and self.act_func == "softmax":
            x = nn.softmax(x, axis=-1)
        return x

