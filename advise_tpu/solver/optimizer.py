"""Optimizer factory on optax.

Covers the reference's solver surface (reference ``utils/solver.py:19-54``,
``models/optimizer.py:14-397``): SGD(+Nesterov momentum), Adam/AdamW, LARS,
per-group weight-decay overrides (BN.WEIGHT_DECAY, ZERO_WD_1D_PARAM,
no-decay sets for pos-embeds/cls tokens), and ViT layer-decay LR scaling.

Design: the transformation chain produces an lr-free *direction* (momentum
/ Adam moments / trust-ratio / coupled weight decay applied inside); the
train step then applies ``params -= lr * lr_scale * direction`` with the
scalar lr computed on host per iteration (reference ``update_lr``) and
``lr_scale`` a per-parameter layer-decay tree. This reproduces torch
semantics exactly (momentum buffers accumulate unscaled directions, so lr
changes act instantly) while keeping the jitted step free of recompiles.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

logger = logging.getLogger(__name__)

# parameter-path fragments that never receive weight decay in the reference
# (models/optimizer.py no_weight_decay sets)
_NO_DECAY_PATTERNS = ("pos_embed", "cls_token", "rel_pos", "mask_token")


def adjust_base_lr(cfg) -> None:
    """Linear LR scaling by global batch / 64 (reference utils/solver.py:7-16)."""
    scale = cfg.DATA.BATCHSIZE_PER_GPU * cfg.NUM_WORLDS / 64.0
    old = (cfg.SOLVER.BASE_LR, cfg.SOLVER.COSINE_END_LR, cfg.SOLVER.WARMUP_START_LR)
    cfg.SOLVER.BASE_LR *= scale
    cfg.SOLVER.COSINE_END_LR *= scale
    cfg.SOLVER.WARMUP_START_LR *= scale
    logger.info(
        "Adjusting (BASE_LR, COSINE_END_LR, WARMUP_START_LR) from %s to %s "
        "(scale %.3f)",
        old,
        (cfg.SOLVER.BASE_LR, cfg.SOLVER.COSINE_END_LR, cfg.SOLVER.WARMUP_START_LR),
        scale,
    )


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def classify_params(cfg, params) -> Any:
    """Label tree: 'frozen' | 'bn' | 'no_decay' | 'one_d' | 'default'
    (reference models/optimizer.py:30-120 param grouping). Frozen covers:
    the CLIP spatial encoder unless TM.FROM_SCRATCH (reference
    temporal_modeling.py:155-158), and everything but the head under
    LINEAR_PROBING (reference tools/train.py:305-312)."""

    def label(path, p):
        s = _path_str(path).lower()
        if "spatial_encoder" in s and not cfg.TM.FROM_SCRATCH:
            return "frozen"
        if cfg.LINEAR_PROBING and "head" not in s:
            return "frozen"
        if "/bn" in s or s.endswith("bn/scale") or s.endswith("bn/bias") or "_bn/" in s:
            return "bn"
        # the reference's no_weight_decay() name set is entirely gated on
        # MVIT.ZERO_DECAY_POS_CLS (video_model_builder.py:1093-1117,
        # masked.py:135-160): with the flag off, pos embeds / cls tokens /
        # rel-pos tables decay like any other param
        if cfg.MVIT.ZERO_DECAY_POS_CLS and any(
            pat in s for pat in _NO_DECAY_PATTERNS
        ):
            return "no_decay"
        if p.ndim <= 1 and cfg.SOLVER.ZERO_WD_1D_PARAM:
            return "one_d"
        return "default"

    return jax.tree_util.tree_map_with_path(label, params)


def wd_tree(cfg, params) -> Any:
    """Per-parameter weight-decay coefficients."""
    labels = classify_params(cfg, params)
    wd_map = {
        "default": cfg.SOLVER.WEIGHT_DECAY,
        "bn": cfg.BN.WEIGHT_DECAY,
        "no_decay": 0.0,
        "one_d": 0.0,
        "frozen": 0.0,
    }
    return jax.tree_util.tree_map(lambda l: wd_map[l], labels)


def layer_decay_scales(cfg, params) -> Any:
    """Per-parameter LR multipliers for SOLVER.LAYER_DECAY < 1 (reference
    models/optimizer.py get_param_groups): scale = decay^(num_layers - i)
    by transformer block index parsed from the path; non-block params get
    the strongest decay (embedding side) or 1.0 (head)."""
    decay = cfg.SOLVER.LAYER_DECAY
    labels = classify_params(cfg, params)
    depth = cfg.MVIT.DEPTH

    def scale(path, p):
        s = _path_str(path)
        m = re.search(r"blocks?_?(\d+)", s)
        if m:
            i = int(m.group(1)) + 1
        elif "head" in s or "projection" in s:
            i = depth + 1
        else:
            i = 0  # patch embed / pos embed
        return decay ** (depth + 1 - i) if decay != 1.0 else 1.0

    scales = jax.tree_util.tree_map_with_path(scale, params)
    # frozen params receive zero updates (lr scale 0)
    return jax.tree_util.tree_map(
        lambda sc, lb: 0.0 if lb == "frozen" else sc, scales, labels
    )


class OptimizerBundle(NamedTuple):
    tx: optax.GradientTransformation  # grads -> lr-free direction
    lr_scales: Any  # per-param lr multipliers (layer decay)


def _coupled_weight_decay(wds) -> optax.GradientTransformation:
    """grad += wd * param with a per-param wd tree (torch-coupled style)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        assert params is not None
        new = jax.tree_util.tree_map(
            lambda g, p, w: g + w * p, updates, params, wds
        )
        return new, state

    return optax.GradientTransformation(init, update)


def build_tx(cfg, params) -> OptimizerBundle:
    method = cfg.SOLVER.OPTIMIZING_METHOD
    wds = wd_tree(cfg, params)
    scales = layer_decay_scales(cfg, params)

    if method in ("sgd", "simple_sgd"):
        assert cfg.SOLVER.DAMPENING == 0.0, "dampening unsupported"
        chain = [
            _coupled_weight_decay(wds),
            optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=cfg.SOLVER.NESTEROV),
        ]
    elif method in ("adamw", "simple_adamw", "mt_adamw"):
        chain = [
            optax.scale_by_adam(
                b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
            ),
            # decoupled decay: direction += wd * param, both get lr later
            _coupled_weight_decay(wds),
        ]
    elif method == "adam":
        chain = [
            _coupled_weight_decay(wds),
            optax.scale_by_adam(
                b1=cfg.SOLVER.BETAS[0], b2=cfg.SOLVER.BETAS[1], eps=1e-8
            ),
        ]
    else:
        raise NotImplementedError(f"SOLVER.OPTIMIZING_METHOD={method}")

    if cfg.SOLVER.LARS_ON:
        # trust-ratio scaling before momentum, skipping 1-D params
        # (reference models/optimizer.py LARS wrapper)
        chain.insert(
            -1,
            optax.masked(
                optax.scale_by_trust_ratio(),
                jax.tree_util.tree_map(lambda p: p.ndim > 1, params),
            ),
        )

    if cfg.SOLVER.CLIP_GRAD_NORM > 0:
        chain.insert(0, optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_NORM))

    return OptimizerBundle(tx=optax.chain(*chain), lr_scales=scales)


def apply_direction(params, direction, lr, lr_scales):
    """params - lr * scale * direction (torch step with lr applied last)."""
    return jax.tree_util.tree_map(
        lambda p, d, s: (p - lr * s * d).astype(p.dtype),
        params,
        direction,
        lr_scales,
    )


def global_grad_norm(grads) -> jnp.ndarray:
    """Global 2-norm (reference models/optimizer.py:375-397)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
