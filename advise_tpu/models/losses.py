"""Loss functions (reference ``models/losses.py:15-152``).

All losses are pure jnp functions of (logits, targets) — the margin-ranking
loss, an O(B*C*T) python loop in the reference, is fully vectorized here.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE with integer labels."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy(logits.astype(jnp.float32), targets).mean()


def bce_logit(
    logits: jnp.ndarray, targets_onehot: jnp.ndarray, smoothing: float = 0.0
) -> jnp.ndarray:
    """BCEWithLogits over one-hot targets; optional label smoothing
    (reference LabelSmoothingBCEWithLogitsLoss :66-83:
    ``target*conf + 0.5*smoothing``)."""
    t = targets_onehot * (1.0 - smoothing) + 0.5 * smoothing
    x = logits.astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()


def contrastive_loss(logits: jnp.ndarray, _labels=None) -> jnp.ndarray:
    """CE against index-0 positives (reference ContrastiveLoss :15-28)."""
    labels = jnp.zeros((logits.shape[0],), jnp.int32)
    return cross_entropy(logits, labels)


def mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32)))


def multi_mse(
    xs: Sequence[jnp.ndarray], ys: Sequence
) -> Tuple[jnp.ndarray, list]:
    """Weighted sum of per-target MSEs (reference MultipleMSELoss :29-63)."""
    loss_sum = 0.0
    each = []
    for xt, yt in zip(xs, ys):
        wt = 1.0
        if isinstance(yt, (tuple, list)):
            yt, wt = yt[0], yt[1]
        l = mse(xt, yt)
        loss_sum = loss_sum + l * wt
        each.append(l)
    return loss_sum, each


def margin_ranking_inter(x: jnp.ndarray, target: jnp.ndarray, margin: float):
    """TransRank inter-mode (reference MarginRankingLoss.cal_inter :100-113),
    vectorized: for each (video, transform t), hinge between every other
    class score and the true class score at that transform.

    x: [B, C, T] scores; target: [B, T] true class per transform.
    """
    b, c, t = x.shape
    true_scores = jnp.take_along_axis(x, target[:, None, :], axis=1)  # [B,1,T]
    hinge = jnp.maximum(0.0, x - true_scores + margin)  # [B,C,T]
    mask = jax.nn.one_hot(target, c, axis=1) == 0  # exclude the true class
    return (hinge * mask).sum() / mask.sum()


def margin_ranking_intra(x: jnp.ndarray, target: jnp.ndarray, margin: float):
    """Intra mode (reference :115-127): x [B, C, T], target [B, C] true
    transform per class."""
    b, c, t = x.shape
    true_scores = jnp.take_along_axis(x, target[:, :, None], axis=2)  # [B,C,1]
    hinge = jnp.maximum(0.0, x - true_scores + margin)
    mask = jax.nn.one_hot(target, t, axis=2) == 0
    return (hinge * mask).sum() / mask.sum()


_LOSSES: Dict[str, Callable] = {
    "cross_entropy": cross_entropy,
    "ce": cross_entropy,
    "soft_cross_entropy": soft_cross_entropy,
    "bce_logit": bce_logit,
    "smoothing_bce_logit": bce_logit,
    "contrastive_loss": contrastive_loss,
    "mse": mse,
    "multi_mse": multi_mse,
    "margin": margin_ranking_inter,
}


def get_loss_func(name: str) -> Callable:
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} is not supported")
    return _LOSSES[name]


def top_k_accuracy(logits: jnp.ndarray, labels: jnp.ndarray, k: int = 1):
    """(reference utils/misc.py:51-59 TopKAccuracyCalculator)."""
    topk = jnp.argsort(-logits, axis=-1)[..., :k]
    return jnp.any(topk == labels[..., None], axis=-1).mean()
