"""Loss golden tests against torch (the reference's loss backend)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from advise_tpu.models import losses as L


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=8)
    ours = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(tnn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - ref) < 1e-5


def test_bce_logit_smoothing_matches_reference_formula():
    """Reference LabelSmoothingBCEWithLogitsLoss (losses.py:66-83)."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(6, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=6)
    onehot = np.eye(4, dtype=np.float32)[labels]
    smoothing = 0.05
    ours = float(L.bce_logit(jnp.asarray(logits), jnp.asarray(onehot), smoothing))
    smooth_target = onehot * (1 - smoothing) + 0.5 * smoothing
    ref = float(
        tnn.BCEWithLogitsLoss(reduction="mean")(
            torch.tensor(logits), torch.tensor(smooth_target)
        )
    )
    assert abs(ours - ref) < 1e-5


def test_contrastive_loss_index0():
    logits = jnp.asarray([[5.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    assert float(L.contrastive_loss(logits)) < 0.02
    logits_bad = jnp.asarray([[0.0, 5.0, 0.0]])
    assert float(L.contrastive_loss(logits_bad)) > 4.0


def test_margin_inter_vectorized_semantics():
    """Vectorized margin loss: hinge of every wrong class against the true
    class score, per (video, transform)."""
    x = jnp.asarray(
        [[[1.0, 0.0], [0.5, 2.0], [0.2, 0.1]]]
    )  # [1, C=3, T=2]
    target = jnp.asarray([[0, 1]])  # true class per transform
    margin = 0.5
    # t=0: true class 0 score 1.0; wrong: 0.5, 0.2 -> hinges 0.0, 0.0 (0.5-1+0.5=0, 0.2-1+0.5=0)
    # t=1: true class 1 score 2.0; wrong: 0.0, 0.1 -> hinges max(0,-1.5)=0, max(0,-1.4)=0
    assert float(L.margin_ranking_inter(x, target, margin)) == 0.0
    x2 = x.at[0, 2, 0].set(1.4)  # wrong class above margin: 1.4-1.0+0.5=0.9
    got = float(L.margin_ranking_inter(x2, target, margin))
    assert abs(got - 0.9 / 4) < 1e-6  # 4 wrong-class slots


def test_margin_intra():
    x = jnp.asarray([[[2.0, 0.0, 0.0]]])  # [1, C=1, T=3]
    target = jnp.asarray([[0]])  # true transform 0 for class 0
    # wrong transforms: 0-2+0.5, 0-2+0.5 -> both 0
    assert float(L.margin_ranking_intra(x, target, 0.5)) == 0.0
    x2 = jnp.asarray([[[0.0, 1.0, 0.0]]])
    got = float(L.margin_ranking_intra(x2, target, 0.5))
    # t=1: 1-0+0.5=1.5, t=2: 0-0+0.5=0.5 -> mean over 2
    assert abs(got - 1.0) < 1e-6


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    assert float(L.top_k_accuracy(logits, labels, 1)) == 0.5
    assert float(L.top_k_accuracy(logits, labels, 3)) == 1.0


def test_multi_mse():
    xs = [jnp.ones((2, 2)), jnp.zeros((2, 2))]
    ys = [(jnp.zeros((2, 2)), 2.0), jnp.zeros((2, 2))]
    total, each = L.multi_mse(xs, ys)
    assert abs(float(total) - 2.0) < 1e-6
    assert abs(float(each[0]) - 1.0) < 1e-6
