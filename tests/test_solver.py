"""Solver tests: LR schedule parity with the reference formulas, and
optimizer-step golden parity against torch.optim (the reference's actual
optimizers)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from advise_tpu.config import get_cfg
from advise_tpu.solver import (
    adjust_base_lr,
    apply_direction,
    build_tx,
    classify_params,
    get_lr_at_epoch,
    global_grad_norm,
    layer_decay_scales,
    wd_tree,
)


def _ref_cosine(cfg, cur_epoch):
    """Reference lr_func_cosine (utils/lr_policy.py:30-55), restated."""
    offset = cfg.SOLVER.WARMUP_EPOCHS if cfg.SOLVER.COSINE_AFTER_WARMUP else 0.0
    return (
        cfg.SOLVER.COSINE_END_LR
        + (cfg.SOLVER.BASE_LR - cfg.SOLVER.COSINE_END_LR)
        * (math.cos(math.pi * (cur_epoch - offset) / (cfg.SOLVER.MAX_EPOCH - offset)) + 1.0)
        * 0.5
    )


def test_cosine_schedule_matches_reference():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.04
    cfg.SOLVER.MAX_EPOCH = 200
    cfg.SOLVER.WARMUP_EPOCHS = 10.0
    cfg.SOLVER.WARMUP_START_LR = 0.001
    cfg.SOLVER.COSINE_AFTER_WARMUP = True
    for ep in [0.0, 0.005, 5.0, 9.99, 10.0, 50.0, 100.0, 199.99]:
        got = get_lr_at_epoch(cfg, ep)
        if ep < 10.0:
            lr_end = _ref_cosine(cfg, 10.0)
            expect = ep * (lr_end - 0.001) / 10.0 + 0.001
        else:
            expect = _ref_cosine(cfg, ep)
        assert abs(got - expect) < 1e-9, (ep, got, expect)


def test_warmup_is_linear_and_continuous():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.COSINE_AFTER_WARMUP = False
    a = get_lr_at_epoch(cfg, cfg.SOLVER.WARMUP_EPOCHS - 1e-6)
    b = get_lr_at_epoch(cfg, cfg.SOLVER.WARMUP_EPOCHS)
    assert abs(a - b) < 1e-4


def test_adjust_base_lr_scaling():
    cfg = get_cfg()
    cfg.DATA.BATCHSIZE_PER_GPU = 8
    cfg.NUM_WORLDS = 32
    cfg.SOLVER.BASE_LR = 0.04
    adjust_base_lr(cfg)
    assert abs(cfg.SOLVER.BASE_LR - 0.04 * 256 / 64) < 1e-9


def test_param_classification():
    cfg = get_cfg()
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    params = {
        "s1": {"conv": {"kernel": jnp.ones((3, 3, 3, 4, 8))},
               "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
        "pos_embed": jnp.zeros((1, 10, 8)),
        "head": {"projection": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros(4)}},
    }
    labels = classify_params(cfg, params)
    assert labels["s1"]["bn"]["scale"] == "bn"
    assert labels["pos_embed"] == "no_decay"
    assert labels["head"]["projection"]["bias"] == "one_d"
    assert labels["s1"]["conv"]["kernel"] == "default"
    wds = wd_tree(cfg, params)
    assert wds["s1"]["bn"]["scale"] == cfg.BN.WEIGHT_DECAY
    assert wds["s1"]["conv"]["kernel"] == cfg.SOLVER.WEIGHT_DECAY


def _run_ours(cfg, p0, grads_seq, lr):
    params = {"w": jnp.asarray(p0)}
    bundle = build_tx(cfg, params)
    opt = bundle.tx.init(params)
    for g in grads_seq:
        direction, opt = bundle.tx.update({"w": jnp.asarray(g)}, opt, params)
        params = apply_direction(params, direction, lr, bundle.lr_scales)
    return np.asarray(params["w"])


def test_sgd_matches_torch():
    """Our sgd chain must match torch.optim.SGD(momentum, nesterov, wd)
    step-for-step (the reference 'simple_sgd' path, utils/solver.py:30-39)."""
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "simple_sgd"
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = 5e-4
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr = 0.04

    ours = _run_ours(cfg, p0, grads, lr)

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.SGD([tp], lr=lr, momentum=0.9, nesterov=True, weight_decay=5e-4)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(ours, tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adamw_matches_torch():
    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "simple_adamw"
    cfg.SOLVER.BETAS = (0.9, 0.999)
    cfg.SOLVER.WEIGHT_DECAY = 0.05
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(6,)).astype(np.float32)
    grads = [rng.normal(size=(6,)).astype(np.float32) for _ in range(4)]
    lr = 1e-3

    ours = _run_ours(cfg, p0, grads, lr)

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.AdamW([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(ours, tp.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_layer_decay_scales():
    cfg = get_cfg()
    cfg.SOLVER.LAYER_DECAY = 0.5
    cfg.MVIT.DEPTH = 4
    params = {
        "patch_embed": {"kernel": jnp.ones((2, 2))},
        "blocks_0": {"w": jnp.ones(2)},
        "blocks_3": {"w": jnp.ones(2)},
        "head": {"projection": {"kernel": jnp.ones((2, 2))}},
    }
    s = layer_decay_scales(cfg, params)
    assert s["head"]["projection"]["kernel"] == 1.0
    assert s["patch_embed"]["kernel"] == 0.5**5
    assert s["blocks_0"]["w"] == 0.5**4
    assert s["blocks_3"]["w"] == 0.5**1


def test_grad_norm():
    g = {"a": jnp.ones((2, 2)), "b": jnp.full((3,), 2.0)}
    expect = math.sqrt(4 * 1 + 3 * 4)
    assert abs(float(global_grad_norm(g)) - expect) < 1e-6
