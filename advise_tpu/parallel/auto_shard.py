"""GSPMD parameter partitioning for TPU.PARTITION_MODE='auto'.

The shard_map path (engine/steps.py) is explicit SPMD: hand-placed
collectives over ('data','sync'). This module is the other half of the
scaling story — *compiler-partitioned* SPMD for the transformer flagships
(Swin-B MoCo, MViT-L joint pretrain): the train step is written over
logically GLOBAL arrays, parameters carry ``NamedSharding``s, and XLA's
GSPMD partitioner propagates shardings through the whole program and
inserts the collectives (the "pick a mesh, annotate, let XLA do the
rest" recipe of the public scaling playbook).

Two parallelism forms compose here, both expressed purely as parameter
shardings — zero model-code changes:

- **Tensor parallelism** over the 'model' axis (Megatron-style): the
  attention qkv / q / k / v projections and the MLP fc1 are
  column-parallel (output features sharded -> heads split across
  devices), the attention out-proj and MLP fc2 are row-parallel (input
  features sharded -> XLA emits one all-reduce after each). The
  reference has no equivalent (single-GPU-memory models only).
- **FSDP** (ZeRO-3-style) over the 'data' axis: every remaining
  weight is sharded on its largest divisible dim; XLA all-gathers it
  just-in-time for each layer and reduce-scatters its gradient, so
  param + optimizer memory scales 1/N_data.

No reference counterpart (SURVEY.md §5 long-context/parallelism:
"Absent"); this is a new TPU-native capability.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from advise_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, which kernel dim is tensor-parallel). Matches MViT
# (models/layers/attention.py MultiScaleAttention: qkv|q|k|v -> proj) and
# Video Swin (models/swin3d.py WindowAttention3D: qkv -> proj) and every
# Mlp (models/layers/common.py: fc1 -> fc2).
_COLUMN_PARALLEL = re.compile(r"(^|/)(attn/(qkv|q|k|v)|mlp/fc1)/kernel$")
_COLUMN_BIAS = re.compile(r"(^|/)(attn/(qkv|q|k|v)|mlp/fc1)/bias$")
_ROW_PARALLEL = re.compile(r"(^|/)(attn/proj|mlp/fc2)/kernel$")

# Don't FSDP-shard tiny tensors: the all-gather latency outweighs the
# memory saved below ~16K elements (LN scales, biases, BN stats).
_FSDP_MIN_ELEMENTS = 16384


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _spec_for(path: str, shape: Tuple[int, ...], model: int, fsdp: int):
    """PartitionSpec for one param. Dims that don't divide evenly stay
    replicated (GSPMD would pad; we'd rather keep exact shapes)."""
    ndim = len(shape)
    spec: list = [None] * ndim
    if model > 1 and ndim >= 1:
        if _COLUMN_PARALLEL.search(path) and shape[-1] % model == 0:
            spec[-1] = MODEL_AXIS
        elif _COLUMN_BIAS.search(path) and shape[-1] % model == 0:
            spec[-1] = MODEL_AXIS
        elif _ROW_PARALLEL.search(path) and ndim >= 2 and shape[0] % model == 0:
            spec[0] = MODEL_AXIS
    if fsdp > 1 and int(np.prod(shape)) >= _FSDP_MIN_ELEMENTS:
        # shard the largest still-unsharded divisible dim over 'data'
        order = sorted(range(ndim), key=lambda d: -shape[d])
        for d in order:
            if spec[d] is None and shape[d] % fsdp == 0:
                spec[d] = DATA_AXIS
                break
    return P(*spec)


def param_specs(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """Pytree of PartitionSpec matching ``params`` (tensor-parallel over
    'model' where the path rules hit, FSDP over 'data' elsewhere)."""
    model = dict(mesh.shape).get(MODEL_AXIS, 1)
    data = dict(mesh.shape).get(DATA_AXIS, 1) if fsdp else 1
    return jax.tree_util.tree_map_with_path(
        lambda path, x: _spec_for(_path_str(path), x.shape, model, data),
        params,
    )


def shard_tree(tree: Any, mesh: Mesh, specs: Optional[Any] = None) -> Any:
    """device_put every leaf with its NamedSharding (replicated when
    ``specs`` is None or a leaf's spec is empty)."""
    if specs is None:
        specs = jax.tree_util.tree_map(lambda _: P(), tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def constrain_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """``with_sharding_constraint`` every param to its rule spec — used
    inside the jitted auto step so the TP/FSDP layout holds regardless of
    how the state arrived (fresh init, checkpoint restore)."""
    specs = param_specs(params, mesh, fsdp=fsdp)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.lax.with_sharding_constraint(params, shardings)


def shard_train_state(cfg, mesh: Mesh, state, bundle, reinit_opt: bool = True):
    """Lay the TrainState out for the auto mode: params (and EMA twin)
    device_put with their TP/FSDP NamedShardings, batch_stats and SSL
    buffers replicated, optimizer state re-initialized under jit from the
    sharded params so GSPMD propagates their shardings into the moments.
    ``reinit_opt=False`` (checkpoint-resumed run) keeps the restored
    optimizer moments; the step's ``constrain_params`` re-establishes the
    layout and GSPMD reshards the moments on the first step.

    Call at startup BEFORE the first step compile.
    """
    fsdp = bool(cfg.TPU.FSDP)
    specs = param_specs(state.params, mesh, fsdp=fsdp)
    params = shard_tree(state.params, mesh, specs)
    batch_stats = shard_tree(state.batch_stats, mesh)
    opt_state = (
        jax.jit(bundle.tx.init)(params) if reinit_opt else state.opt_state
    )
    ssl = dict(state.ssl) if state.ssl else {}
    if "ema_params" in ssl:
        ssl["ema_params"] = shard_tree(ssl["ema_params"], mesh, specs)
    for k, v in ssl.items():
        if k not in ("ema_params",):
            ssl[k] = shard_tree(v, mesh)
    return state.replace(
        params=params, batch_stats=batch_stats, opt_state=opt_state, ssl=ssl
    ), specs


def describe_sharding(params: Any, specs: Any, limit: int = 10) -> str:
    """Human-readable summary of which params got which axes (logged at
    startup, mirroring the reference's requires_grad table dump)."""
    lines = []
    counts = {"model": 0, "data": 0, "replicated": 0}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    spec_flat = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    for (path, x), s in zip(flat, spec_flat):
        axes = [a for a in s if a is not None]
        if MODEL_AXIS in axes:
            counts["model"] += 1
        elif DATA_AXIS in axes:
            counts["data"] += 1
        else:
            counts["replicated"] += 1
        if axes and len(lines) < limit:
            lines.append(f"  {_path_str(path)} {x.shape} -> {s}")
    head = (
        f"auto-shard: {counts['model']} tensor-parallel, "
        f"{counts['data']} fsdp, {counts['replicated']} replicated params"
    )
    return "\n".join([head] + lines)
