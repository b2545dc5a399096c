"""Collective primitives for use inside ``shard_map``-ped steps.

Covers the reference's complete collective census (SURVEY.md §5 table;
reference ``utils/distributed.py``, ``models/contrastive.py``):

| reference primitive                   | here                               |
|---------------------------------------|------------------------------------|
| DDP grad allreduce                    | ``pmean_tree(grads)``              |
| NaiveSyncBN stat allreduce (subgroup) | BN layers psum over the sync axis  |
| ``AllGatherWithGradient`` (SimCLR)    | ``all_gather_cat`` (differentiable)|
| ``cat_all_gather(local=True)``        | ``all_gather_cat(axis=SYNC_AXIS)`` |
| broadcast randperm (shuffle-BN)       | shared fold_in'd RNG key — no comm |
| memory-bank all_gather + scatter      | ``all_gather_cat`` + scatter       |
| distributed Sinkhorn all_reduce       | ``psum``                           |
| val/infer metric all_gather           | ``psum`` of count tensors          |
| barriers                              | unnecessary under SPMD             |
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from advise_tpu.parallel.mesh import BATCH_AXES, DATA_AXIS, SYNC_AXIS

AxisNames = Union[str, Tuple[str, ...]]


def pmean_tree(tree: Any, axis_names: AxisNames = BATCH_AXES) -> Any:
    """Average a pytree across replicas (DDP gradient allreduce analog).

    Empty ``axis_names`` is the no-comm identity: under the auto (GSPMD)
    partition mode arrays are logically global and jnp reductions already
    span the mesh, so every collective helper degenerates to a no-op.
    """
    if not axis_names:
        return tree
    return jax.tree_util.tree_map(lambda x: lax.pmean(x, axis_names), tree)


def psum_tree(tree: Any, axis_names: AxisNames = BATCH_AXES) -> Any:
    if not axis_names:
        return tree
    return jax.tree_util.tree_map(lambda x: lax.psum(x, axis_names), tree)


def all_gather_cat(
    x: jnp.ndarray, axis_names: AxisNames = BATCH_AXES, tiled: bool = True
) -> jnp.ndarray:
    """Gather shards from all replicas and concatenate on dim 0.

    Differentiable — the JAX-native replacement for the reference's custom
    autograd ``AllGatherWithGradient`` (``utils/distributed.py:131-155``):
    ``lax.all_gather``'s transpose is the gradient-reduce-then-slice the
    reference implements by hand.

    Empty ``axis_names`` -> identity (auto/GSPMD mode: dim 0 is already
    the global batch).
    """
    names = (axis_names,) if isinstance(axis_names, str) else tuple(axis_names)
    out = x
    # Gather over axes one at a time so dim-0 ordering is (outer..., inner...).
    for name in reversed(names):
        out = lax.all_gather(out, name, axis=0, tiled=tiled)
    return out


def replica_index(axis_names: AxisNames = BATCH_AXES) -> jnp.ndarray:
    """Linear index of this replica within the given axes (row-major).
    Empty ``axis_names`` -> 0 (auto/GSPMD mode: one logical program)."""
    names = (axis_names,) if isinstance(axis_names, str) else tuple(axis_names)
    idx = jnp.zeros((), jnp.int32)
    for name in names:
        idx = idx * lax.axis_size(name) + lax.axis_index(name)
    return idx


def world_size(axis_names: AxisNames = BATCH_AXES) -> int:
    names = (axis_names,) if isinstance(axis_names, str) else tuple(axis_names)
    n = 1
    for name in names:
        n *= lax.axis_size(name)
    return n


def batch_shuffle(
    x: jnp.ndarray, rng: jax.Array, axis_names: AxisNames = SYNC_AXIS
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoCo shuffle-BN (reference ``models/contrastive.py:174-214``).

    Gathers the batch across the (local) replica group, applies a permutation
    shared by construction (same rng on every replica — the SPMD analog of
    rank-0 broadcast), and returns this replica's shard of the shuffled batch
    plus the permutation needed to undo it.
    """
    n_local = x.shape[0]
    gathered = all_gather_cat(x, axis_names)  # [G*n_local, ...]
    total = gathered.shape[0]
    perm = jax.random.permutation(rng, total)
    my = replica_index(axis_names)
    idx = lax.dynamic_slice_in_dim(perm, my * n_local, n_local)
    return jnp.take(gathered, idx, axis=0), perm


def batch_unshuffle(
    x: jnp.ndarray, perm: jnp.ndarray, axis_names: AxisNames = SYNC_AXIS
) -> jnp.ndarray:
    """Undo ``batch_shuffle`` (reference ``models/contrastive.py:216-230``)."""
    n_local = x.shape[0]
    gathered = all_gather_cat(x, axis_names)
    restore = jnp.argsort(perm)
    my = replica_index(axis_names)
    idx = lax.dynamic_slice_in_dim(restore, my * n_local, n_local)
    return jnp.take(gathered, idx, axis=0)
