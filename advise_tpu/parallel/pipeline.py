"""Microbatch pipeline parallelism over a ``pipe`` mesh axis (GPipe-style).

A capability beyond the reference (which is data-parallel only — SURVEY
§2.2 "TP / PP / SP / CP / EP: none"): depth-wise pipelined execution of
the reversible MViT's uniform block segments. The reference's only
depth-memory levers are activation checkpointing and reversible backprop
(``models/reversible_mvit.py:183-277``); this adds the TPU-native scale-out
axis for them — stage ``s`` of ``P`` runs blocks ``[s·L/P, (s+1)·L/P)``
and microbatches stream through the stages over ICI via
``lax.ppermute``, so per-chip depth-compute drops ~P× (modulo the
(P−1)/(M+P−1) fill bubble).

Design (see the scaling-book pipelining recipe):

- Runs INSIDE the train step's ``shard_map`` — the mesh gains an inner
  ``pipe`` axis (``TPU.MESH_PIPE``); batch and parameters are replicated
  along it (weights-replicated GPipe: at video-model scales the weight
  memory is small next to activations, and replication keeps every other
  part of the step — optimizer, checkpointing, EMA/SSL state — oblivious
  to the pipeline).
- Each stage slices its OWN contiguous block-range from the stacked
  segment parameters (``lax.dynamic_slice`` by ``axis_index``) and runs
  them with the existing O(1)-memory reversible scan — pipelining and
  reversibility compose.
- The schedule is a ``lax.scan`` over ``M + P − 1`` ticks: stage 0
  injects microbatch ``t`` while ``t < M``; every stage applies its
  blocks to the microbatch it holds; ``ppermute`` hands the result to
  the next stage; the last stage collects finished microbatches, and a
  final masked ``psum`` broadcasts the segment output so the (replicated)
  downstream program continues identically on every stage.
- Gradients: autodiff through ``ppermute``/``psum`` produces the correct
  *total* cotangents but distributes them unevenly across stages (the
  input cotangent lands only on stage 0; each stage holds only its own
  layers' parameter grads). :func:`sync_cotangents` — an identity whose
  custom VJP ``psum``s the cotangent over ``pipe`` — is applied to every
  pipeline input so all gradients leave the segment REPLICATED across
  the pipe axis. Everything outside this module (grad pmean over the
  batch axes, the optimizer, ``out_specs=P()``) is then untouched.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Canonical mesh axis name (mesh.py re-exports it).
PIPE_AXIS = "pipe"


def sync_cotangents(tree: Any, axis: str = PIPE_AXIS) -> Any:
    """Identity on the forward pass; ``psum`` of the cotangent over
    ``axis`` on the backward pass.

    Wrap every value flowing INTO a pipelined region with this so the
    region's gradients come out replicated across the pipe stages:
    stage-local parameter-slice grads merge into the full stack (the
    slices are disjoint — psum is exact), and the stage-0-only input
    cotangent broadcasts to all stages.
    """
    return _sync_cotangents(axis)(tree)


def _sync_cotangents(axis):
    @jax.custom_vjp
    def ident(t):
        return t

    def fwd(t):
        return t, None

    def bwd(_, ct):
        def one(g):
            # float0 / symbolic-zero cotangents (int leaves) pass through
            if hasattr(g, "dtype") and g.dtype == jax.dtypes.float0:
                return g
            return lax.psum(g, axis)

        return (jax.tree_util.tree_map(one, ct),)

    ident.defvjp(fwd, bwd)
    return ident


def _scale_bwd(factor: float):
    """Identity forward; scales the cotangent by ``factor`` backward."""

    @jax.custom_vjp
    def ident(t):
        return t

    def fwd(t):
        return t, None

    def bwd(_, ct):
        def one(g):
            if hasattr(g, "dtype") and g.dtype == jax.dtypes.float0:
                return g
            return (g * jnp.asarray(factor, g.dtype)).astype(g.dtype)

        return (jax.tree_util.tree_map(one, ct),)

    ident.defvjp(fwd, bwd)
    return ident


def stage_slice(stack: Any, n_stage: int, axis: str = PIPE_AXIS) -> Any:
    """Slice this stage's contiguous block-range from a stacked pytree.

    Leaves are stacked on axis 0 with length ``L`` divisible by
    ``n_stage``; stage ``s`` gets ``[s·L/P, (s+1)·L/P)``. The slice index
    is the traced ``axis_index`` so one program serves every stage.
    """
    s = lax.axis_index(axis)
    leaves = jax.tree_util.tree_leaves(stack)
    total = leaves[0].shape[0]
    assert total % n_stage == 0, (
        f"stacked length {total} not divisible by pipe={n_stage}"
    )
    local = total // n_stage

    def one(a):
        assert a.shape[0] == total, (a.shape, total)
        return lax.dynamic_slice_in_dim(a, s * local, local, axis=0)

    return jax.tree_util.tree_map(one, stack)


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray], Any],
    x: Any,
    *,
    n_stage: int,
    n_micro: int,
    axis: str = PIPE_AXIS,
) -> Any:
    """Stream ``n_micro`` microbatches of ``x`` through ``n_stage``
    pipeline stages, each applying ``stage_fn(microbatch, m)`` (this
    stage's local blocks — shape-preserving). ``m`` is the traced
    microbatch index currently held by this stage — stochastic layers
    MUST fold it into their RNG so each microbatch draws independent
    masks (the stage function runs once per tick for every microbatch).

    ``x``: pytree of arrays sharing leading batch dim ``B`` (divisible by
    ``n_micro``); replicated across the ``axis`` members. Returns the
    full-batch output, replicated across ``axis`` (masked ``psum``
    broadcast from the last stage). Differentiable; pair with
    :func:`sync_cotangents` on the inputs (see module docstring).
    """
    assert n_stage > 1, "gpipe needs n_stage > 1 (use stage_fn directly)"
    s = lax.axis_index(axis)
    b = jax.tree_util.tree_leaves(x)[0].shape[0]
    assert b % n_micro == 0, (
        f"pipeline microbatching: batch {b} not divisible by "
        f"TPU.PIPE_MICROBATCH={n_micro}"
    )
    bm = b // n_micro
    xm = jax.tree_util.tree_map(
        lambda a: a.reshape((n_micro, bm) + a.shape[1:]), x
    )
    carry0 = jax.tree_util.tree_map(
        lambda a: jnp.zeros((bm,) + a.shape[2:], a.dtype), xm
    )
    acc0 = jax.tree_util.tree_map(jnp.zeros_like, xm)
    n_tick = n_micro + n_stage - 1
    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def tick(carry, t):
        cur, acc = carry
        # stage 0 injects microbatch t while any remain
        m_in = jnp.clip(t, 0, n_micro - 1)
        inject = (s == 0) & (t < n_micro)
        cur = jax.tree_util.tree_map(
            lambda a, full: jnp.where(
                inject, lax.dynamic_index_in_dim(full, m_in, 0, False), a
            ),
            cur,
            xm,
        )
        # the microbatch this stage holds at tick t is m = t - s
        m_cur = jnp.clip(t - s, 0, n_micro - 1)
        y = stage_fn(cur, m_cur)
        # last stage emits microbatch t-(P-1) once the pipe has filled
        m_out = jnp.clip(t - (n_stage - 1), 0, n_micro - 1)
        emit = (s == n_stage - 1) & (t >= n_stage - 1)
        acc = jax.tree_util.tree_map(
            lambda a, yy: jnp.where(
                emit, lax.dynamic_update_index_in_dim(a, yy, m_out, 0), a
            ),
            acc,
            y,
        )
        nxt = jax.tree_util.tree_map(
            lambda yy: lax.ppermute(yy, axis, perm), y
        )
        return (nxt, acc), None

    (_, acc), _ = lax.scan(tick, (carry0, acc0), jnp.arange(n_tick))
    last = s == n_stage - 1
    out = jax.tree_util.tree_map(
        lambda a: lax.psum(jnp.where(last, a, jnp.zeros_like(a)), axis), acc
    )
    # The broadcast psum transposes to ANOTHER psum: the (replicated,
    # identical) downstream cotangent re-sums to n_stage x the true
    # value. Pre-scale the cotangent so the pipeline's gradients come
    # out exact (forward is untouched — identity).
    out = _scale_bwd(1.0 / n_stage)(out)
    return jax.tree_util.tree_map(
        lambda a: a.reshape((b,) + a.shape[2:]), out
    )
