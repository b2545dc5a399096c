"""Ring attention: sequence-parallel exact attention over a mesh axis.

A NEW capability with no reference equivalent (SURVEY.md §5 long-context
notes): the reference scales memory via checkpointing/reversibility only
and cannot shard the token dimension. For the pod-scale stretch config
(MViT-L, 32x312 clips — BASELINE.json config #5) the [N, N] attention
matrix no longer fits one chip; ring attention shards tokens over a mesh
axis and rotates K/V blocks around the ring with ``lax.ppermute`` while
accumulating an online (flash-style) softmax, so each chip only ever holds
[N_local, N_local] score blocks. Communication rides the ICI ring and
overlaps with the per-block matmuls under XLA's scheduler.

Use inside shard_map with Q/K/V sharded on the sequence axis:
    out = ring_attention(q, k, v, axis_name='seq')
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _block_attn(q, k, v, scale):
    """Scores and (unnormalized) accumulation for one K/V block.

    q: [B, H, Nq, D], k/v: [B, H, Nk, D] ->
    (scores_max [B,H,Nq,1], exp_scores @ v [B,H,Nq,D], exp sums [B,H,Nq,1])
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    num = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    den = jnp.sum(p, axis=-1, keepdims=True)
    return m, num.astype(jnp.float32), den


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact softmax attention with K/V rotated around `axis_name`.

    q, k, v: [B, H, N_local, D] — the local sequence shard.
    Returns [B, H, N_local, D] matching full (global-N) attention.
    """
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # running online-softmax state
    m0, num0, den0 = _block_attn(q, k, v, scale)

    def body(i, carry):
        m_run, num_run, den_run, k_cur, v_cur = carry
        # rotate K/V to the next neighbor (ring over ICI)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        m_new, num_new, den_new = _block_attn(q, k_cur, v_cur, scale)
        m_tot = jnp.maximum(m_run, m_new)
        a = jnp.exp(m_run - m_tot)
        b = jnp.exp(m_new - m_tot)
        num_run = num_run * a + num_new * b
        den_run = den_run * a + den_new * b
        return m_tot, num_run, den_run, k_cur, v_cur

    m, num, den, _, _ = lax.fori_loop(
        0, n_dev - 1, body, (m0, num0, den0, k, v)
    )
    return (num / den).astype(q.dtype)


def sequence_sharded_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mesh, axis_name: str
) -> jnp.ndarray:
    """Convenience wrapper: full arrays in, shard_map'd ring attention over
    the sequence dim (dim 2 of [B, H, N, D])."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, None, axis_name, None)
    f = shard_map(
        partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)
