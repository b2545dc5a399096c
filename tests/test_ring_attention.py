"""Ring attention vs full attention: exactness + gradients over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from advise_tpu.parallel.ring_attention import (
    ring_attention,
    sequence_sharded_attention,
)


def _full_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _mesh8():
    return Mesh(np.asarray(jax.devices()).reshape(8), ("seq",))


def test_ring_matches_full_attention():
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 3, 32, 16)).astype(np.float32))
        for _ in range(3)
    )
    out_ring = sequence_sharded_attention(q, k, v, _mesh8(), "seq")
    out_full = _full_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_full), atol=2e-5
    )


def test_ring_attention_differentiable():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
    mesh = _mesh8()

    def loss_ring(q, k, v):
        return jnp.sum(sequence_sharded_attention(q, k, v, mesh, "seq") ** 2)

    def loss_full(q, k, v):
        return jnp.sum(_full_attention(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
