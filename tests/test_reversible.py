"""O(1)-memory reversible scan: value + gradient parity with plain autodiff
(the property the reference's RevBackProp provides via a hand-written
torch autograd Function, reversible_mvit.py:183-277)."""

import jax
import jax.numpy as jnp
import numpy as np

from advise_tpu.parallel.reversible import reversible_scan


def _f(p, x):
    # a nonlinear per-block function: Dense -> gelu -> Dense
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return h @ p["w2"]


def _naive(params_stack, x1, x2, depth):
    for i in range(depth):
        p = jax.tree_util.tree_map(lambda a: a[i], params_stack)
        x1, x2 = x2, x1 + _f(p, x2)
    return x1, x2


def _setup(depth=4, d=8, batch=3, seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.3, (depth, d, d)).astype(np.float32)),
        "b1": jnp.asarray(rng.normal(0, 0.1, (depth, d)).astype(np.float32)),
        "w2": jnp.asarray(rng.normal(0, 0.3, (depth, d, d)).astype(np.float32)),
    }
    x1 = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    return params, x1, x2


def test_forward_matches_naive():
    params, x1, x2 = _setup()
    y1, y2 = reversible_scan(_f, params, x1, x2)
    r1, r2 = _naive(params, x1, x2, 4)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), atol=1e-5)


def test_gradients_match_naive_autodiff():
    params, x1, x2 = _setup(depth=5)

    def loss_rev(params, x1, x2):
        y1, y2 = reversible_scan(_f, params, x1, x2)
        return jnp.sum(y1**2) + jnp.sum(jnp.sin(y2))

    def loss_naive(params, x1, x2):
        y1, y2 = _naive(params, x1, x2, 5)
        return jnp.sum(y1**2) + jnp.sum(jnp.sin(y2))

    g_rev = jax.grad(loss_rev, argnums=(0, 1, 2))(params, x1, x2)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(params, x1, x2)
    for a, b in zip(jax.tree_util.tree_leaves(g_rev),
                    jax.tree_util.tree_leaves(g_naive)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_reconstruction_exact_under_jit():
    """The backward's input reconstruction must be numerically stable over
    depth; grads of a deep (32-block) stack stay finite and match."""
    params, x1, x2 = _setup(depth=32, d=4, batch=2, seed=3)

    @jax.jit
    def g(params, x1, x2):
        def loss(p, a, b):
            y1, y2 = reversible_scan(_f, p, a, b)
            return jnp.mean(y1) + jnp.mean(y2)

        return jax.grad(loss, argnums=(0, 1, 2))(params, x1, x2)

    out = g(params, x1, x2)
    naive = jax.grad(
        lambda p, a, b: jnp.mean(_naive(p, a, b, 32)[0])
        + jnp.mean(_naive(p, a, b, 32)[1]),
        argnums=(0, 1, 2),
    )(params, x1, x2)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(naive)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )


# ---------------------------------------------------------------------------
# two-function (F/G) coupling — the ReversibleBlock form MViT uses
# ---------------------------------------------------------------------------

from advise_tpu.parallel.reversible import reversible_block_scan


def _fg(which):
    def fn(p, c, x):
        q = p[which]
        h = jnp.tanh(x @ q["w1"] + q["b1"])
        return h @ q["w2"] * (1.0 + 0.0 * c["idx"])  # consts ride along

    return fn


def _fg_setup(depth=6, d=8, batch=3, seed=1):
    rng = np.random.default_rng(seed)

    def mk():
        return {
            "w1": jnp.asarray(rng.normal(0, 0.3, (depth, d, d)).astype(np.float32)),
            "b1": jnp.asarray(rng.normal(0, 0.1, (depth, d)).astype(np.float32)),
            "w2": jnp.asarray(rng.normal(0, 0.3, (depth, d, d)).astype(np.float32)),
        }

    params = {"f": mk(), "g": mk()}
    x1 = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))
    return params, x1, x2


def _consts(depth):
    return {"idx": jnp.arange(depth, dtype=jnp.float32)}


def _fg_naive(params, x1, x2, depth):
    f, g = _fg("f"), _fg("g")
    consts = _consts(depth)
    for i in range(depth):
        p = jax.tree_util.tree_map(lambda a: a[i], params)
        c = jax.tree_util.tree_map(lambda a: a[i], consts)
        y1 = x1 + f(p, c, x2)
        y2 = x2 + g(p, c, y1)
        x1, x2 = y1, y2
    return x1, x2


def test_block_scan_forward_matches_naive():
    params, x1, x2 = _fg_setup()
    y1, y2 = reversible_block_scan(
        _fg("f"), _fg("g"), params, _consts(6), x1, x2
    )
    r1, r2 = _fg_naive(params, x1, x2, 6)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(r1), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(r2), rtol=2e-5, atol=2e-5)


def test_block_scan_gradients_match_naive_autodiff():
    params, x1, x2 = _fg_setup(depth=8)

    def loss_rev(p, a, b):
        y1, y2 = reversible_block_scan(
            _fg("f"), _fg("g"), p, _consts(8), a, b
        )
        return jnp.sum(jnp.sin(y1) * y2)

    def loss_naive(p, a, b):
        y1, y2 = _fg_naive(p, a, b, 8)
        return jnp.sum(jnp.sin(y1) * y2)

    g_rev = jax.grad(loss_rev, argnums=(0, 1, 2))(params, x1, x2)
    g_ref = jax.grad(loss_naive, argnums=(0, 1, 2))(params, x1, x2)
    for a, b in zip(jax.tree_util.tree_leaves(g_rev),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
