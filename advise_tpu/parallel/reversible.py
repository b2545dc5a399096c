"""O(1)-activation-memory reversible residual scan.

The custom-VJP equivalent of the reference's hand-rolled two-stream
reversible backprop (reference ``models/reversible_mvit.py:183-277``
RevBackProp): activations are NOT saved across blocks — the backward pass
reconstructs each block's input by inverting the coupling

    forward :  (x1, x2) -> (x2,  x1 + f(p_i, x2))
    inverse :  (y1, y2) -> (y2 - f(p_i, y1),  y1)

so residual memory is O(1) in depth (two streams + one block's
recomputation), vs O(depth) for remat-free and O(sqrt/depth-segment) for
remat. ``f`` is any pure function (e.g. a flax ``module.apply`` closure);
per-block parameters ride in a stacked pytree scanned over axis 0.

MViT's reversible mode currently uses remat over the same two-stream
structure (models/mvit.py); this primitive is the drop-in upgrade for the
uniform segments between stage transitions.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reversible_scan(
    f: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params_stack: Any,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the reversible coupling over all blocks in ``params_stack``
    (leaves stacked on axis 0). Differentiable with O(1) residuals."""
    return _rev_scan(f)(params_stack, x1, x2)


def reversible_block_scan(
    f: Callable[[Any, Any, jnp.ndarray], jnp.ndarray],
    g: Callable[[Any, Any, jnp.ndarray], jnp.ndarray],
    params_stack: Any,
    consts_stack: Any,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-function reversible coupling per block (the reference's
    ReversibleBlock form, reversible_mvit.py:279-382):

        forward :  y1 = x1 + f(p, c, x2) ;  y2 = x2 + g(p, c, y1)
        inverse :  x2 = y2 - g(p, c, y1) ;  x1 = y1 - f(p, c, x2)

    ``f`` is the attention sub-block, ``g`` the MLP sub-block; ``p``/``c``
    are one slice each of ``params_stack`` (differentiated) and
    ``consts_stack`` (NOT differentiated: rng keys, indices — put integer
    leaves here), both with leaves stacked on axis 0, one per block.
    Stochastic layers MUST derive their randomness from ``c`` so the
    backward reconstruction recomputes bit-identical values. Activation
    memory is O(1) in depth.
    """
    return _rev_block_scan(f, g)(params_stack, consts_stack, x1, x2)


def _rev_block_scan(f, g):
    @jax.custom_vjp
    def run(params_stack, consts_stack, x1, x2):
        def body(carry, pc):
            p, c = pc
            a, b = carry
            y1 = a + f(p, c, b)
            y2 = b + g(p, c, y1)
            return (y1, y2), None

        (y1, y2), _ = jax.lax.scan(
            body, (x1, x2), (params_stack, consts_stack)
        )
        return y1, y2

    def fwd(params_stack, consts_stack, x1, x2):
        out = run(params_stack, consts_stack, x1, x2)
        return out, (params_stack, consts_stack, out)

    def bwd(res, cotangents):
        params_stack, consts_stack, (y1, y2) = res
        gy1, gy2 = cotangents

        def body(carry, pc):
            p, c = pc
            (y1c, y2c), (g1, g2) = carry
            # invert: x2 = y2 - g(p, c, y1) ; x1 = y1 - f(p, c, x2)
            g_val, g_vjp = jax.vjp(lambda pp, yy: g(pp, c, yy), p, y1c)
            x2 = y2c - g_val
            f_val, f_vjp = jax.vjp(lambda pp, xx: f(pp, c, xx), p, x2)
            x1 = y1c - f_val
            # pullback through y2 = x2 + g(p, c, y1):
            gp_g, gy1_extra = g_vjp(g2)
            g1_total = g1 + gy1_extra
            # pullback through y1 = x1 + f(p, c, x2):
            gp_f, gx2_extra = f_vjp(g1_total)
            gx1 = g1_total
            gx2 = g2 + gx2_extra
            gp = jax.tree_util.tree_map(jnp.add, gp_g, gp_f)
            return ((x1, x2), (gx1, gx2)), gp

        rev = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.flip(x, axis=0), t
        )
        ((x1r, x2r), (g1r, g2r)), gps_rev = jax.lax.scan(
            body, ((y1, y2), (gy1, gy2)), (rev(params_stack), rev(consts_stack))
        )
        gparams = rev(gps_rev)
        # consts are non-differentiable by contract: symbolic-zero cotangent
        gconsts = jax.tree_util.tree_map(
            lambda x: np.zeros(x.shape, jax.dtypes.float0)
            if not jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.zeros_like(x),
            consts_stack,
        )
        return gparams, gconsts, g1r, g2r

    run.defvjp(fwd, bwd)
    return run


def _rev_scan(f):
    @jax.custom_vjp
    def run(params_stack, x1, x2):
        def body(carry, p):
            a, b = carry
            return (b, a + f(p, b)), None

        (y1, y2), _ = jax.lax.scan(body, (x1, x2), params_stack)
        return y1, y2

    def fwd(params_stack, x1, x2):
        out = run(params_stack, x1, x2)
        # residuals: only the FINAL streams + params (O(1) in depth)
        return out, (params_stack, out)

    def bwd(res, cotangents):
        params_stack, (y1, y2) = res
        g1, g2 = cotangents

        def body(carry, p):
            (b, y2c), (gb, gy2) = carry
            # reconstruct this block's input: forward was
            #   (a, b) -> (b, a + f(p, b))   i.e. y1 = b, y2 = a + f(p, b)
            delta, f_vjp = jax.vjp(lambda pp, bb: f(pp, bb), p, b)
            a = y2c - delta
            # cotangent pullback:
            #   dL/da = gy2
            #   dL/db = gb + (df/db)^T gy2
            #   dL/dp = (df/dp)^T gy2
            gp, gb_extra = f_vjp(gy2)
            ga = gy2
            gb_new = gb + gb_extra
            return ((a, b), (ga, gb_new)), gp

        # scan over blocks in reverse
        rev_params = jax.tree_util.tree_map(
            lambda x: jnp.flip(x, axis=0), params_stack
        )
        ((x1r, x2r), (g1r, g2r)), gps_rev = jax.lax.scan(
            body, ((y1, y2), (g1, g2)), rev_params
        )
        gparams = jax.tree_util.tree_map(lambda x: jnp.flip(x, axis=0), gps_rev)
        return gparams, g1r, g2r

    run.defvjp(fwd, bwd)
    return run
