"""TPU.PALLAS_STEM parity: the column-packed Toeplitz stem kernel
(ops/pallas/stem_conv.py) must reproduce `layers/stem.py s2d_conv` —
forward, weight grad, and input grad — in TPU interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from advise_tpu.models.layers.stem import s2d_conv
from advise_tpu.ops.pallas.stem_conv import eligible, pallas_s2d_stem


def _data(b=2, t=6, h=16, w=32, c=12, f=8, kt=5, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    x2 = jnp.asarray(rng.standard_normal((b, t, h, w, c)), dtype)
    w2 = jnp.asarray(
        rng.standard_normal((kt, 4, 4, c, f)) * 0.1, dtype
    )
    return x2, w2, kt


def test_eligibility():
    assert eligible((2, 6, 16, 32, 12), 8)
    assert not eligible((2, 6, 16, 32, 12), 64)   # slow stem: F*J != 128
    assert not eligible((2, 6, 16, 30, 12), 8)    # W % 16 != 0


@pytest.mark.parametrize("kt", [5, 1])
def test_pallas_stem_forward_matches_s2d_conv(kt):
    x2, w2, _ = _data(kt=kt)
    ref = s2d_conv(x2, w2, kt)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_s2d_stem(x2, w2, kt)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_pallas_stem_grads_match_autodiff():
    x2, w2, kt = _data()

    def loss_ref(x, w):
        y = s2d_conv(x, w, kt)
        return jnp.sum(y * jnp.cos(y))

    def loss_pallas(x, w):
        y = pallas_s2d_stem(x, w, kt)
        return jnp.sum(y * jnp.cos(y))

    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x2, w2)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_pallas, (0, 1))(x2, w2)
    np.testing.assert_allclose(
        np.asarray(gw_p), np.asarray(gw_r), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), atol=5e-3, rtol=1e-3
    )


def test_pallas_stem_bf16_smoke():
    x2, w2, kt = _data(dtype=jnp.bfloat16)
    ref = s2d_conv(x2, w2, kt).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_s2d_stem(x2, w2, kt).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_resnet_stem_module_routes_pallas():
    """Through the real ResNetBasicStem module (s2d + pallas): forward
    and param grads must match the XLA path, including BN."""
    import flax.linen as nn

    from advise_tpu.models.layers.norm import get_norm
    from advise_tpu.models.layers.stem import ResNetBasicStem

    class _Cfg:
        class BN:
            NORM_TYPE = "batchnorm"
            NUM_SYNC_DEVICES = 1
            GLOBAL_SYNC = False
            NUM_SPLITS = 1
            EPSILON = 1e-5
            MOMENTUM = 0.1

    norm = get_norm(_Cfg, sync_axes=())
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 6, 32, 32, 3)),
        jnp.float32,
    )

    def run(pallas):
        m = ResNetBasicStem(
            dim_out=8, temp_kernel=5, norm=norm, s2d=True, pallas=pallas
        )
        variables = m.init(jax.random.PRNGKey(0), x, False)

        def loss(params):
            y, _ = m.apply(
                {**variables, "params": params}, x, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(y * jnp.sin(y))

        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    v0, g0 = run(False)
    with pltpu.force_tpu_interpret_mode():
        v1, g1 = run(True)
    assert abs(float(v0) - float(v1)) < 1e-3 * max(1.0, abs(float(v0)))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2
        )


def test_pallas_stem_wgrad_only_matches_autodiff():
    """TPU.PALLAS_STEM_WGRAD_ONLY: the forward IS the XLA s2d conv
    (bit-identical primal) while the weight grad comes from the Pallas
    transposed-GEMM kernel."""
    from advise_tpu.ops.pallas.stem_conv import pallas_s2d_stem_wgrad_only

    x2, w2, kt = _data()
    ref = s2d_conv(x2, w2, kt)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_s2d_stem_wgrad_only(x2, w2, kt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def loss_ref(x, w):
        y = s2d_conv(x, w, kt)
        return jnp.sum(y * jnp.cos(y))

    def loss_wo(x, w):
        y = pallas_s2d_stem_wgrad_only(x, w, kt)
        return jnp.sum(y * jnp.cos(y))

    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x2, w2)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_wo, (0, 1))(x2, w2)
    np.testing.assert_allclose(
        np.asarray(gw_p), np.asarray(gw_r), atol=5e-3, rtol=1e-3
    )
    # the input grad path is the same XLA transposed conv: exact
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("chunk", [2, 4])
def test_pallas_stem_chunked_matches_autodiff(chunk):
    """TPU.PALLAS_STEM_CHUNK: the batch-chunked full-Pallas path (scan'd
    pack in both directions) matches s2d_conv autodiff. chunk=2 divides
    b=6 exactly; chunk=4 exercises the largest-divisor fallback (->3)."""
    from advise_tpu.ops.pallas.stem_conv import pallas_s2d_stem_chunked

    x2, w2, kt = _data(b=6)
    ref = s2d_conv(x2, w2, kt)
    with pltpu.force_tpu_interpret_mode():
        out = pallas_s2d_stem_chunked(x2, w2, kt, chunk)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
    )

    def loss_ref(x, w):
        y = s2d_conv(x, w, kt)
        return jnp.sum(y * jnp.cos(y))

    def loss_chunked(x, w):
        y = pallas_s2d_stem_chunked(x, w, kt, chunk)
        return jnp.sum(y * jnp.cos(y))

    gx_r, gw_r = jax.grad(loss_ref, (0, 1))(x2, w2)
    with pltpu.force_tpu_interpret_mode():
        gx_p, gw_p = jax.grad(loss_chunked, (0, 1))(x2, w2)
    np.testing.assert_allclose(
        np.asarray(gw_p), np.asarray(gw_r), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), atol=5e-3, rtol=1e-3
    )


@pytest.mark.parametrize("chunk", [2, 4])
def test_wgrad_batch_chunking_matches_unchunked(chunk):
    """The wgrad-only backward scans WGRAD_CHUNK-sample chunks (the
    unchunked bs32 pack OOMed the chip, BASELINE.md r5). chunk=2 divides
    b=6 exactly; chunk=4 exercises the largest-divisor fallback (->3)."""
    from advise_tpu.ops.pallas.stem_conv import _wgrad

    x2, w2, kt = _data(b=6)
    g = jnp.asarray(
        np.random.default_rng(7).standard_normal(
            s2d_conv(x2, w2, kt).shape
        ),
        jnp.float32,
    )
    with pltpu.force_tpu_interpret_mode():
        dw_full = _wgrad(x2, g, kt, w2.shape[-1], w2.shape[-2])
        dw_chunk = _wgrad(x2, g, kt, w2.shape[-1], w2.shape[-2],
                          chunk=chunk)
    np.testing.assert_allclose(
        np.asarray(dw_chunk), np.asarray(dw_full), atol=1e-4, rtol=1e-5
    )
