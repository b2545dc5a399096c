"""TPU.STEM_S2D: the space-to-depth stem conv must be the SAME linear
map as the plain (t,7,7)/s(1,2,2) conv — identical params, matching
forward outputs and gradients (float-assoc tolerance only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advise_tpu.models.layers.stem import ResNetBasicStem, SpaceToDepthStemConv


class _Identity:
    """norm stub: BN off so the conv output is compared directly."""

    def __init__(self, name=None, dtype=None):
        pass

    def __call__(self, x, train):
        return x


def _norm_stub(name=None, dtype=None):
    class _M:
        def __call__(self, x, train):
            return x
    return _M()


@pytest.mark.parametrize("c_in,c_out,temp_k", [(3, 8, 5), (3, 64, 1)])
def test_s2d_conv_matches_plain(c_in, c_out, temp_k):
    from flax import linen as nn

    from advise_tpu.models.layers.common import msra_init

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(2, 4, 32, 32, c_in)).astype(np.float32)
    )
    plain = nn.Conv(
        c_out,
        kernel_size=(temp_k, 7, 7),
        strides=(1, 2, 2),
        padding=((temp_k // 2,) * 2, (3, 3), (3, 3)),
        use_bias=False,
        kernel_init=msra_init,
    )
    s2d = SpaceToDepthStemConv(features=c_out, temp_kernel=temp_k)
    v = plain.init(jax.random.PRNGKey(0), x)
    # the s2d module uses the SAME param name/shape
    v2 = s2d.init(jax.random.PRNGKey(1), x)
    assert (
        v2["params"]["kernel"].shape == v["params"]["kernel"].shape
    )
    ref = plain.apply(v, x)
    got = s2d.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    # gradient parity w.r.t. the shared kernel
    def loss_plain(k):
        return jnp.sum(plain.apply({"params": {"kernel": k}}, x) ** 2)

    def loss_s2d(k):
        return jnp.sum(s2d.apply({"params": {"kernel": k}}, x) ** 2)

    k0 = v["params"]["kernel"]
    g1 = jax.grad(loss_plain)(k0)
    g2 = jax.grad(loss_s2d)(k0)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), rtol=5e-3, atol=5e-3
    )


def test_stem_s2d_in_module_same_param_path():
    """ResNetBasicStem with s2d=True creates the identical 'conv/kernel'
    param and reproduces the plain stem's output."""
    def norm_factory(name=None, dtype=None):
        return lambda x, train: x

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32))
    stem_a = ResNetBasicStem(
        dim_out=8, temp_kernel=5, norm=norm_factory, s2d=False
    )
    stem_b = ResNetBasicStem(
        dim_out=8, temp_kernel=5, norm=norm_factory, s2d=True
    )
    va = stem_a.init(jax.random.PRNGKey(0), x, False)
    vb = stem_b.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    out_a = stem_a.apply(va, x, False)
    out_b = stem_b.apply(va, x, False)  # SAME params through the s2d path
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_a), rtol=2e-4, atol=2e-4
    )

    # odd input sizes fall back to the plain conv (no crash, same result)
    x_odd = jnp.asarray(
        rng.normal(size=(1, 4, 30, 30, 3)).astype(np.float32)
    )
    out_odd = stem_b.apply(va, x_odd, False)
    ref_odd = stem_a.apply(va, x_odd, False)
    np.testing.assert_allclose(
        np.asarray(out_odd), np.asarray(ref_odd), rtol=2e-4, atol=2e-4
    )


def test_stem_pad_out_bit_exact():
    """TPU.STEM_PAD_OUT routes the WEIGHT GRADIENT through a lane-aligned
    padded conv (custom_vjp; the forward stays at the real width) —
    forward and unbatched weight-grad are bit-equal to pad_out=0; under
    vmap (the VMAP_VIEWS context) the padded lowering accumulates in a
    different order, so parity is association-level (measured ~1e-4 abs
    on grads of O(10) magnitude)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advise_tpu.models.layers.stem import SpaceToDepthStemConv

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 4, 16, 16, 3)), jnp.float32
    )
    outs, grads = {}, {}
    for pad in (0, 32):
        m = SpaceToDepthStemConv(features=8, temp_kernel=5, pad_out=pad)
        v = m.init({"params": jax.random.PRNGKey(0)}, x)

        def loss(params):
            return jnp.sum(m.apply({"params": params}, x) ** 2)

        outs[pad] = np.asarray(m.apply(v, x))
        grads[pad] = np.asarray(jax.grad(loss)(v["params"])["kernel"])
    np.testing.assert_array_equal(outs[0], outs[32])
    np.testing.assert_array_equal(grads[0], grads[32])
    # vmapped (two views) gradient parity — the step's VMAP_VIEWS context
    xv = jnp.stack([x, x[::-1]])
    for pad in (0, 32):
        m = SpaceToDepthStemConv(features=8, temp_kernel=5, pad_out=pad)
        v = m.init({"params": jax.random.PRNGKey(0)}, x)

        def loss_v(params):
            y = jax.vmap(lambda xx: m.apply({"params": params}, xx))(xv)
            return jnp.sum(y ** 2)

        grads[f"v{pad}"] = np.asarray(jax.grad(loss_v)(v["params"])["kernel"])
    np.testing.assert_allclose(grads["v0"], grads["v32"], rtol=5e-2, atol=5e-4)


def test_stem_pad_out_under_shard_map_vmap():
    """The custom-vjp padded weight-grad must compose with the step's
    actual execution context: shard_map over the ('data','sync') mesh,
    vmapped views, value_and_grad, grad pmean."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "sync"))
    m = SpaceToDepthStemConv(features=8, temp_kernel=5, pad_out=32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 2, 2, 4, 16, 16, 3)),
        jnp.float32,
    )  # [global_B, views, T, H, W, C]
    v = m.init({"params": jax.random.PRNGKey(0)}, x[0, 0])

    def per_device(params, xb):
        def loss(p):
            y = jax.vmap(jax.vmap(lambda xx: m.apply({"params": p}, xx)))(xb)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(params)
        return jax.lax.pmean(l, ("data", "sync")), jax.tree_util.tree_map(
            lambda t: jax.lax.pmean(t, ("data", "sync")), g
        )

    f = jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(("data", "sync"))),
        out_specs=(P(), P()),
        check_vma=False,
    ))
    l, g = f(v["params"], x)
    assert np.isfinite(float(l))
    gk = np.asarray(g["kernel"])
    assert np.isfinite(gk).all() and np.abs(gk).max() > 0
