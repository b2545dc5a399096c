"""TPU.FLASH_ATTENTION parity: the Pallas flash kernel path of
MultiScaleAttention must reproduce the dense einsum->softmax->einsum
chain (fwd and grads) — run in TPU interpret mode on the CPU mesh.

The wrapper pads nq and nk to 128-multiples (MViT token counts are not
tile-aligned) and masks padded keys via SegmentIds; these tests cover
both the padded rectangular pooled-KV case and the full MViT model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from advise_tpu.ops.flash_attention import flash_mha


def _dense_ref(q, k, v, scale):
    a = jax.nn.softmax(
        jnp.einsum("bhqc,bhkc->bhqk", q * scale, k), axis=-1
    ).astype(v.dtype)
    return jnp.einsum("bhqk,bhkc->bhqc", a, v)


@pytest.mark.parametrize(
    "nq,nk,d", [(256, 384, 48), (392, 98, 48), (130, 130, 48),
                (256, 128, 192)],
    ids=["aligned_q_padded_kv", "mvit_tail_shapes", "both_padded",
         "head_dim_192_padded"],
)
def test_flash_mha_matches_dense(nq, nk, d):
    b, h = 2, 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, nk, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        o = flash_mha(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o)), o

    def loss_dense(q, k, v):
        o = _dense_ref(q, k, v, scale)
        return jnp.sum(o * jnp.cos(o)), o

    with pltpu.force_tpu_interpret_mode():
        (_, o1), g1 = jax.value_and_grad(loss_flash, (0, 1, 2),
                                         has_aux=True)(q, k, v)
    (_, o2), g2 = jax.value_and_grad(loss_dense, (0, 1, 2),
                                     has_aux=True)(q, k, v)
    assert float(jnp.abs(o1 - o2).max()) < 1e-5
    for a, bb, name in zip(g1, g2, "qkv"):
        assert float(jnp.abs(a - bb).max()) < 1e-5, f"d{name} diverges"


def test_mvit_model_flash_matches_dense():
    """Full tiny MViT (pooled KV, no rel-pos, no cls): the flag must not
    change the forward or the parameter gradients."""
    from tests.test_transformers import _mvit_cfg, _run

    from advise_tpu.config import assert_and_infer_cfg
    from advise_tpu.models import build_model

    def forward(cfg):
        cfg = assert_and_infer_cfg(cfg)
        m = build_model(cfg, sync_axes=())
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 4, 32, 32, 3)),
            jnp.float32,
        )
        rngs = {"params": jax.random.PRNGKey(0)}
        variables = m.init(rngs, x, train=False)

        def loss_fn(params):
            out = m.apply(
                {**variables, "params": params}, x, train=False
            )
            logits = out[0] if isinstance(out, (tuple, list)) else out
            return jnp.sum(jnp.tanh(logits))

        val, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return val, grads

    cfg_dense = _mvit_cfg(**{"MODEL.NUM_CLASSES": 4})
    cfg_dense.MVIT.CLS_EMBED_ON = False
    v_dense, g_dense = forward(cfg_dense)

    cfg_flash = _mvit_cfg(**{"MODEL.NUM_CLASSES": 4})
    cfg_flash.MVIT.CLS_EMBED_ON = False
    cfg_flash.TPU.FLASH_ATTENTION = True
    with pltpu.force_tpu_interpret_mode():
        v_flash, g_flash = forward(cfg_flash)

    assert abs(float(v_dense) - float(v_flash)) < 1e-4
    flat_d = jax.tree.leaves(g_dense)
    flat_f = jax.tree.leaves(g_flash)
    assert len(flat_d) == len(flat_f)
    for a, b in zip(flat_d, flat_f):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_flash_falls_back_off_tpu():
    """With the flag on but neither a TPU backend nor interpret mode, the
    module must silently use the dense path (CPU mesh tests/dryrun)."""
    from advise_tpu.ops.flash_attention import flash_available

    assert jax.default_backend() == "cpu"
    assert not flash_available()
    from tests.test_transformers import _mvit_cfg, _run

    cfg = _mvit_cfg()
    cfg.MVIT.CLS_EMBED_ON = False
    cfg.TPU.FLASH_ATTENTION = True
    _run(cfg)  # would raise "Only interpret mode supported on CPU" if not
