"""Flash (tiled online-softmax) attention for MViT's pooled-KV blocks.

``TPU.FLASH_ATTENTION`` routes `MultiScaleAttention`'s eligible score
computation (no rel-pos tables — the benched MViT presets: REL_POS_*
default False) through JAX's production Pallas TPU flash-attention
kernel instead of the XLA einsum→softmax→einsum chain.

Why it matters here: MViT pools K/V far below Q (reference
``models/attention.py:162-305`` POOL_KV_STRIDE), so every block
materializes a rectangular ``[nq, nk]`` float32 score tensor in HBM —
e.g. ``[25088, 392]`` per head at the MViT-S 16x224 stage-0 blocks and
``[97344, 1521]`` at the MViT-L 32x312 preset, whose pod-scale HBM
floor those tensors dominate (BASELINE.md r4 pod rooflines). The flash
kernel streams KV tiles through VMEM with an online softmax and never
writes scores to HBM; its custom-VJP backward recomputes them tile-wise
from the saved ``(o, l, m)`` statistics.

MViT shapes are not tile-aligned, so this wrapper:
  - pads ``nq`` up to a 128 multiple (padded query rows attend to real
    keys and are sliced off — harmless garbage, no masking needed);
  - pads ``nk`` up to a 128 multiple and masks the padded keys via
    ``SegmentIds`` (padded keys MUST be masked: zero-filled K would
    otherwise receive real softmax weight);
  - zero-pads ``head_dim`` up to the kernel's supported sizes (<=128, or
    a 128 multiple above — MViT's dim-doubling blocks run head_dim 192
    while the head count catches up one stage later). Zero columns in
    q/k add nothing to the scores and zero columns in v emit zero output
    columns, so the slice-off is exact in both forward and backward.

Parity: tests/test_flash_attention.py — fwd + dq/dk/dv against the
dense path at 1e-5, through the real MultiScaleAttention module, in TPU
interpret mode on CPU.

Fallback: the kernel needs a TPU (or the TPU interpreter); on any other
backend the caller's dense path is used so CPU meshes (tests, dryrun)
run unchanged with the flag on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interpret_forced() -> bool:
    """True inside pltpu.force_tpu_interpret_mode (CPU parity tests)."""
    try:
        from jax._src import config as jax_config

        cm = jax_config.pallas_tpu_interpret_mode_context_manager
        return cm.value is not None
    except Exception:
        return False


def flash_available() -> bool:
    """Kernel can run: on a TPU backend, or interpreted for tests.

    ``ADVISE_FLASH_TARGET_TPU=1`` force-enables it for chipless AOT
    lowering (scripts/aot_mvitl.py): the compile TARGET is a TPU
    topology while the runtime backend is CPU, so backend sniffing
    alone would silently trace the dense path into the certificate.
    """
    import os

    if os.environ.get("ADVISE_FLASH_TARGET_TPU"):
        return True
    return jax.default_backend() == "tpu" or _interpret_forced()


def _pad_to(n: int, m: int = 128) -> int:
    return -(-n // m) * m


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: float) -> jnp.ndarray:
    """softmax(q @ k^T * scale) @ v via the Pallas flash kernel.

    q: [b, h, nq, d]; k, v: [b, h, nk, d] (rectangular nq != nk fine).
    Returns [b, h, nq, d] in v.dtype (accumulation f32 inside the kernel).
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, nq, d = q.shape
    nk = k.shape[2]
    if d > 128 and d % 128:
        # kernel constraint: head_dim <=128 or a multiple of 128
        d_p = _pad_to(d)
        pad = ((0, 0), (0, 0), (0, 0), (0, d_p - d))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        return flash_mha(q, k, v, scale)[..., :d]
    nq_p, nk_p = _pad_to(nq), _pad_to(nk)
    if nq_p != nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, 0)))
    segment_ids = None
    if nk_p != nk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, 0)))
        kv_seg = jnp.pad(
            jnp.ones((b, nk), jnp.int32), ((0, 0), (0, nk_p - nk))
        )
        segment_ids = fa.SegmentIds(
            q=jnp.ones((b, nq_p), jnp.int32), kv=kv_seg
        )
    # Tile sizes: 128 is the TPU lane minimum; 512-wide q tiles amortize
    # the KV loop when the padded token count allows (guide defaults).
    bq = 512 if nq_p % 512 == 0 else 128
    bkm = 512 if nk_p % 512 == 0 else 128
    sizes = fa.BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=128, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=128,
        block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=128,
        block_q_dq=bq,
    )
    out = fa.flash_attention(
        q, k, v, segment_ids=segment_ids, sm_scale=float(scale),
        block_sizes=sizes,
    )
    return out[:, :, :nq]
