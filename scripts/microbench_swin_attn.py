"""Measure XLA's lowering of Swin-B window attention per stage —
the 'measure before building' gate for a custom window-attention kernel
(BASELINE.md round-5 open item).

Context: the Swin-B MoCo flagship runs 226.7 ms/step at 10.4 % MFU with
a FLAT kernel profile (r4 trace), so any custom kernel must beat XLA on
the batched [nW*B, heads, 392, 32] attention GEMMs specifically. This
script times the dense window-attention chain (qk einsum -> +bias+mask
-> softmax -> av einsum, exactly `models/swin3d.py WindowAttention3D`'s
score path) forward and fwd+grad at every Swin-B stage geometry of the
shipped preset (SwinB_moco_32chips.yaml: 16f x 224^2, window (8,7,7),
bs4 x 2 views), and compares the achieved TFLOP/s against an
equal-FLOP, MXU-friendly big-GEMM comparator timed on the same backend.

Decision rule (documented in BASELINE.md): a fused kernel's best case is
removing the [n, n] f32 score round-trips; if the attention chain
already runs within ~2x of the big-GEMM rate, the headroom on Swin's
<=20 % attention share cannot repay a kernel at nk=392 — the same
small-nk regime where flash attention measurably LOST at MViT-S
(150.3 -> 188.7 ms, BASELINE.md r5).

Usage: python scripts/microbench_swin_attn.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "JAX_PLATFORMS" in os.environ:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: jnp.sum(a).item(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: jnp.sum(a).item(), out)
    return (time.perf_counter() - t0) / iters


# SwinB_moco_32chips.yaml geometry: 16 frames x 224^2, patch (2,4,4) ->
# tokens [8, 56, 56]; window (8,7,7) -> n = 392 everywhere; two clips
# per sample (NUM_CLIP 2) x BATCHSIZE_PER_GPU 4 = 8 clip-views.
CLIPS = 8
STAGES = [
    # (name, dim, heads, token grid (d,h,w))
    ("s0 d128 h4", 128, 4, (8, 56, 56)),
    ("s1 d256 h8", 256, 8, (8, 28, 28)),
    ("s2 d512 h16 x18", 512, 16, (8, 14, 14)),
    ("s3 d1024 h32", 1024, 32, (8, 7, 7)),
]
WINDOW = (8, 7, 7)


def stage_shapes(dim, heads, grid):
    d, h, w = grid
    wd, wh, ww = (min(a, b) for a, b in zip(WINDOW, grid))
    nw = (d // wd) * (h // wh) * (w // ww)
    n = wd * wh * ww
    return CLIPS * nw, n, dim // heads


def attn_chain(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + bias[None].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkc->bhqc", p, v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    rng = np.random.default_rng(0)
    total_fwd = total_grad = 0.0
    rows = []
    for name, dim, heads, grid in STAGES:
        b_, n, hd = stage_shapes(dim, heads, grid)
        q, k, v = (
            jnp.asarray(rng.standard_normal((b_, heads, n, hd)),
                        jnp.bfloat16)
            for _ in range(3)
        )
        bias = jnp.asarray(rng.standard_normal((heads, n, n)), jnp.float32)
        fwd = jax.jit(attn_chain)

        def loss(q, k, v):
            return jnp.sum(attn_chain(q, k, v, bias).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, (0, 1, 2)))
        t_f = timed(fwd, q, k, v, bias, iters=args.iters)
        t_g = timed(grad, q, k, v, iters=args.iters)
        flops_f = 2 * 2 * b_ * heads * n * n * hd  # qk + av
        # equal-FLOP big-GEMM comparator (square-ish, MXU-friendly)
        m = int(round((flops_f / 2) ** (1 / 3) / 128)) * 128
        a = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
        gemm = jax.jit(lambda a, b: a @ b)
        t_gemm = timed(gemm, a, b, iters=args.iters)
        rate = flops_f / t_f / 1e12
        rate_gemm = 2 * m**3 / t_gemm / 1e12
        rows.append((name, b_, n, hd, t_f * 1e3, t_g * 1e3,
                     rate, rate_gemm))
        total_fwd += t_f
        total_grad += t_g
        print(f"{name:18s} b_={b_:4d} n={n} hd={hd:3d}  "
              f"fwd {t_f*1e3:7.2f} ms ({rate:5.1f} TF/s)  "
              f"fwd+grad {t_g*1e3:7.2f} ms  "
              f"equal-FLOP GEMM {rate_gemm:5.1f} TF/s  "
              f"attain {100*rate/rate_gemm:4.0f}%")
    # per-LAYER cost x depths -> share of the 226.7 ms step
    depths = [2, 2, 18, 2]
    step_share = sum(d * r[5] for d, r in zip(depths, rows))
    print(f"\nall-stage single-layer fwd {total_fwd*1e3:.2f} ms, "
          f"fwd+grad {total_grad*1e3:.2f} ms")
    print(f"depth-weighted attention fwd+grad estimate: {step_share:.1f} ms "
          f"(vs 226.7 ms step, r5 record)")


if __name__ == "__main__":
    main()
