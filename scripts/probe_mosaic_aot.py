"""Chipless probe of Mosaic's runtime-offset slicing rules (local libtpu
AOT against a v5e topology, same harness as aot_mvitl.py — no chips, no
relay). As of 2026-08 the axon remote-compile helper no longer crashes
opaquely on runtime-offset kernels; it emits real diagnostics like
"Failed to prove that a tile index in dimension 3 is divisible by the
tiling (8)". This script maps what IS accepted so the fused-aug kernel
(ops/pallas/fused_aug.py, TPU.PALLAS_AUG) can be redesigned to fit.

Usage: python scripts/probe_mosaic_aot.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental import topologies
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
    mesh = Mesh(np.array(topo.devices).reshape(2, 2), ("a", "b"))
    repl = NamedSharding(mesh, P())

    from jax.experimental.shard_map import shard_map

    def try_compile(name, fn, *args):
        try:
            sds = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args]
            wrapped = shard_map(
                fn, mesh=mesh, in_specs=tuple(P() for _ in args),
                out_specs=P(), check_rep=False,
            )
            jax.jit(
                wrapped, in_shardings=repl, out_shardings=repl
            ).lower(*sds).compile()
            print(f"  OK    {name}")
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"  FAIL  {name}: {msg}")
            return False

    H, W = 64, 256
    x2 = jnp.zeros((H, W), jnp.float32)
    x3 = jnp.zeros((8, H, W), jnp.float32)
    xu = jnp.zeros((8, H, W, 3), jnp.uint8)
    off = jnp.int32(8)

    # 1. dynamic offset on a LEADING (untiled) dim of a DMA'd ref
    def lead_dyn(o, x):
        def kern(o_ref, x_ref, out_ref):
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[pl.ds(o_ref[0], 2), :, :], scratch, sem
                )
                dma.start(); dma.wait()
                out_ref[...] = scratch[...].sum(axis=0)
            pl.run_scoped(
                body, scratch=pltpu.VMEM((2, H, W), jnp.float32),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((H, W), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )(o[None], x)

    # 2. dynamic UNALIGNED offset on the sublane dim
    def sub_dyn(o, x):
        def kern(o_ref, x_ref, out_ref):
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(o_ref[0], 16), :], scratch, sem
                )
                dma.start(); dma.wait()
                out_ref[...] = scratch[...]
            pl.run_scoped(
                body, scratch=pltpu.VMEM((16, W), jnp.float32),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, W), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.float32),
        )(o[None], x)

    # 3. dynamic ALIGNED (multiple_of) offset on the sublane dim
    def sub_aligned(o, x):
        def kern(o_ref, x_ref, out_ref):
            o8 = pl.multiple_of((o_ref[0] // 8) * 8, 8)
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(o8, 16), :], scratch, sem
                )
                dma.start(); dma.wait()
                out_ref[...] = scratch[...]
            pl.run_scoped(
                body, scratch=pltpu.VMEM((16, W), jnp.float32),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, W), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.float32),
        )(o[None], x)

    # 4. in-VMEM value dynamic_slice along sublanes (post-load shift)
    def val_dslice(o, x):
        def kern(o_ref, x_ref, out_ref):
            v = x_ref[...]  # [H, W] VMEM
            out_ref[...] = jax.lax.dynamic_slice_in_dim(v, o_ref[0], 16, 0)
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((H, W), lambda i, *_: (0, 0))],
                out_specs=pl.BlockSpec((16, W), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.float32),
        )(o[None], x)

    # 5. pltpu.roll with a dynamic shift along sublanes, then static slice
    def roll_dyn(o, x):
        def kern(o_ref, x_ref, out_ref):
            v = x_ref[...]
            out_ref[...] = pltpu.roll(v, -o_ref[0], 0)[:16, :]
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((H, W), lambda i, *_: (0, 0))],
                out_specs=pl.BlockSpec((16, W), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.float32),
        )(o[None], x)

    # 6. the real fused-aug DMA pattern: uint8 [N,T,H,W,3], dynamic top
    #    (dim 2, untiled) + dynamic unaligned left (dim 3, sublanes)
    def aug_like(o, x):
        def kern(o_ref, x_ref, out_ref):
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(o_ref[0], 16), pl.ds(o_ref[1], 16), :],
                    scratch, sem,
                )
                dma.start(); dma.wait()
                out_ref[...] = scratch[...].astype(jnp.int32).astype(
                    jnp.float32
                )
            pl.run_scoped(
                body, scratch=pltpu.VMEM((16, 16, 3), jnp.uint8),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, 16, 3), lambda i, *_: (0, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, 16, 3), jnp.float32),
        )(jnp.stack([o, o]), x)

    # 7. same but left aligned via multiple_of
    def aug_like_aligned(o, x):
        def kern(o_ref, x_ref, out_ref):
            la = pl.multiple_of((o_ref[1] // 32) * 32, 32)
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[0, pl.ds(o_ref[0], 16), pl.ds(la, 64), :],
                    scratch, sem,
                )
                dma.start(); dma.wait()
                out_ref[...] = scratch[...].astype(jnp.int32).astype(
                    jnp.float32
                )
            pl.run_scoped(
                body, scratch=pltpu.VMEM((16, 64, 3), jnp.uint8),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, 64, 3), lambda i, *_: (0, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, 64, 3), jnp.float32),
        )(jnp.stack([o, o]), x)

    print("Mosaic AOT acceptance (v5e:1x1, local libtpu):")
    try_compile("1 leading-dim dynamic DMA offset", lead_dyn, off, x3)
    try_compile("2 sublane-dim dynamic UNALIGNED DMA offset", sub_dyn, off, x3)
    try_compile("3 sublane-dim dynamic multiple_of(8) DMA offset",
                sub_aligned, off, x3)
    try_compile("4 in-VMEM value dynamic_slice (sublanes)", val_dslice,
                off, x2)
    try_compile("5 pltpu.roll dynamic shift (sublanes)", roll_dyn, off, x2)
    try_compile("6 fused-aug DMA: dyn top + dyn UNALIGNED left (u8 HWC)",
                aug_like, off, xu)
    try_compile("7 fused-aug DMA: dyn top + multiple_of(32) left (u8 HWC)",
                aug_like_aligned, off, xu)


    # 8. pltpu.roll dynamic shift along LANES (minor dim)
    def roll_lane(o, x):
        def kern(o_ref, x_ref, out_ref):
            v = x_ref[...]
            out_ref[...] = pltpu.roll(v, -o_ref[0], 1)[:, :128]
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec((H, W), lambda i, *_: (0, 0))],
                out_specs=pl.BlockSpec((H, 128), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((H, 128), jnp.float32),
        )(o[None], x)

    # 9. flat-row u8 DMA: [N,T,H,W3] u8, dyn aligned top, full 128-mult W3
    def flat_u8(o, x):
        def kern(o_ref, x_ref, out_ref):
            ta = pl.multiple_of((o_ref[0] // 8) * 8, 8)
            def body(scratch, sem):
                dma = pltpu.make_async_copy(
                    x_ref.at[0, 2, pl.ds(ta, 24), :], scratch, sem
                )
                dma.start(); dma.wait()
                v = scratch[...].astype(jnp.int32).astype(jnp.float32)
                v = pltpu.roll(v, -(o_ref[0] % 8), 0)       # sublane residual
                v = pltpu.roll(v, -(3 * o_ref[1]), 1)       # lane crop shift
                out_ref[...] = v[:16, :640]
            pl.run_scoped(
                body, scratch=pltpu.VMEM((24, 896), jnp.uint8),
                sem=pltpu.SemaphoreType.DMA,
            )
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((16, 640), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((16, 640), jnp.float32),
        )(jnp.stack([o, o]), x)

    xf = jnp.zeros((4, 8, 64, 896), jnp.uint8)
    try_compile("8 pltpu.roll dynamic shift (LANES)", roll_lane, off, x2)
    try_compile("9 flat-row u8 DMA + residual rolls (the v2 design)",
                flat_u8, off, xf)


if __name__ == "__main__":
    main()
