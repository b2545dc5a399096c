"""AOT-certify the pod-scale MViT-L 32x312 joint preset at REAL shape.

Compiles the FULL train step of ``configs/pretrain/MViT_L_32x312_joint.yaml``
(EMBED_DIM=144, DEPTH=48, 32 frames x 312^2, reversible O(1) + MVIT.SEQ_SHARD
ring attention) against a chipless v5e TPU topology via
``jax.experimental.topologies`` + the local libtpu AOT compiler — no chips
needed — and reports XLA's compiled per-chip memory analysis vs the 16G v5e
HBM budget (BASELINE.json config #5; VERDICT r3 item 3).

Usage: python scripts/aot_mvitl.py [--topology v5e:4x8] [--seq 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU runtime: the chipless AOT topology client is independent of the
# runtime backend, and auto-selecting would try to initialize the axon
# relay — which BLOCKS whenever another process holds the chip
os.environ["JAX_PLATFORMS"] = "cpu"
# ...but the compile TARGET is always a TPU topology: let backend-gated
# TPU kernels (ops/flash_attention.py flash_available) trace in
os.environ["ADVISE_FLASH_TARGET_TPU"] = "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/pretrain/MViT_L_32x312_joint.yaml",
                    help="preset to certify (any task)")
    ap.add_argument("--topology", default="v5e:4x8",
                    help="chipless target topology (32 chips default)")
    ap.add_argument("--seq", type=int, default=None,
                    help="force TPU.MESH_SEQ (e.g. 8 reproduces the r4 "
                    "ring-attention cert); default keeps the preset's "
                    "value (MViT-L ships pure DP since r5)")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model (plumbing smoke, not the cert)")
    ap.add_argument("--opts", nargs="*", default=[])
    ap.add_argument("--lower-only", action="store_true",
                    help="stop after StableHLO lowering (fast geometry "
                    "check; skips the TPU compile + memory analysis)")
    ap.add_argument("--cost", action="store_true",
                    help="also print the executable's cost analysis "
                    "(flops, bytes accessed) and the v5e roofline floors")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize pre-imports
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies

    from advise_tpu.config import assert_and_infer_cfg, get_cfg
    from advise_tpu.data import build_device_aug, ingest_geometry
    from advise_tpu.engine.state import TrainState
    from advise_tpu.engine.steps import make_train_step
    from advise_tpu.models import build_model
    from advise_tpu.parallel import build_mesh
    from advise_tpu.solver import build_tx

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology
    )
    devices = list(topo.devices)
    n = len(devices)
    print(f"topology {args.topology}: {n} abstract devices")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(root, args.cfg))
    cfg.NUM_GPUS = n
    if args.seq is not None:
        cfg.TPU.MESH_SEQ = args.seq
    cfg.DATA.DECODE_BACKEND = "synthetic"
    if args.tiny:
        cfg.MVIT.EMBED_DIM = 8
        cfg.MVIT.NUM_HEADS = 1
        cfg.MVIT.DEPTH = 6
        cfg.MVIT.DIM_MUL = [[2, 2.0]]
        cfg.MVIT.HEAD_MUL = [[2, 2.0]]
        cfg.MVIT.POOL_Q_STRIDE = [[2, 1, 2, 2]]
        cfg.MASK.PRETRAIN_DEPTH = [5]
        cfg.DATA.NUM_FRAMES = 8
        cfg.AUG.TARGET_SIZE = 64
        cfg.MVIT.SEQ_SHARD_MIN_TOKENS = 256
    cfg.DATA.TRAIN_CROP_SIZE = cfg.AUG.TARGET_SIZE
    cfg.DATA.TEST_CROP_SIZE = cfg.AUG.TARGET_SIZE
    if args.opts:
        cfg.merge_from_list(args.opts)
    # batch-carrying devices: total minus the batch-replicating axes
    # (seq/pipe under shard_map, model under auto) — mesh.py owns the
    # rule. An explicit --opts NUM_WORLDS wins (e.g. to certify an
    # alternative LR-scaling world count).
    if "NUM_WORLDS" not in args.opts:
        from advise_tpu.parallel.mesh import batch_device_count

        cfg.NUM_WORLDS = batch_device_count(cfg, n)
    cfg = assert_and_infer_cfg(cfg)

    mesh = build_mesh(cfg, devices=devices)
    print(f"mesh: {dict(mesh.shape)}")

    model = build_model(cfg)
    model_init = build_model(cfg, sync_axes=())
    t, s = cfg.DATA.NUM_FRAMES, cfg.AUG.TARGET_SIZE
    sample = jnp.zeros((1, t, s, s, 3), jnp.float32)

    # abstract state: eval_shape the whole init chain so the 218M-param
    # MViT-L never materializes on the host
    def init_variables():
        return model_init.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2)},
            sample, train=False,
        )

    var_shapes = jax.eval_shape(init_variables)
    param_shapes = var_shapes["params"]
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(param_shapes)
    )
    print(f"params: {n_params:,}")

    # build_tx only inspects the tree structure/paths/shapes
    zeros = jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, x.dtype), param_shapes
    )
    bundle = build_tx(cfg, zeros)
    opt_shapes = jax.eval_shape(bundle.tx.init, param_shapes)

    def sds(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )

    ssl = {}
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        from advise_tpu.engine.contrastive import init_ssl_state

        ssl = sds(jax.eval_shape(
            lambda p, bs: init_ssl_state(cfg, p, bs, jax.random.PRNGKey(7)),
            param_shapes, var_shapes.get("batch_stats", {}),
        ))
    state = TrainState(
        params=sds(param_shapes),
        batch_stats=sds(var_shapes.get("batch_stats", {})),
        opt_state=sds(opt_shapes),
        step=jax.ShapeDtypeStruct((), jnp.int32),
        ssl=ssl,
    )

    b = cfg.NUM_WORLDS * cfg.DATA.BATCHSIZE_PER_GPU  # global batch
    k = cfg.DATA.NUM_CLIP
    w_in, h_in = ingest_geometry(cfg, "train")
    clips = jax.ShapeDtypeStruct((b, k, t, h_in, w_in, 3), jnp.uint8)
    infos = {}
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        infos["item_id"] = jax.ShapeDtypeStruct((b,), jnp.int32)
        infos["time_idx"] = jax.ShapeDtypeStruct((b,), jnp.float32)
    if cfg.TASK == "speed" or (
        cfg.TASK == "tmodeling" and "speed" in cfg.SSL.TASK
    ):
        infos["spd_label"] = jax.ShapeDtypeStruct((b, k), jnp.int32)
    if cfg.TASK == "action_recog":
        infos["cls_id"] = jax.ShapeDtypeStruct((b,), jnp.int32)
    if cfg.TASK == "masked" and not cfg.MASK.MAE_RND_MASK:
        pt, ph, pw = cfg.MVIT.PATCH_STRIDE
        grid = (max(t // pt, 1), s // ph, s // pw)
        infos["mask"] = jax.ShapeDtypeStruct((b, k) + grid, jnp.uint8)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lr = jax.ShapeDtypeStruct((), jnp.float32)

    aug = build_device_aug(cfg, "train")
    step = make_train_step(cfg, mesh, model, bundle, aug)

    extra = ()
    if cfg.MODEL.MODEL_NAME == "ContrastiveModel":
        extra = (jax.ShapeDtypeStruct((), jnp.float32),)  # epoch_exact
    print("lowering...")
    lowered = step.lower(state, clips, infos, rng, lr, *extra)
    if args.lower_only:
        print("LOWERED OK (geometry valid); skipping compile")
        return 0
    print("compiling (chipless TPU AOT)...")
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1 << 30
    print(
        f"per-chip memory: args={ma.argument_size_in_bytes / gib:.3f}G "
        f"out={ma.output_size_in_bytes / gib:.3f}G "
        f"temp={ma.temp_size_in_bytes / gib:.3f}G "
        f"alias={ma.alias_size_in_bytes / gib:.3f}G "
        f"code={ma.generated_code_size_in_bytes / gib:.3f}G"
    )
    total = (
        ma.argument_size_in_bytes
        + ma.output_size_in_bytes
        + ma.temp_size_in_bytes
        - ma.alias_size_in_bytes
        + ma.generated_code_size_in_bytes
    )
    budget = 15.75 * gib  # v5e HBM minus reserved (measured, BASELINE)
    print(
        f"TOTAL {total / gib:.3f}G vs budget 15.75G -> "
        f"{'FITS' if total <= budget else 'OVER by %.2fG' % ((total - budget) / gib)}"
    )
    if args.cost:
        # Roofline floors from the compiled executable's own cost model:
        # the HBM floor (bytes the program touches / peak bandwidth) is
        # the speed-of-light for a bandwidth-bound step; the MXU floor is
        # flops / bf16 peak. v5e: 819 GB/s HBM, 197 TFLOP/s bf16.
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        hbm_ms = byts / 819e9 * 1e3
        mxu_ms = flops / 197e12 * 1e3
        print(
            f"cost: flops={flops / 1e12:.2f}T bytes_accessed="
            f"{byts / gib:.2f}G -> HBM floor {hbm_ms:.1f} ms, "
            f"MXU floor {mxu_ms:.1f} ms (v5e 819GB/s / 197TF bf16)"
        )
    return 0 if total <= budget else 2


if __name__ == "__main__":
    sys.exit(main())
