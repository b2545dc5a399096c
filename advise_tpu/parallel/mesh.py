"""Device mesh construction and distributed runtime init.

TPU-native replacement for the reference's NCCL process-group layer
(reference ``utils/distributed.py:21-76``): instead of one torch process per
GPU with ``init_process_group``, we run SPMD — a single program over a
``jax.sharding.Mesh`` with two axes:

- ``data``: the outer data-parallel axis (gradient psum rides this + sync),
- ``sync``: the inner axis over which BatchNorm statistics are synchronized.

The reference's ``BN.NUM_SYNC_DEVICES`` subgrouping (``models/
batchnorm_helper.py:16-37`` — sync BN stats over groups of N devices, not the
world) maps to the size of the ``sync`` axis: devices sharing a ``data``
coordinate form one BN sync group. ``BN.GLOBAL_SYNC`` maps to syncing over
both axes. Gradients are averaged over both axes (the whole world), matching
DDP's world allreduce (reference ``models/build.py:76-87``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# Canonical mesh axis names.
DATA_AXIS = "data"
SYNC_AXIS = "sync"
# Sequence-parallel axis (TPU.MESH_SEQ > 1): attention token dim shards
# here via ring attention; batch is replicated along it.
SEQ_AXIS = "seq"
# Pipeline-parallel axis (TPU.MESH_PIPE > 1): reversible-MViT segments
# run GPipe-style over it (parallel/pipeline.py); batch replicated.
from advise_tpu.parallel.pipeline import PIPE_AXIS  # noqa: E402
# Tensor-parallel axis (TPU.PARTITION_MODE='auto' + TPU.MESH_MODEL > 1):
# attention heads / MLP hidden shard here via GSPMD param shardings.
MODEL_AXIS = "model"
# Batch dimension is sharded over both axes (flattened).
BATCH_AXES = (DATA_AXIS, SYNC_AXIS)


def distributed_init(cfg) -> None:
    """Initialize multi-host JAX if launched under a multi-host coordinator.

    Single-host (the common case for tests and one TPU slice) is a no-op.
    Mirrors the role of reference ``utils/distributed.py:21-76`` (SLURM /
    torchrun env rendezvous) but over JAX's coordinator. Sets the derived
    cfg fields the reference injects: RANK, LOCAL_RANK, NUM_WORLDS.
    """
    if (
        "COORDINATOR_ADDRESS" in os.environ
        and jax.process_count() == 1
        and not jax.distributed.is_initialized()
    ):
        jax.distributed.initialize()

    cfg.RANK = jax.process_index()
    cfg.LOCAL_RANK = 0  # SPMD: one process drives all local devices
    # NUM_WORLDS in the reference = number of ranks = number of accelerators
    # (one process per GPU). Here it is the number of batch-carrying
    # devices (model/seq axes replicate the batch), so the linear-LR
    # batch scaling (utils/solver.py:7-16) stays equivalent.
    cfg.NUM_WORLDS = batch_device_count(cfg)


def mesh_shape(cfg, n_devices: Optional[int] = None) -> Tuple[int, int]:
    """Resolve (data, sync) axis sizes from cfg and the device count.
    When TPU.MESH_SEQ > 1, these cover n // seq devices (the seq axis is
    carved off first in :func:`build_mesh`)."""
    n = n_devices if n_devices is not None else jax.device_count()
    seq = max(int(getattr(cfg.TPU, "MESH_SEQ", 1) or 1), 1)
    if seq > 1:
        assert n % seq == 0, (n, seq)
        n = n // seq
    pipe = max(int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1), 1)
    if pipe > 1:
        assert n % pipe == 0, (n, pipe)
        n = n // pipe
    if cfg.BN.GLOBAL_SYNC:
        sync = n
    else:
        sync = int(cfg.TPU.MESH_SYNC)
        if sync <= 0:
            sync = min(int(cfg.BN.NUM_SYNC_DEVICES or 1), n)
        sync = min(sync, n)
    while n % sync != 0:
        sync -= 1  # fall back to the largest divisor
    data = n // sync
    # TPU.MESH_DATA: explicit data-axis size (-1 = infer as n // sync).
    # An explicit value must agree with the device count — reject loudly
    # rather than silently ignoring a user-pinned topology.
    want_data = int(getattr(cfg.TPU, "MESH_DATA", -1) or -1)
    if want_data > 0 and want_data != data:
        raise ValueError(
            f"TPU.MESH_DATA={want_data} but {n} batch devices with "
            f"sync={sync} give data={data}; set MESH_DATA -1 to infer or "
            "make data*sync match the device count"
        )
    return data, sync


def build_mesh(cfg, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the ('data', 'sync'[, 'seq']) mesh.

    Adjacent devices share a sync group, which on a TPU slice keeps BN-stat
    psums on the shortest ICI paths; the innermost 'seq' ring (TPU.MESH_SEQ
    > 1) keeps ring-attention ppermutes on directly-wired neighbors.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    if getattr(cfg.TPU, "PARTITION_MODE", "shard_map") == "auto":
        # GSPMD mesh: ('data', 'model'). Innermost = model so tensor-
        # parallel collectives (qkv/MLP all-reduces) ride adjacent ICI
        # links; BN/batch reductions span 'data' automatically.
        model = max(int(getattr(cfg.TPU, "MESH_MODEL", 1) or 1), 1)
        assert devs.size % model == 0, (devs.size, model)
        data = devs.size // model
        logger.info(
            "Mesh[auto]: data=%d model=%d over %d devices",
            data, model, devs.size,
        )
        return Mesh(devs.reshape(data, model), (DATA_AXIS, MODEL_AXIS))
    data, sync = mesh_shape(cfg, n_devices=devs.size)
    seq = max(int(getattr(cfg.TPU, "MESH_SEQ", 1) or 1), 1)
    if seq > 1:
        logger.info(
            "Mesh: data=%d sync=%d seq=%d over %d devices",
            data, sync, seq, devs.size,
        )
        return Mesh(
            devs.reshape(data, sync, seq), (DATA_AXIS, SYNC_AXIS, SEQ_AXIS)
        )
    pipe = max(int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1), 1)
    if pipe > 1:
        # innermost = pipe so the stage-to-stage ppermute ring rides
        # directly-wired ICI neighbors
        logger.info(
            "Mesh: data=%d sync=%d pipe=%d over %d devices",
            data, sync, pipe, devs.size,
        )
        return Mesh(
            devs.reshape(data, sync, pipe), (DATA_AXIS, SYNC_AXIS, PIPE_AXIS)
        )
    logger.info("Mesh: data=%d sync=%d over %d devices", data, sync, devs.size)
    return Mesh(devs.reshape(data, sync), (DATA_AXIS, SYNC_AXIS))


def bn_axis_names(cfg) -> Tuple[str, ...]:
    """Mesh axes over which BatchNorm statistics are synchronized."""
    if getattr(cfg.TPU, "PARTITION_MODE", "shard_map") == "auto":
        # GSPMD: BN's plain batch reduction already spans the globally-
        # sharded batch — no named axes exist or are needed
        return ()
    if cfg.BN.NORM_TYPE != "sync_batchnorm":
        return ()
    if cfg.BN.GLOBAL_SYNC:
        return (DATA_AXIS, SYNC_AXIS)
    return (SYNC_AXIS,)


def batch_device_count(cfg, n_devices: Optional[int] = None) -> int:
    """Number of devices that carry distinct batch shards: the total
    device count divided by the batch-replicating axes ('model' under the
    auto partition mode, 'seq' under shard_map sequence parallelism).
    This is the reference's NUM_WORLDS for LR scaling / loader sizing."""
    n = n_devices if n_devices is not None else jax.device_count()
    if getattr(cfg.TPU, "PARTITION_MODE", "shard_map") == "auto":
        rep = max(int(getattr(cfg.TPU, "MESH_MODEL", 1) or 1), 1)
    else:
        rep = max(int(getattr(cfg.TPU, "MESH_SEQ", 1) or 1), 1) * max(
            int(getattr(cfg.TPU, "MESH_PIPE", 1) or 1), 1
        )
    assert n % rep == 0, (n, rep)
    return n // rep


def mesh_batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The axes of `mesh` that carry the batch dimension: 'data' plus
    'sync' when present (shard_map meshes); just 'data' on an auto
    ('data','model') mesh — batch is replicated along 'model'/'seq'."""
    return tuple(a for a in (DATA_AXIS, SYNC_AXIS) if a in mesh.axis_names)


def batch_sharding(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Sharding that splits dim `batch_dim` over the mesh's batch axes."""
    spec = [None] * ndim
    spec[batch_dim] = mesh_batch_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(cfg, mesh: Mesh) -> int:
    """Per-device batch size for a global batch sharded over the mesh."""
    n = mesh.devices.size
    global_batch = cfg.DATA.BATCHSIZE_PER_GPU * n
    assert global_batch % n == 0
    return global_batch // n
