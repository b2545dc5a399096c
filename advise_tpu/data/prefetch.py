"""Host->device prefetch with double buffering.

The TPU analog of pinned-memory + ``.cuda(non_blocking=True)`` (reference
``tools/train.py:58``): batches are pushed to device (sharded over the
mesh batch axes) ahead of consumption so the input pipeline overlaps the
train step. BASELINE.json names this explicitly ("double-buffered
host-to-device prefetch").
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterator, Tuple

import jax
import numpy as np

from advise_tpu.parallel.mesh import batch_sharding, replicated


def device_put_batch(mesh, clips: np.ndarray, infos: Dict[str, np.ndarray]):
    """Transfer one batch: clips sharded on dim 0 over the whole mesh,
    infos fields likewise (they are all leading-batch arrays)."""
    clips_s = jax.device_put(clips, batch_sharding(mesh, clips.ndim))
    infos_s = {
        k: jax.device_put(v, batch_sharding(mesh, np.asarray(v).ndim))
        for k, v in infos.items()
    }
    return clips_s, infos_s


def prefetch_to_device(
    iterator: Iterator[Tuple[np.ndarray, Dict[str, np.ndarray]]],
    mesh,
    size: int = 2,
):
    """Yield device-resident batches, keeping `size` transfers in flight.

    jax.device_put is async — enqueueing the next transfer while the
    current step runs overlaps H2D DMA with compute.
    """
    queue = collections.deque()
    for host_batch in iterator:
        queue.append(device_put_batch(mesh, *host_batch))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
