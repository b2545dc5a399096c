"""Host-side data loader: threaded decode workers + deterministic seeding.

Replaces ``torch.utils.data.DataLoader`` (reference
``datasets/__init__.py:249-303``) with a dependency-free loader designed
for the TPU ingest path:

- **thread pool** decode workers (cv2 releases the GIL in decode/resize;
  threads avoid the fork+pickle overhead of torch worker processes),
- **bounded lookahead** so decode overlaps device compute without
  unbounded memory,
- **determinism**: item randomness comes from
  ``SeedSequence([seed, epoch, item_index])`` — reproducible per item
  regardless of worker scheduling, and naturally different across epochs
  (the reference accidentally reuses identical aug randomness every epoch,
  SURVEY.md §8.9),
- **multi-host sharding**: hosts take strided slices of the permutation,
  the analog of torch's DistributedSampler (reference
  ``datasets/__init__.py:254-256``).

Batches are uint8 ``[B, K, T, H, W, C]`` + an ``infos`` dict of stacked
arrays; normalization/augmentation happen on device.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from advise_tpu.data.dataset import ClipDataset


def threaded_items(
    dataset,
    n_items: int,
    seed_stream,
    num_workers: int = 8,
    lookahead: int = 32,
) -> Iterator[Tuple[int, Tuple[np.ndarray, Dict[str, np.ndarray]]]]:
    """Ordered threaded fetch of ``dataset.get(idx, rng)`` for
    idx in range(n_items) — the eval-phase counterpart of ClipLoader's
    decode pool (validation/inference previously decoded serially on the
    calling thread and were input-bound). ``seed_stream(idx)`` returns the
    per-item SeedSequence entropy list; determinism is identical to the
    serial loop."""

    def fetch(idx):
        rng = np.random.default_rng(np.random.SeedSequence(seed_stream(idx)))
        return dataset.get(idx, rng)

    with ThreadPoolExecutor(max_workers=max(num_workers, 1)) as pool:
        inflight = {}
        horizon = min(n_items, max(lookahead, 1))
        for i in range(horizon):
            inflight[i] = pool.submit(fetch, i)
        next_submit = horizon
        for i in range(n_items):
            out = inflight.pop(i).result()
            if next_submit < n_items:
                inflight[next_submit] = pool.submit(fetch, next_submit)
                next_submit += 1
            yield i, out


def _collate(samples) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    clips = np.stack([s[0] for s in samples])
    keys = samples[0][1].keys()
    infos = {k: np.stack([np.asarray(s[1][k]) for s in samples]) for k in keys}
    return clips, infos


class ClipLoader:
    def __init__(
        self,
        dataset: ClipDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        rank: int = 0,
        world: int = 1,
        lookahead: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.rank = rank
        self.world = world
        self.lookahead = max(lookahead, 1)

    def epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(np.random.SeedSequence([self.seed, epoch]))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        # pad so every host sees the same number of items (torch
        # DistributedSampler semantics), then take this host's stride.
        if self.world > 1:
            pad = (-len(order)) % self.world
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[self.rank :: self.world]
        return order

    def steps_per_epoch(self, epoch: int = 0) -> int:
        n = len(self.epoch_indices(epoch))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def take_one(
        self, epoch: int
    ) -> Optional[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
        """Fetch ONE collated batch synchronously — no worker pool, no
        lookahead. For occasional out-of-band consumers (the VIS_MASK
        epoch-end dump): abandoning an ``epoch()`` generator after one
        batch would block on — and then discard — its whole in-flight
        lookahead of speculative decodes at executor shutdown."""
        order = self.epoch_indices(epoch)
        if len(order) == 0:
            return None
        batch = []
        for i in range(min(self.batch_size, len(order))):
            idx = int(order[i])
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, idx])
            )
            batch.append(self.dataset.get(idx, rng))
        return _collate(batch)

    def epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, Dict[str, np.ndarray]]]:
        order = self.epoch_indices(epoch)
        if self.drop_last:
            order = order[: (len(order) // self.batch_size) * self.batch_size]
        if len(order) == 0:
            return

        def fetch(i):
            idx = int(order[i])
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch, idx])
            )
            return self.dataset.get(idx, rng)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            inflight = {}
            horizon = min(
                len(order), self.lookahead * self.batch_size + self.batch_size
            )
            for i in range(horizon):
                inflight[i] = pool.submit(fetch, i)
            next_submit = horizon
            batch = []
            for i in range(len(order)):
                batch.append(inflight.pop(i).result())
                if next_submit < len(order):
                    inflight[next_submit] = pool.submit(fetch, next_submit)
                    next_submit += 1
                if len(batch) == self.batch_size:
                    yield _collate(batch)
                    batch = []
            if batch and not self.drop_last:
                yield _collate(batch)
