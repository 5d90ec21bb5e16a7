"""Bucket-aware batching and an async prefetching loader.

Replaces torch DataLoader + random sampling (train_full.py:126-143) with a
TPU-shaped pipeline:

- ``BucketBatchSampler`` groups samples by aspect-ratio bucket so every batch
  is one static (H, W) shape -> one XLA program per *used* bucket, no
  recompile storm (SURVEY.md §7 hard part 2);
- partial batches are padded by wrapping within the bucket and flagged via
  ``batch_mask`` so eval paths can drop the duplicates;
- ``DataLoader`` decodes/resizes on a thread pool (PIL releases the GIL) and
  prefetches collated numpy batches a queue ahead of the accelerator.
"""

from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


class BucketBatchSampler:
    """Yields fixed-size lists of dataset indices, all from one bucket.

    Without bucketing every sample shares one shape, so this degrades to a
    plain batch sampler.  The final partial batch of each bucket is padded by
    re-sampling indices from the same bucket (mask marks the padding).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: Optional[int] = 0,
                 indices: Optional[Sequence[int]] = None,
                 pad_multiple: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        # device batch = batch_size rounded up to pad_multiple (TPU sublane
        # packing: sub-8 batches run ~3x worse per pixel on v5e).  Each step
        # still consumes batch_size REAL samples; the pad rows are wrapped
        # duplicates of the batch's own chunk, so for exact multiples the
        # padded batch mean equals the unpadded one (gradient-neutral).
        if pad_multiple:
            self.device_batch_size = -(-batch_size // pad_multiple) * pad_multiple
        else:
            self.device_batch_size = batch_size
        self.shuffle = shuffle
        # Shuffle order is a pure function of (seed, epoch) — NOT of how many
        # epochs were iterated before — so a resumed run replays the exact
        # batch order of the epoch it was interrupted in (EpochLoop calls
        # set_epoch, then skips the already-trained batches via
        # DataLoader.skip_next for an exact data-position resume).
        self._seed = 0 if seed is None else int(seed)
        self._epoch = 0
        self.indices = list(indices) if indices is not None else list(
            range(len(dataset)))

        self.bucket_groups: Dict[tuple, List[int]] = {}
        for i in self.indices:
            bucket = dataset.bucket_of(i) if hasattr(dataset, "bucket_of") else None
            self.bucket_groups.setdefault(bucket or ("fixed",), []).append(i)

    def __len__(self) -> int:
        return sum(-(-len(g) // self.batch_size)
                   for g in self.bucket_groups.values())

    def set_epoch(self, epoch: int) -> None:
        """Pin this epoch's shuffle stream (deterministic, resumable)."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[tuple]:
        """Yields (indices, mask) with len(indices) == device_batch_size."""
        # int arithmetic, not a (seed, epoch) tuple: int hashing is stable
        # across interpreter runs, str/tuple-of-str hashing is not
        rng = random.Random(self._seed * 1_000_003 + self._epoch)
        batches = []
        for group in self.bucket_groups.values():
            order = list(group)
            if self.shuffle:
                rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                chunk = order[start:start + self.batch_size]
                real = len(chunk)
                mask = [True] * real
                # deterministic wrap-around padding FROM THE CHUNK ITSELF:
                # duplicating the batch's own rows keeps the padded batch
                # mean equal to the real mean when the pad count is a
                # multiple of the real count, and random padding would
                # re-roll every epoch and add pure noise to the epoch val
                # loss used for best-checkpoint selection
                fill = 0
                while len(chunk) < self.device_batch_size:
                    chunk.append(chunk[fill % real])
                    fill += 1
                    mask.append(False)
                batches.append((chunk, mask))
        if self.shuffle:
            rng.shuffle(batches)
        return iter(batches)


def _collate(items: List[dict], mask: List[bool]) -> Dict[str, np.ndarray]:
    batch: Dict[str, np.ndarray] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if np.isscalar(vals[0]) or np.asarray(vals[0]).ndim == 0:
            batch[key] = np.asarray(vals)
        else:
            batch[key] = np.stack(vals)
    batch["batch_mask"] = np.asarray(mask, dtype=bool)
    return batch


class DataLoader:
    """Threaded prefetching loader yielding collated numpy batches.

    Multi-host: every process constructs the IDENTICAL global batch sequence
    (same indices + same seed -> same sampler decisions, including bucket
    composition and padding), then loads only its ``process_index`` slice of
    each global batch.  This guarantees equal batch counts and matching
    per-step shapes across processes — per-process index sharding cannot
    (bucket composition would diverge and SPMD collectives would deadlock).
    ``batch_size`` is the GLOBAL batch; it must divide by ``process_count``.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, prefetch_factor: int = 2,
                 seed: Optional[int] = 0,
                 indices: Optional[Sequence[int]] = None,
                 process_index: int = 0, process_count: int = 1,
                 pad_multiple: Optional[int] = None):
        if batch_size % max(1, process_count):
            raise ValueError(
                f"process_count {process_count} must divide the global "
                f"batch size {batch_size}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = BucketBatchSampler(dataset, batch_size, shuffle,
                                          seed=seed, indices=indices,
                                          pad_multiple=pad_multiple)
        if self.sampler.device_batch_size % max(1, process_count):
            raise ValueError(
                f"padded device batch {self.sampler.device_batch_size} not "
                f"divisible by process_count {process_count}; adjust "
                f"batch_size or pad_multiple")
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch_factor)
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self._skip_next = 0

    def __len__(self) -> int:
        return len(self.sampler)

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def skip_next(self, n: int) -> None:
        """Drop the first ``n`` batches of the NEXT iteration only (exact
        mid-epoch resume: set_epoch replays the interrupted epoch's order,
        skip_next jumps past the batches already trained).  Skipped batches
        are never decoded — the drop happens at the index level."""
        self._skip_next = int(n)

    def _local_slice(self, indices, mask):
        """(local_indices, local_mask, global_real_count) — the count comes
        from the GLOBAL mask so every process agrees on batch weighting."""
        n_real_global = sum(mask)
        if self.process_count == 1:
            return indices, mask, n_real_global
        per = len(indices) // self.process_count
        lo = self.process_index * per
        return indices[lo:lo + per], mask[lo:lo + per], n_real_global

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        batches = [self._local_slice(idx, mask)
                   for idx, mask in self.sampler]
        if self._skip_next:
            batches = batches[self._skip_next:]
            self._skip_next = 0
        stop = threading.Event()

        def safe_put(item) -> bool:
            # never block forever: the consumer may have exited early
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for indices, mask, n_real_global in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__,
                                              indices))
                        batch = _collate(items, mask)
                        batch["global_real_count"] = np.int64(n_real_global)
                        if not safe_put(batch):
                            return
                safe_put(None)
            except BaseException as e:  # surface in the consumer, don't hang
                safe_put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def train_val_split(n: int, val_fraction: float = 0.1,
                    seed: int = 42) -> tuple:
    """Random 90/10 split (train_full.py:119-124 semantics: val is at least
    one sample)."""
    indices = list(range(n))
    random.Random(seed).shuffle(indices)
    val_size = max(1, int(n * val_fraction))
    return indices[val_size:], indices[:val_size]
