"""Batched data loader with threaded decode + prefetch.

TPU-oriented replacement for torch DataLoader + worker processes
(reference datasets/*.py use num_workers up to 36): decode with a thread
pool (PIL/numpy release the GIL for the heavy parts), assemble contiguous
NHWC batches, and prefetch a bounded queue of ready batches so the host
keeps the device fed. drop_last semantics are implicit: batches are always
full (the sampler is an infinite index stream).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from duodiff_tpu.data.sampler import ResumableSeedableSampler

_ASSEMBLER = None
_ASSEMBLER_TRIED = False


def _native_assembler():
    global _ASSEMBLER, _ASSEMBLER_TRIED
    if not _ASSEMBLER_TRIED:
        _ASSEMBLER_TRIED = True
        try:
            from duodiff_tpu.data._native import get_assembler

            _ASSEMBLER = get_assembler()
        except Exception:
            _ASSEMBLER = None
    return _ASSEMBLER


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: ResumableSeedableSampler,
        num_workers: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._pool: Optional[ThreadPoolExecutor] = None

    def _fetch_batch(self, indices: np.ndarray) -> dict:
        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        items = list(self._pool.map(self.dataset.__getitem__, indices))
        labels = np.asarray([it[1] for it in items], dtype=np.int32)
        images = [np.ascontiguousarray(it[0]) for it in items]
        scale = float(getattr(self.dataset, "scale", 1.0 / 255.0))
        offset = float(getattr(self.dataset, "offset", 0.0))
        out = np.empty((len(images),) + images[0].shape, np.float32)
        assembler = _native_assembler()
        if assembler is not None and images[0].dtype == np.uint8:
            # fused uint8 -> scale/offset -> contiguous NHWC float32 batch in
            # one native pass (duodiff_tpu/data/_native)
            assembler(images, scale, offset, out,
                      n_threads=min(self.num_workers, 8))
        elif images[0].dtype == np.float32:
            # float items (tensor-mode-resized datasets): stack straight
            # into the output buffer and scale in place — no intermediate
            # (B, H, W, C) copy (the review-flagged double allocation)
            np.stack(images, out=out)
            if scale != 1.0:
                out *= scale
            if offset != 0.0:
                out += offset
        else:
            # no native lib: uint8 -> float32 via one temporary
            np.multiply(np.stack(images), scale, out=out, casting="unsafe")
            out += offset
        return {"image": out, "label": labels}

    def next_batch(self) -> dict:
        """Synchronously fetch the next batch (advances the sampler state)."""
        return self._fetch_batch(self.sampler.next_indices(self.batch_size))

    def prefetching_iterator(self) -> Iterator[dict]:
        """Background-producer iterator that overlaps host decode with device
        compute. Checkpoint-exact: each queued batch carries the sampler
        state *after* it was drawn, and get_state() reports the state of the
        last batch actually consumed — so a resume replays exactly the
        batches the training loop never saw, even though the producer runs
        ahead (the reference's torch loader has the same
        producer-runs-ahead issue and solves nothing; SURVEY.md §5)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            while not stop.is_set():
                batch = self.next_batch()
                state = self.sampler.get_state()
                while not stop.is_set():
                    try:
                        q.put((batch, state), timeout=0.5)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(
            target=producer, daemon=True, name="duodiff-loader-producer"
        )
        thread.start()
        try:
            while True:
                batch, state = q.get()
                self._consumed_state = state
                yield batch
        finally:
            # Runs on generator .close() / GC. The producer checks `stop`
            # both around the fetch and inside the bounded put, so it exits
            # within one put-timeout even when the queue is full; join so
            # callers (Trainer.train, tests) observe a thread-clean state.
            stop.set()
            thread.join(timeout=5.0)

    def __iter__(self) -> Iterator[dict]:
        return self.prefetching_iterator()

    def get_state(self) -> dict:
        consumed = getattr(self, "_consumed_state", None)
        return consumed if consumed is not None else self.sampler.get_state()

    def set_state(self, state: dict) -> None:
        self.sampler.set_state(state)
        self._consumed_state = None
