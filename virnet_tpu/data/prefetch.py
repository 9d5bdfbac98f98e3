"""Async host→device input prefetch (double buffering).

The reference overlaps input work with compute via torch DataLoader
worker processes + ``prefetch_factor`` (configs/denoising_syn.json:2-17,
train_denoising_syn.py:125-139).  The TPU-native equivalent is a single
background thread that samples batch N+1 and starts its host→device
transfer (``jax.device_put`` onto the data mesh) while step N runs on
device.  One thread suffices — even on a 1-core host the sampler's hot
path (native packdb / numpy slicing) and the transfer (relay HTTP /
PCIe DMA) both release the GIL, so they overlap the dispatch thread.

Determinism: batches flow through a FIFO queue filled by exactly one
worker thread, so the consumer sees them in the iterator's order; the
per-step RNG key is derived from the *step counter* at dispatch time
(train/loop_denoise.run_step), so the key↔batch pairing is untouched.
``tests/test_prefetch.py`` asserts both (order, and bitwise-equal params
after training with and without the prefetcher).

Usage::

    for batch in DevicePrefetcher(batch_iter, mesh, depth=2):
        trainer.run_step(batch, epoch)   # shard_batch is a no-op here

Batches come out already committed to the mesh's batch sharding, so the
trainer's own ``shard_batch`` call finds nothing to transfer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

from ..train.mesh import shard_batch

_SENTINEL = object()


class DevicePrefetcher:
    """Wraps a batch iterable; yields the same batches in the same order,
    already transferred to ``mesh``'s data sharding, with up to ``depth``
    batches in flight ahead of the consumer."""

    def __init__(self, batch_iter: Iterable, mesh, depth: int = 2,
                 axis: str = "data"):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._iter = iter(batch_iter)
        self._mesh = mesh
        self._axis = axis
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._err: Optional[BaseException] = None
        # worker-side wall per stage, for pipeline diagnostics
        self.stats = {"sample_s": 0.0, "put_s": 0.0, "block_s": 0.0,
                      "batches": 0}
        self._thread = threading.Thread(
            target=self._worker, name="virnet-prefetch", daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- worker

    def _worker(self):
        import time
        st = self.stats
        try:
            while True:
                t0 = time.perf_counter()
                try:
                    batch = next(self._iter)
                except StopIteration:
                    break
                t1 = time.perf_counter()
                dev = shard_batch(self._mesh, batch, axis=self._axis)
                t2 = time.perf_counter()
                while not self._stop.is_set():
                    try:
                        self._q.put(dev, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                t3 = time.perf_counter()
                st["sample_s"] += t1 - t0
                st["put_s"] += t2 - t1
                st["block_s"] += t3 - t2
                st["batches"] += 1
                if self._stop.is_set():
                    return
        except BaseException as exc:   # propagate to the consumer
            self._err = exc
        # sentinel must get through even if the queue is full and the
        # consumer stopped reading — bounded wait, then give up
        while not self._stop.is_set():
            try:
                self._q.put(_SENTINEL, timeout=0.1)
                return
            except queue.Full:
                continue

    # ----------------------------------------------------------- consumer

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        """Stop the worker without draining (e.g. on early loop exit)."""
        self._stop.set()
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
