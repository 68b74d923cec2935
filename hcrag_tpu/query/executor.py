"""BatchedExecutor — host-side serving loop.

The reference serves one query per call (`EmbeddingRAGSystem.process_query`).
TPU throughput needs batching: this executor accumulates concurrent requests
into fixed-size device batches (padding the tail), dispatches the engine's
async `query_batch_device` step, and resolves per-request futures — the
host/device pipeline-overlap component from SURVEY §7.4's hard-parts list.

Usage:
    ex = BatchedExecutor(engine, batch_size=256, max_wait_ms=2.0)
    fut = ex.submit(query_embedding)          # thread-safe
    scores, indices = fut.result()
    ex.shutdown()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


class BatchedExecutor:
    def __init__(
        self,
        engine,
        *,
        batch_size: int = 256,
        max_wait_ms: float = 2.0,
        top_k: int = 10,
        expansion_depth: int = 1,
    ):
        self.engine = engine
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.top_k = top_k
        self.expansion_depth = expansion_depth
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.batches_dispatched = 0
        self.requests_served = 0

    def submit(self, query_embedding: np.ndarray) -> Future:
        """Enqueue one query embedding; resolves to (scores [k], indices [k])."""
        fut: Future = Future()
        self._queue.put((np.asarray(query_embedding, np.float32), fut))
        return fut

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        items: List[Tuple[np.ndarray, Future]] = []
        try:
            items.append(self._queue.get(timeout=0.1))
        except queue.Empty:
            return items
        deadline = self.max_wait_s
        while len(items) < self.batch_size:
            try:
                items.append(self._queue.get(timeout=deadline))
            except queue.Empty:
                break
        return items

    def _loop(self) -> None:
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            b = len(items)
            dim = items[0][0].shape[-1]
            batch = np.zeros((self.batch_size, dim), np.float32)
            for i, (emb, _) in enumerate(items):
                batch[i] = emb
            try:
                res = self.engine.query_batch(
                    batch,
                    top_k=self.top_k,
                    expansion_depth=self.expansion_depth,
                )
                self.batches_dispatched += 1
                for i, (_, fut) in enumerate(items):
                    fut.set_result(
                        (res.top_scores[i], res.top_indices[i])
                    )
                    self.requests_served += 1
            except Exception as e:  # propagate to every waiter
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5)
