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
from typing import List, Tuple

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
        pipeline_depth: int = 4,
    ):
        self.engine = engine
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.top_k = top_k
        self.expansion_depth = expansion_depth
        self._queue: "queue.Queue" = queue.Queue()
        # Dispatched-but-unresolved device batches: the dispatcher keeps
        # issuing async device calls while the resolver blocks on readbacks,
        # overlapping host sync with device compute (bounded depth).
        self._inflight: "queue.Queue" = queue.Queue(maxsize=pipeline_depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._thread.start()
        self._resolver.start()
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
        """Dispatcher: batch requests and issue ASYNC device calls."""
        while not self._stop.is_set():
            items = self._collect()
            if not items:
                continue
            dim = items[0][0].shape[-1]
            batch = np.zeros((self.batch_size, dim), np.float32)
            for i, (emb, _) in enumerate(items):
                batch[i] = emb
            norms = np.maximum(
                np.linalg.norm(batch, axis=1, keepdims=True), 1e-12
            )
            try:
                out = self.engine.query_batch_device(
                    batch / norms,
                    top_k=self.top_k,
                    expansion_depth=self.expansion_depth,
                )
                self.batches_dispatched += 1
                self._inflight.put((out, items))
            except Exception as e:  # dispatch/compile failure
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _resolve_loop(self) -> None:
        """Resolver: block on device readbacks while dispatch continues."""
        while not self._stop.is_set() or not self._inflight.empty():
            try:
                out, items = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                # One combined host sync: separate np.asarray calls pay the
                # tunneled-relay round-trip latency twice per batch, which
                # dominates serving throughput (the readback, not compute,
                # is the bottleneck through the relay).
                import jax

                top_scores, top_indices = jax.device_get((out[0], out[1]))
                for i, (_, fut) in enumerate(items):
                    fut.set_result((top_scores[i], top_indices[i]))
                    self.requests_served += 1
            except Exception as e:
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)

    def shutdown(self) -> None:
        # Let in-flight batches drain before stopping the resolver.
        deadline = 10.0
        import time as _time

        t0 = _time.time()
        while not self._inflight.empty() and _time.time() - t0 < deadline:
            _time.sleep(0.05)
        self._stop.set()
        self._thread.join(timeout=5)
        self._resolver.join(timeout=5)
