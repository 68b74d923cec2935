"""BatchedExecutor — host-side serving loop.

The reference serves one query per call (`EmbeddingRAGSystem.process_query`).
TPU throughput needs batching: this executor accumulates concurrent requests
into fixed-size device batches (padding the tail), dispatches an ASYNC device
step, and resolves per-request futures — the host/device pipeline-overlap
component from SURVEY §7.4's hard-parts list.

Two coherent serving modes (what is dispatched == what the future returns):

* ``mode="retrieval"`` (default): dispatches the engine's retrieval-ONLY
  step (`retrieve_batch_device` — top-k selection + configured exact
  rescore, no relevance metrics, no expansion).  Futures resolve to
  ``(scores [k], indices [k])``.  Nothing is computed that gets dropped.
* ``mode="full"``: dispatches the complete fused step
  (`query_batch_device` — retrieval + isRelevant metrics + expansion +
  weighted fusion) and futures resolve to a per-request `ServedResult`
  carrying ALL of it.  One combined `jax.device_get` per batch either way
  (the tunneled-relay round trip per readback dominates serving — NOTES.md).

Usage:
    ex = BatchedExecutor(engine, batch_size=256, max_wait_ms=2.0)
    fut = ex.submit(query_embedding)          # thread-safe
    scores, indices = fut.result()
    ex.shutdown()
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class ServedResult:
    """Per-request slice of the full fused step (mode="full")."""

    top_scores: np.ndarray  # [k] cosine similarity
    top_indices: np.ndarray  # [k] index rows
    relevance: np.ndarray  # [k] isRelevant scores
    combined: np.ndarray  # [k] 0.7*rel + 0.3*sim
    expanded_nodes: np.ndarray  # [max_expanded] graph node ids (-1 pad)
    expanded_count: int
    expanded_relevance: np.ndarray  # [max_expanded]


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
        mode: str = "retrieval",
    ):
        if mode not in ("retrieval", "full"):
            raise ValueError(f"mode must be 'retrieval' or 'full', got {mode!r}")
        self.engine = engine
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        self.top_k = top_k
        self.expansion_depth = expansion_depth
        self.mode = mode
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
        """Enqueue one query embedding.  Resolves to (scores [k],
        indices [k]) in retrieval mode, or a `ServedResult` in full mode."""
        fut: Future = Future()
        self._queue.put((np.asarray(query_embedding, np.float32), fut))
        return fut

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        """Adaptive micro-batching with a TOTAL latency deadline.

        Round-4 fix: the old loop gave EVERY empty slot its own
        `max_wait_ms` timeout, so a trickling queue could hold a batch open
        for batch_size * max_wait_ms (512 ms at 256 x 2 ms) — a p99 cliff.
        Now: one bulk drain of everything already queued (get_nowait — no
        timeout syscalls on the hot path), then a single micro-batch window
        of `max_wait_ms` TOTAL from the first request, after which the batch
        ships however full it is (the device step pads to batch_size, so
        partial batches cost latency, never a recompile)."""
        import time as _time

        items: List[Tuple[np.ndarray, Future]] = []
        try:
            items.append(self._queue.get(timeout=0.1))
        except queue.Empty:
            return items
        while len(items) < self.batch_size:
            try:
                items.append(self._queue.get_nowait())
            except queue.Empty:
                break
        deadline = _time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        # Backpressure fill (round 4): when the inflight pipeline is full,
        # dispatching now would only block on `_inflight.put` — the device
        # step pads every batch to batch_size, so shipping a partial batch
        # under saturation burns a full-size step on a fraction of the
        # requests (measured: B=1024 micro-batches at a ~4k req/s arrival
        # shipped ~15%-full and HALVED throughput vs B=256).  Keep absorbing
        # the queue until the batch is full or a pipeline slot frees; adds
        # zero latency when the device is idle (condition is False).
        while len(items) < self.batch_size and self._inflight.full():
            try:
                items.append(self._queue.get(timeout=0.001))
            except queue.Empty:
                pass
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
                if self.mode == "retrieval":
                    out = self.engine.retrieve_batch_device(
                        batch / norms, top_k=self.top_k
                    )
                else:
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
                # One combined host sync for the WHOLE payload: separate
                # np.asarray calls pay the tunneled-relay round-trip latency
                # per array, which dominates serving throughput (the
                # readback, not compute, is the bottleneck through the
                # relay).
                import jax

                if self.mode == "retrieval":
                    top_scores, top_indices = jax.device_get((out[0], out[1]))
                    for i, (_, fut) in enumerate(items):
                        fut.set_result((top_scores[i], top_indices[i]))
                        self.requests_served += 1
                else:
                    (v, idx, rel, comb, exp, exp_n, exp_rel) = jax.device_get(
                        tuple(out[:7])
                    )
                    for i, (_, fut) in enumerate(items):
                        fut.set_result(ServedResult(
                            top_scores=v[i], top_indices=idx[i],
                            relevance=rel[i], combined=comb[i],
                            expanded_nodes=exp[i],
                            expanded_count=int(exp_n[i]),
                            expanded_relevance=exp_rel[i],
                        ))
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
