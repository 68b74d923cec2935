"""Open-loop serving load harness (round-5 VERDICT next-1).

The round-4 closed-loop harness (serving_remeasure.py) pre-submitted 8,192
futures and measured ~1 s p50 — queueing delay of a deep standing backlog,
not service latency.  This harness drives the executor the way a real
front-end would: Poisson arrivals at a fixed offered rate, latency measured
per request from its SCHEDULED arrival time to the resolver's batch stamp
(`SlotFuture.resolve_time` — no per-request callbacks on the hot path), so
submitter lateness counts against us honestly.

For each offered rate it reports:
  * achieved req/s over the full span (submission start -> last resolve)
  * p50/p95/p99 latency (scheduled arrival -> resolve)
  * mean dispatched batch fill (how adaptive batching behaved)

plus one saturation row (all requests submitted at once via submit_many)
giving the executor's ceiling throughput with queueing excluded from the
latency claim.

Usage (TPU): python benchmarks/serving_openloop.py
Env: RATES="2000,5000,10000,20000" DURATION_S=3 SERVE_B=1024 MODE=retrieval
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, timed


def run_rate(ex, queries: np.ndarray, rate: float, duration_s: float):
    """Offer `rate` req/s of Poisson traffic for `duration_s`; returns stats."""
    rng = np.random.default_rng(int(rate))
    n = int(rate * duration_s)
    gaps = rng.exponential(1.0 / rate, size=n)
    sched = np.cumsum(gaps)
    futs = [None] * n
    t0 = time.monotonic()
    i = 0
    while i < n:
        now = time.monotonic() - t0
        j = i
        while j < n and sched[j] <= now:
            j += 1
        if j > i:
            block = ex.submit_many(queries[i % len(queries):][: j - i])
            futs[i:i + len(block)] = block
            i += len(block)
        else:
            time.sleep(min(0.0005, max(0.0, sched[i] - now)))
    for f in futs:
        f.result(timeout=600)
    t_end = time.monotonic()
    lat_ms = np.array(
        [(f.resolve_time - (t0 + s)) * 1e3 for f, s in zip(futs, sched)]
    )
    p50, p95, p99 = np.percentile(lat_ms, [50, 95, 99])
    achieved = n / (t_end - t0)
    return {
        "offered_rps": rate,
        "achieved_rps": round(achieved, 1),
        "latency_ms_p50": round(float(p50), 2),
        "latency_ms_p95": round(float(p95), 2),
        "latency_ms_p99": round(float(p99), 2),
        "n_requests": n,
    }


def run_saturation(ex, queries: np.ndarray, n: int):
    """Ceiling throughput: submit everything at once, time the drain."""
    t0 = time.monotonic()
    futs = []
    for s in range(0, n, 4096):
        futs.extend(ex.submit_many(queries[s % len(queries):][: min(4096, n - s)]))
    for f in futs:
        f.result(timeout=600)
    dt = time.monotonic() - t0
    return {"n_requests": n, "requests_per_s": round(n / dt, 1)}


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from __graft_entry__ import _synthetic_setup
    from hcrag_tpu.query.engine import QueryEngine
    from hcrag_tpu.query.executor import BatchedExecutor
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N, D = 1_000_000, 384
    with timed("synthetic setup"):
        index, graph = _synthetic_setup(N, D, graph_degree=4)
    eng_cfg = os.environ.get("ENGINE", "bf16")
    if eng_cfg == "int8f32":
        # Round-5b headline kernel (fused int8 select + f32 exact rescore,
        # lane_t=1): ~2.8x the bf16 per-sub-batch service rate.
        with timed("engine init"):
            engine = QueryEngine(
                index, graph, ell_max_degree=8, quantize_int8=True,
                int8_rescore=32, int8_f32_rescore=True, select_lane_t=1,
            )
    else:
        index.emb = np.asarray(index.emb, np.float32).astype(ml_dtypes.bfloat16)
        with timed("engine init"):
            engine = QueryEngine(
                index, graph, ell_max_degree=8, exact_rescore=32
            )

    rng = np.random.default_rng(7)
    queries = rng.standard_normal((65536, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    for a in engine._bank().values():  # residency (NOTES round-2)
        if hasattr(a, "dtype") and a.ndim >= 1:
            np.asarray(jnp.sum(a.reshape(-1)[-8:].astype(jnp.float32)))

    serve_b = int(os.environ.get("SERVE_B", 1024))
    sizes = tuple(
        int(x) for x in os.environ.get("SIZES", "128,256,1024").split(",")
    )
    mode = os.environ.get("MODE", "retrieval")
    rates = [
        float(x)
        for x in os.environ.get("RATES", "2000,5000,10000,20000").split(",")
    ]
    duration = float(os.environ.get("DURATION_S", 3))
    depth = int(os.environ.get("PIPE_DEPTH", 3))

    row = {
        "micro_batch_max": serve_b,
        "dispatch_sizes": list(sizes),
        "pipeline_depth": depth,
        "mode": mode,
        "rates": [],
    }
    ex = BatchedExecutor(
        engine, batch_size=serve_b, top_k=10, mode=mode,
        batch_sizes=sizes, pipeline_depth=depth, max_wait_ms=2.0,
    )
    # Warm every dispatch size (each is one jit entry).
    for s in sizes:
        fs = ex.submit_many(queries[:s])
        fs[-1].result(timeout=600)
        log(f"warmed dispatch size {s}")
    for rate in rates:
        stats = run_rate(ex, queries, rate, duration)
        fills = ex.requests_served / max(1, ex.batches_dispatched)
        stats["mean_batch_fill_so_far"] = round(fills, 1)
        log(f"[openloop/{mode}] offered {rate:.0f} -> "
            f"achieved {stats['achieved_rps']:.0f} req/s, "
            f"p50 {stats['latency_ms_p50']:.1f} ms, "
            f"p99 {stats['latency_ms_p99']:.1f} ms")
        row["rates"].append(stats)
        time.sleep(0.5)  # drain between rates
    row["saturation"] = run_saturation(ex, queries, int(os.environ.get("SAT_N", 65536)))
    log(f"[openloop/{mode}] saturation {row['saturation']['requests_per_s']:.0f} req/s")
    ex.shutdown()
    row["note"] = (
        "Open-loop Poisson arrivals; latency = scheduled arrival -> batch "
        "resolve stamp (queueing + batching + service, submitter lateness "
        "included).  Saturation row = all-at-once backlog drain (throughput "
        "ceiling; its queueing delay is excluded from latency claims)."
    )

    print(json.dumps(row))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["serving_openloop_1M"] = row
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
