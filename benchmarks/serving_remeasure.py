"""Re-measure the 1M serving rows with the two coherent executor modes.

VERDICT round-2 weak #7: the previous serving number dispatched the full
fused step but resolved only (scores, indices).  The executor now has two
coherent configurations (`query/executor.py`); this measures both on the
default 1M exact-rescore engine and replaces `serving_executor_1M`.

Usage (TPU): python benchmarks/serving_remeasure.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, timed


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
    emb_f32 = np.asarray(index.emb, dtype=np.float32)
    index.emb = emb_f32.astype(ml_dtypes.bfloat16)
    with timed("engine init"):
        engine = QueryEngine(index, graph, ell_max_degree=8, exact_rescore=32)
    rng = np.random.default_rng(7)
    # Micro-batch size is the serving throughput lever: every dispatch pays
    # the ~6 ms relay floor (results.json dispatch_floor_fit), larger
    # micro-batches amortize it.  This script is the CLOSED-LOOP backlog
    # measure (every request pre-submitted); per-request latency here is
    # dominated by standing-queue delay BY CONSTRUCTION — see
    # serving_openloop.py for the arrival-rate sweep that separates
    # queueing from service (round-5 VERDICT next-1).
    serve_b = int(os.environ.get("SERVE_B", 1024))
    n_req = int(os.environ.get("SERVE_N", 8192))
    queries = rng.standard_normal((n_req, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    np.asarray(jnp.sum(engine.d_emb[:, -1].astype(jnp.float32)))  # residency

    serving = {"micro_batch": serve_b, "n_requests": n_req}
    for mode in ("retrieval", "full"):
        ex = BatchedExecutor(engine, batch_size=serve_b, top_k=10, mode=mode)
        ex.submit(queries[0]).result(timeout=600)  # warm/compile
        submit_t = np.zeros(len(queries))
        t0 = time.time()
        futs = []
        for i, q in enumerate(queries):
            submit_t[i] = time.monotonic()
            futs.append(ex.submit(q))
        _ = [f.result(timeout=600) for f in futs]
        rps = len(queries) / (time.time() - t0)
        # resolve_time is the resolver's per-batch monotonic stamp.
        lat_ms = np.array(
            [(f.resolve_time - s) * 1e3 for f, s in zip(futs, submit_t)]
        )
        ex.shutdown()
        p50, p99 = np.percentile(lat_ms, [50, 99])
        log(f"[serving/{mode}] {rps:.0f} single-query req/s, "
            f"p50 {p50:.1f} ms, p99 {p99:.1f} ms")
        serving[f"{mode}_requests_per_s"] = round(rps, 1)
        serving[f"{mode}_latency_ms_p50"] = round(float(p50), 2)
        serving[f"{mode}_latency_ms_p99"] = round(float(p99), 2)
    serving["note"] = (
        "CLOSED-LOOP: all requests pre-submitted, so latency ~= standing "
        "backlog drain time by construction (not service latency — see "
        "serving_openloop_1M).  retrieval mode returns (scores, indices) "
        "from a retrieval-only device step; full mode returns ServedResult "
        "(relevance, combined, expansion) from the complete fused step."
    )

    print(json.dumps(serving))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["serving_executor_1M"] = serving
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
