"""Consolidated TPU benchmark session.

Runs every benchmark configuration in ONE process (device handshakes and
transfers are expensive through the tunnel), writing incremental results to
stderr and a JSON summary at the end.

Configs (BASELINE.json):
  A. AdventureWorks parity: real 585-vector index, exact recall vs reference
  B. 100k synthetic, XLA top-k path
  C. 1M synthetic, streaming top-k path (the headline config)
  D. 1M synthetic, Pallas fused kernel path
  E. index build time (native ingestion path)

Usage: python benchmarks/session.py [--skip a,b,...] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(label):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            return self

        def __exit__(self, *exc):
            self.dt = time.time() - self.t0
            log(f"[{label}] {self.dt:.2f}s")

    return _T()


def throughput(engine, queries, *, top_k=10, depth=1, steps=20, label=""):
    import jax
    import jax.numpy as jnp

    dq = jnp.asarray(queries)
    with timed(f"{label} warmup(compile)"):
        warm = engine.query_batch_device(dq, top_k=top_k, expansion_depth=depth)
        jax.block_until_ready(warm)
    t0 = time.time()
    outs = [
        engine.query_batch_device(dq, top_k=top_k, expansion_depth=depth)
        for _ in range(steps)
    ]
    jax.block_until_ready(outs)
    # TPU executes in-order: reading back the last output forces completion
    # of every dispatched step even if block_until_ready under-blocks on
    # this experimental backend (see NOTES.md).
    _ = np.asarray(outs[-1][0])
    dt = time.time() - t0
    qps = steps * queries.shape[0] / dt
    log(f"[{label}] {1000 * dt / steps:.1f} ms/batch -> {qps:.0f} QPS")
    return qps


def recall_gate(engine, emb_f32, queries, top_k=10, n_check=8, depth=1):
    ref = np.argsort(-(queries[:n_check] @ emb_f32.T), axis=1, kind="stable")[
        :, :top_k
    ]
    res = engine.query_batch(queries, top_k=top_k, expansion_depth=depth)
    hits = sum(
        len(set(res.top_indices[i]) & set(ref[i])) for i in range(n_check)
    )
    return hits / (n_check * top_k)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--skip", default="")
    parser.add_argument("--out", default="benchmarks/results.json")
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--extended", action="store_true",
                        help="also run int8 / deep-expansion / serving configs")
    args = parser.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax

    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    results = {}
    rng = np.random.default_rng(7)

    from hcrag_tpu.query.engine import QueryEngine

    # --- A: AdventureWorks parity ------------------------------------------
    if "a" not in skip and os.path.exists(
        "/root/reference/experiments/knowledge_graph_embeddings.pkl"
    ):
        from hcrag_tpu.ingest.adventureworks import build_adventureworks

        with timed("A build"):
            bundle = build_adventureworks(
                "/root/reference/data",
                reference_pickle=(
                    "/root/reference/experiments/knowledge_graph_embeddings.pkl"
                ),
            )
        engine = QueryEngine(bundle.index, bundle.graph)
        emb = np.asarray(bundle.index.emb, np.float32)
        q = emb[rng.integers(0, 585, 64)]
        recall = recall_gate(engine, emb, q, n_check=64)
        qps = throughput(engine, q, steps=args.steps, label="A adventureworks")
        results["adventureworks"] = {"recall_at_10": recall, "qps": qps}

    # --- synthetic setups ----------------------------------------------------
    from __graft_entry__ import _synthetic_setup

    queries = rng.standard_normal((args.batch, 384)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    for key, n in (("b", 100_000), ("c", 1_000_000)):
        if key in skip:
            continue
        with timed(f"{key} gen n={n}"):
            index, graph = _synthetic_setup(n, 384, graph_degree=4)
            # index.emb stays f32: the engine downcasts its own bf16
            # selection bank and keeps the f32 rows for candidate rescoring.
            emb_f32 = np.asarray(index.emb, np.float32)
        with timed(f"{key} engine init"):
            # Default config matches bench.py: bf16 selection bank + f32
            # exact rescore of the oversampled merge — exact-match recall
            # at bf16 speed (round-1 weak item 5: the 100k row previously
            # recorded the pre-rescore 0.9875 config).
            engine = QueryEngine(index, graph, ell_max_degree=8,
                                 exact_rescore=32)
        recall = recall_gate(engine, emb_f32, queries)
        log(f"[{key}] recall@10 = {recall:.4f}")
        qps = throughput(
            engine, queries, steps=args.steps, label=f"{key} n={n}"
        )
        results[f"synthetic_{n}"] = {"recall_at_10": recall, "qps": qps}

        if key == "c" and "d" not in skip:
            # Config d measures the PLAIN Pallas path (no rescore): give it
            # the bf16 bank directly — an f32 kernel bank at B=1024 blows
            # the 16 MB scoped-VMEM limit (HIGHEST-precision decomposition
            # temps), and bf16 is this config's round-1 definition anyway.
            import copy

            import ml_dtypes

            index_bf16 = copy.copy(index)
            index_bf16.emb = emb_f32.astype(ml_dtypes.bfloat16)
            with timed("d pallas engine init"):
                engine_p = QueryEngine(
                    index_bf16, graph, ell_max_degree=8, use_pallas=True
                )
            recall_p = recall_gate(engine_p, emb_f32, queries)
            log(f"[d pallas] recall@10 = {recall_p:.4f}")
            qps_p = throughput(
                engine_p, queries, steps=args.steps, label="d pallas n=1M"
            )
            results["synthetic_1M_pallas"] = {
                "recall_at_10": recall_p, "qps": qps_p,
            }

    # --- extended configs (int8, deep expansion, serving) -------------------
    if args.extended and "c" not in skip:
        with timed("int8 engine init"):
            engine_i8 = QueryEngine(
                index, graph, ell_max_degree=8, quantize_int8=True
            )
        recall_i8 = recall_gate(engine_i8, emb_f32, queries)
        qps_i8 = throughput(
            engine_i8, queries, steps=args.steps, label="int8 n=1M"
        )
        results["synthetic_1M_int8"] = {
            "recall_at_10": recall_i8, "qps": qps_i8,
        }

        q64 = queries[:64]
        with timed("config4 top100 depth3"):
            qps_c4 = throughput(
                engine, q64, top_k=100, depth=3, steps=5,
                label="config4 n=1M top100 d3",
            )
        results["synthetic_1M_top100_depth3"] = {"qps": qps_c4, "batch": 64}

        from hcrag_tpu.query.executor import BatchedExecutor

        # Both COHERENT serving modes (executor dispatches exactly what the
        # futures return): retrieval-only (scores+indices via the cheap
        # retrieve-only device step) and full (complete fused step, futures
        # carry relevance/combined/expansion per request).
        serving = {}
        for mode in ("retrieval", "full"):
            ex = BatchedExecutor(engine, batch_size=256, top_k=10, mode=mode)
            f = ex.submit(queries[0])
            f.result(timeout=600)
            t0 = time.time()
            futs = [ex.submit(q) for q in queries[:2048]]
            _ = [f.result(timeout=600) for f in futs]
            rps = 2048 / (time.time() - t0)
            ex.shutdown()
            log(f"[serving/{mode}] {rps:.0f} single-query req/s")
            serving[f"{mode}_requests_per_s"] = rps
        serving["note"] = (
            "retrieval mode returns (scores, indices) from a retrieval-only "
            "device step; full mode returns ServedResult (relevance, "
            "combined, expansion) from the complete fused step"
        )
        results["serving_executor_1M"] = serving

    # --- E: index build time -------------------------------------------------
    if "e" not in skip:
        from hcrag_tpu.ingest.adventureworks import build_adventureworks

        t0 = time.time()
        bundle = build_adventureworks("/root/reference/data")
        results["index_build_s"] = time.time() - t0
        log(f"[E] AdventureWorks full build: {results['index_build_s']:.2f}s")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # Merge over the existing file: partial runs (--skip ...) must not drop
    # the configs they skipped.
    merged = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                merged = json.load(f)
        except (OSError, json.JSONDecodeError):
            merged = {}
    merged.update(results)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    log(json.dumps(results, indent=2))

    # headline line (same schema as bench.py)
    headline = results.get("synthetic_1000000", {}).get("qps") or results.get(
        "synthetic_100000", {}
    ).get("qps", 0)
    print(
        json.dumps(
            {
                "metric": "queries_per_sec_per_chip",
                "value": round(headline, 1),
                "unit": "qps",
                "vs_baseline": round(headline / 10000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
