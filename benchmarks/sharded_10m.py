"""BASELINE target shape: 10M rows sharded over an 8-device mesh.

The driver's north star (BASELINE.md config 5) is "10M nodes sharded on
v5e-8" with exact-match recall@10.  Real multi-chip hardware is not
available in this environment, so this script executes the REAL sharded
engine — row-sharded banks, shard-local selection kernels, ICI all-gather
merge, distributed exact-rescore — on the 8-device virtual CPU mesh, checks
recall@10 against f32 NumPy brute force, and records the per-chip memory
math for the v5e-8 deployment.

Throughput on the CPU mesh is meaningless (one host core emulates 8 chips);
the per-chip QPS story comes from the single-chip TPU bench (`bench.py`),
whose kernels are byte-identical to what each shard runs here.

Usage:
    python benchmarks/sharded_10m.py               # full 10M run (~10 min)
    BENCH10M_N=1000000 python benchmarks/sharded_10m.py   # smaller smoke
    BENCH10M_MODE=int8_residual python benchmarks/sharded_10m.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = Path(__file__).resolve().parent / "results.json"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def brute_force_topk(emb: np.ndarray, q: np.ndarray, k: int) -> np.ndarray:
    """Chunked f32 brute force (the reference kernel, main.py:831-845)."""
    n = emb.shape[0]
    chunk = 1 << 19
    best_v = np.full((q.shape[0], k), -np.inf, np.float32)
    best_i = np.full((q.shape[0], k), -1, np.int64)
    for start in range(0, n, chunk):
        block = emb[start : start + chunk]
        scores = q @ block.T  # rows are pre-normalized
        cat_v = np.concatenate([best_v, scores], axis=1)
        cat_i = np.concatenate(
            [best_i, np.arange(start, start + block.shape[0])[None, :]
             .repeat(q.shape[0], 0)], axis=1,
        )
        # stable: ties resolve to the earlier (lower-index) candidate
        order = np.argsort(-cat_v, axis=1, kind="stable")[:, :k]
        best_v = np.take_along_axis(cat_v, order, axis=1)
        best_i = np.take_along_axis(cat_i, order, axis=1)
    return best_i


def modeled_collective_overhead(
    n_shards: int,
    batch: int,
    merge_m: int,
    single_chip_batch_ms: float,
    link_gbps: float = 45.0,
    hop_latency_us: float = 1.0,
):
    """Explicit ICI latency model for the sharded query step, built from the
    HLO-VERIFIED collective payloads (benchmarks/sharded_traffic.py pins
    them byte-for-byte: candidate merge all-gathers s*B*m*(4+4) bytes,
    distributed rescore all-reduces B*m*4 bytes) times an assumed v5e ICI
    link bandwidth (45 GB/s per direction per link — public spec; real ICI
    is NOT measurable in this environment, so the bandwidth is an input,
    stated in the output).

    Ring cost model: all-gather of per-device block X over s devices moves
    (s-1)*X per link; all-reduce ~2*(s-1)/s of the payload; plus (s-1) hop
    latencies each.  Returns a dict with the per-batch overhead and the
    derived per-chip QPS bound (replacing the old 'per-chip QPS equals the
    single-chip bench' assertion)."""
    ag_block = batch * merge_m * (4 + 4)  # f32 vals + s32 idx per device
    ar_payload = batch * merge_m * 4
    bw = link_gbps * 1e9
    ag_s = (n_shards - 1) * ag_block / bw
    ar_s = 2 * (n_shards - 1) / n_shards * ar_payload / bw
    hops_s = 2 * (n_shards - 1) * hop_latency_us * 1e-6
    overhead_ms = (ag_s + ar_s + hops_s) * 1e3
    step_ms = single_chip_batch_ms + overhead_ms
    return {
        "assumed_ici_link_gbps": link_gbps,
        "allgather_bytes_per_link": (n_shards - 1) * ag_block,
        "allreduce_bytes": ar_payload,
        "modeled_collective_overhead_ms_per_batch": round(overhead_ms, 4),
        "single_chip_batch_ms": round(single_chip_batch_ms, 3),
        "modeled_step_ms_per_batch": round(step_ms, 3),
        "modeled_qps_per_chip_bound": round(batch / step_ms * 1e3, 1),
        "overhead_fraction": round(overhead_ms / step_ms, 5),
    }


def main() -> None:
    n = int(os.environ.get("BENCH10M_N", 10_000_000))
    dim = int(os.environ.get("BENCH10M_DIM", 384))
    mode = os.environ.get("BENCH10M_MODE", "bf16_rescore")
    top_k = 10
    b = 16

    with_graph = os.environ.get("BENCH10M_GRAPH", "1") == "1"
    graph_degree = 8

    from hcrag_tpu.parallel.mesh import ROWS_AXIS, make_row_mesh
    from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine
    from hcrag_tpu.utils.synthetic import synthetic_dense_index

    mesh = make_row_mesh()
    n_shards = mesh.shape[ROWS_AXIS]
    log(f"mesh: {n_shards} devices over '{ROWS_AXIS}'; n={n} dim={dim} "
        f"mode={mode} graph={with_graph}")

    t0 = time.time()
    index = synthetic_dense_index(n, dim, seed=0)
    emb_f32 = np.asarray(index.emb)
    log(f"index built in {time.time()-t0:.1f}s "
        f"({emb_f32.nbytes/2**30:.2f} GiB f32 host)")

    graph = None
    if with_graph:
        # Per-shard ELL at the target degree: the 10M x deg-8 neighbor
        # tables shard over `rows` instead of replicating (shard_graph).
        from hcrag_tpu.core.graph import CsrGraph
        from hcrag_tpu.core.types import edge_type_id

        t0 = time.time()
        rng_g = np.random.default_rng(3)
        src = np.repeat(np.arange(n, dtype=np.int64), graph_degree)
        dst = rng_g.integers(0, n, size=n * graph_degree)
        ety = rng_g.choice(
            [edge_type_id("DESCRIBED_BY"), edge_type_id("ANNOTATION")],
            size=n * graph_degree,
        )
        graph = CsrGraph.from_edges(
            n, src, dst, ety,
            node_labels=["Product"] * n,
            node_keys=list(range(n)),
            node_texts=[""] * n,
            node_to_row=np.arange(n, dtype=np.int32),
        )
        index.graph_ids = np.arange(n, dtype=np.int32)
        log(f"graph built in {time.time()-t0:.1f}s "
            f"({n * graph_degree} edges, degree {graph_degree})")

    if mode == "int8_residual":
        opts = dict(quantize_int8=True, int8_residual=True, int8_rescore=32)
        sel_bytes, extra_bytes = 1, 1  # int8 select + int8 residual
        extra_name = "int8 residual"
    else:
        opts = dict(exact_rescore=32)
        sel_bytes, extra_bytes = 2, 4  # bf16 select + f32 rescore
        extra_name = "f32 rescore"

    t0 = time.time()
    engine = ShardedQueryEngine(
        index, graph, mesh=mesh, shard_graph=with_graph,
        ell_max_degree=graph_degree, **opts,
    )
    log(f"sharded engine up in {time.time()-t0:.1f}s "
        f"(n_padded={engine._n_padded}, rescore m=32)")

    rng = np.random.default_rng(7)
    stored = rng.integers(0, n, size=b // 2)
    q = np.concatenate(
        [
            emb_f32[stored],
            rng.standard_normal((b - b // 2, dim)).astype(np.float32),
        ]
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    t0 = time.time()
    res = engine.query_batch(q, top_k=top_k, expansion_depth=1)
    step_s = time.time() - t0
    log(f"sharded query step (incl. compile): {step_s:.1f}s")
    if with_graph:
        assert (res.expanded_counts > 0).any(), "expansion produced nothing"

    # exact-match sanity: a stored row queried with itself ranks first
    for j, row in enumerate(stored):
        assert int(res.top_indices[j, 0]) == int(row), (
            f"self-retrieval failed: query {j} row {row} "
            f"got {res.top_indices[j, 0]}"
        )

    t0 = time.time()
    ref = brute_force_topk(emb_f32, q, top_k)
    log(f"f32 brute force ground truth: {time.time()-t0:.1f}s")

    recall = float(
        np.mean(
            [
                len(set(res.top_indices[i].tolist()) & set(ref[i].tolist()))
                / top_k
                for i in range(b)
            ]
        )
    )

    # Per-chip memory at the v5e-8 target (selection + rescore banks + the
    # replicated feature tables).
    per_chip_rows = engine._n_padded // n_shards
    sel_gb = per_chip_rows * dim * sel_bytes / 2**30
    extra_gb = per_chip_rows * dim * extra_bytes / 2**30
    feat_gb = (
        engine._n_padded
        * (4 + 4 * index.entity_bits.shape[1] + 4 + 4)  # type/bits/count/gid
        / 2**30
    )
    graph_gb = 0.0
    if with_graph:
        # Per-shard ELL: both hop tables + type ids + row links, SHARDED.
        g_rows = engine.d_neighbors.shape[0]
        graph_total = (
            engine.d_neighbors.size + engine.d_neighbors_hop2.size
            + g_rows * 2
        ) * 4
        graph_gb = graph_total / n_shards / 2**30
    entry = {
        "n_rows": n,
        "dim": dim,
        "mode": mode,
        "mesh_devices": n_shards,
        "recall_at_10_vs_f32_bruteforce": recall,
        "self_retrieval_exact": True,
        "per_chip_selection_bank_gb": round(sel_gb, 3),
        "per_chip_rescore_bank_gb": round(extra_gb, 3),
        "replicated_feature_tables_gb": round(feat_gb, 3),
        "per_chip_graph_ell_gb": round(graph_gb, 3),
        "graph": (
            f"degree-{graph_degree} ELL, shard_graph=True "
            "(sharded over rows; replicated would cost "
            f"{round(graph_gb * n_shards, 2)} GB/chip)"
            if with_graph else "none"
        ),
        "per_chip_total_gb": round(sel_gb + extra_gb + feat_gb + graph_gb, 3),
        "rescore_bank": extra_name,
        "note": (
            "BASELINE config 5 (10M sharded on v5e-8) executed on the "
            "8-device virtual CPU mesh: real sharded engine (row-sharded "
            "banks, shard-local kernels, ICI merge, distributed exact "
            "rescore). Per-chip throughput = single-chip kernel time on "
            "rows/8 PLUS the modeled ICI collective term below (payloads "
            "HLO-verified; bandwidth assumed, not measurable here)."
        ),
    }
    # Explicit sharded-latency model (round-4 VERDICT item 10): single-chip
    # kernel time for a 1024-query batch on this chip's row share, scaled
    # from the measured 1M-row bench, plus the HLO-verified collective
    # payloads over an assumed ICI bandwidth.
    serve_b, merge_m = 1024, 32
    if RESULTS.exists():
        base = json.loads(RESULTS.read_text())
        base_qps = base.get("synthetic_1000000", {}).get("qps")
        if base_qps:
            per_chip_rows_m = (n / n_shards) / 1e6
            single_ms = serve_b / base_qps * 1e3 * per_chip_rows_m
            entry["modeled_sharded_latency"] = modeled_collective_overhead(
                n_shards, serve_b, merge_m, single_ms
            )
    log(json.dumps(entry, indent=2))

    if RESULTS.exists() and n >= 1_000_000:  # don't record smoke shapes
        results = json.loads(RESULTS.read_text())
        results[f"synthetic_{n//1_000_000}M_sharded_{mode}"] = entry
        RESULTS.write_text(json.dumps(results, indent=2) + "\n")
        log(f"updated {RESULTS}")
    print(json.dumps({"recall_at_10": recall, "per_chip_gb": entry["per_chip_total_gb"], "mode": mode, "n": n}))


if __name__ == "__main__":
    main()
