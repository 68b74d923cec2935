"""Round-5 10M-rows-on-one-chip re-measure (VERDICT next-4: >= 10k QPS).

int8 selection bank + int8 residual exact-rescore source (the max-density
residency: ~7.7 GB for 10M x 384), with the round-5 supertile kernel —
at 10M rows the per-tile candidate blocks alone were ~5 GB of HBM writes
per 512-query sub-batch (2 x [512, 9766*128] f32+i32 at tile 1024), which
supertiles cut ~8x, plus the level-2 pick overhead drops from ~9.8k to
~1.2k plane passes per sub-batch.

Runs in its own process: the 10M f32 host array (15.4 GB) + quantization
workspace don't fit beside the 1M sweep's working set.

Usage (TPU): python benchmarks/round5_10m.py
  BENCH10M_N=2000000 python benchmarks/round5_10m.py   # smoke
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")


def main():
    import jax
    import jax.numpy as jnp

    from hcrag_tpu.query.engine import QueryEngine
    from hcrag_tpu.utils.cache import enable_compilation_cache
    from hcrag_tpu.utils.synthetic import synthetic_dense_index

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N = int(os.environ.get("BENCH10M_N", 10_000_000))
    D, K = 384, 10
    t0 = time.time()
    index = synthetic_dense_index(N, D, seed=0)
    emb_f32 = np.asarray(index.emb, dtype=np.float32)
    log(f"index built {time.time()-t0:.1f}s")
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((2048, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # Brute-force reference for the recall gate (64 queries — chunked f32).
    n_gate = 64
    gate_q = queries[:n_gate]
    best_v = np.full((n_gate, K), -np.inf, np.float32)
    best_i = np.zeros((n_gate, K), np.int64)
    for lo in range(0, N, 500_000):
        s = gate_q @ emb_f32[lo:lo + 500_000].T
        ci = np.argsort(-s, axis=1, kind="stable")[:, :K] + lo
        cv = np.take_along_axis(s, ci - lo, axis=1)
        allv = np.concatenate([best_v, cv], axis=1)
        alli = np.concatenate([best_i, ci], axis=1)
        order = np.lexsort((alli, -allv), axis=1)[:, :K]
        best_v = np.take_along_axis(allv, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
    log("gate reference ready")

    # Round-5b: one process, both lane depths — the FUSED int8 select
    # (rescale+encode per lane group, tile back at 2048) at the default
    # plane count and at lane_t=1 (half the insert passes; drop odds at
    # 4883 tiles are ~(better rows per tile)/128 — gate-watched).  The
    # engines share nothing on-device; the first is deleted before the
    # second quantizes, so peak HBM stays one 7.7 GB bank set.
    lane_sel = os.environ.get("BENCH10M_LANE_T", "0,1")
    all_rows = {}
    recalls = {}
    resolved = {}
    for lane_t in [int(x) for x in lane_sel.split(",")]:
        t0 = time.time()
        eng = QueryEngine(
            index, None, quantize_int8=True, int8_residual=True,
            int8_rescore=32, select_lane_t=lane_t,
        )
        # Force residency with tiny readbacks (NOTES round-2).  No
        # reshape(-1): a flattened [10M, 384] bank is > 2^31 elements and
        # overflows the jitted gather's int32 indexing.
        for a in (eng.d_emb_int8, eng.d_emb_scale, eng.d_emb_res8,
                  eng.d_emb_res_scale):
            x = a[-8:] if a.ndim == 1 else a[-8:, -1]
            np.asarray(jnp.sum(x.astype(jnp.float32)))
        log(f"--- lane_t={lane_t}: engine init + residency "
            f"{time.time()-t0:.1f}s; resolved "
            f"{json.dumps(eng.resolved_kernel_config(2048, K))}")

        res = eng.query_batch(gate_q, top_k=K, expansion_depth=0)
        hits = sum(
            len(set(res.top_indices[i]) & set(best_i[i]))
            for i in range(n_gate)
        )
        recall = hits / (n_gate * K)
        recalls[lane_t] = recall
        log(f"lane_t={lane_t} recall@10 vs f32 brute force: {recall:.4f}")

        for B in (1024, 2048):
            dq = jax.device_put(jnp.asarray(queries[:B]))
            warm = eng.query_batch_device(dq, top_k=K, expansion_depth=0)
            jax.block_until_ready(warm); _ = np.asarray(warm[0])
            steps = 8
            t0 = time.time()
            outs = [eng.query_batch_device(dq, top_k=K, expansion_depth=0)
                    for _ in range(steps)]
            jax.block_until_ready(outs); _ = np.asarray(outs[-1][0])
            dt = (time.time() - t0) / steps
            log(f"lane_t={lane_t} B={B}: {1e3*dt:.1f} ms/batch -> "
                f"{B/dt:.0f} QPS")
            all_rows[f"t{lane_t}_b{B}"] = dict(
                qps=round(B / dt, 1), ms_per_batch=round(1e3 * dt, 2),
                batch=B, lane_t=lane_t, recall_at_10=round(recall, 4),
            )
            resolved[f"t{lane_t}_b{B}"] = eng.resolved_kernel_config(B, K)
        del eng
        import gc
        gc.collect()

    # Best GATED row wins the headline slot (recall >= 0.999).
    gated = {k: r for k, r in all_rows.items()
             if r["recall_at_10"] >= 0.999} or all_rows
    best_key = max(gated, key=lambda k: gated[k]["qps"])
    best = all_rows[best_key]
    entry = dict(
        best,
        recall_gate_queries=n_gate,
        resident_gb=7.7,
        prev_round_qps=7282.5,
        resolved_kernel=resolved[best_key],
        sweep=all_rows,
        note=(
            "round-5b: FUSED int8 select (rescale+encode per 128-lane "
            "group, no full-width f32/packed copies -> tile 2048) over the "
            "int8 select bank + int8 residual exact-rescore source, one "
            "v5e chip; lane_t sweep recall-gated per variant.  VERDICT "
            "next-4 bar: >= 10k QPS at recall >= 0.999."
        ),
    )
    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    if N == 10_000_000:
        data["synthetic_10M_one_chip_int8_residual"] = entry
    else:
        data[f"synthetic_{N}_one_chip_int8_residual_smoke"] = entry
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps({"qps": entry["qps"], "recall": recall, "n": N}))


if __name__ == "__main__":
    main()
