"""Expansion-heavy config (top-100, depth-3) — stage breakdown + re-measure.

Round 2 recorded `synthetic_1M_top100_depth3` = 346 QPS at B=64 with no
analysis of where the time went.  Round 3 replaced the expansion dedup
(scatter-min over a [G+1] buffer per query, serialized by TPU scatter
lowering) with a sort-based first-occurrence dedup and dropped the
semantically-no-op intermediate frontier dedup (`ops/expand.py`).

This measures the config end-to-end AND per stage on hardware:

  * full step (retrieval k=100 + depth-3 expansion + scoring)
  * retrieval-only step at k=100 (isolates selection cost)
  * expansion-only (expand_batch over fixed seed sets)
  * dedup-only (the [B, C] sort-based unique mask)

so the row in results.json carries its own breakdown instead of a bare
number.

Usage (TPU): python benchmarks/expansion_heavy.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, timed


def time_dev(fn, steps=10):
    import jax

    for _ in range(2):
        out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    outs = [fn() for _ in range(steps)]
    jax.block_until_ready(outs)
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.time() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_setup
    from hcrag_tpu.ops.expand import expand_batch
    from hcrag_tpu.query.engine import QueryEngine
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N, D, K, DEPTH = 1_000_000, 384, 100, 3
    # Round-4 (VERDICT #6): B=64 was dispatch/read-bound — the batch is the
    # lever.  Default raised to 256; EXP_B overrides for the floor proof.
    B = int(os.environ.get("EXP_B", 256))
    deg = 8
    with timed("synthetic setup (1M, degree 8)"):
        index, graph = _synthetic_setup(N, D, graph_degree=deg)
    # Keep the host bank f32: the engine derives the bf16 kernel bank
    # itself and needs the f32 copy for the exact rescore — downcasting
    # here silently disables exact_rescore (and with it the packed
    # two-level kernel this config is meant to measure).
    with timed("engine init"):
        engine = QueryEngine(
            index, graph, ell_max_degree=deg, exact_rescore=32,
        )
    assert engine.exact_rescore == 32
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    dq = jax.device_put(jnp.asarray(queries))
    # residency
    np.asarray(jnp.sum(engine.d_emb[:, -1].astype(jnp.float32)))
    np.asarray(jnp.sum(engine.d_neighbors[:, -1]))

    results = {}

    # 1) full fused step (the verdict row)
    dt_full = time_dev(lambda: engine.query_batch_device(
        dq, top_k=K, expansion_depth=DEPTH))
    results["full_step_qps"] = round(B / dt_full, 1)
    log(f"full step: {1000*dt_full:.1f} ms -> {B/dt_full:.0f} QPS")

    # 2) retrieval-only at k=100
    dt_ret = time_dev(lambda: engine.retrieve_batch_device(dq, top_k=K))
    results["retrieval_only_qps"] = round(B / dt_ret, 1)
    log(f"retrieval only (k=100): {1000*dt_ret:.1f} ms -> {B/dt_ret:.0f} QPS")

    # 3) expansion-only over fixed seeds (the [B, 100] -> depth-3 sweep)
    seeds = jax.device_put(jnp.asarray(
        rng.integers(0, N, size=(B, K)).astype(np.int32)))
    nbrs = engine.d_neighbors
    hop2 = engine.d_neighbors_hop2
    exp_fn = jax.jit(functools.partial(
        expand_batch, depth=DEPTH, max_nodes=20))
    dt_exp = time_dev(lambda: exp_fn(nbrs, seeds, hop2_neighbors=hop2))
    results["expansion_only_ms_per_batch"] = round(1000 * dt_exp, 2)
    log(f"expansion only: {1000*dt_exp:.1f} ms/batch")

    # 4) dedup-only over a [B, C] candidate tensor shaped like depth-3
    from hcrag_tpu.ops.expand import _ordered_unique_mask

    C = K * deg + K * deg * deg + K * deg * deg * deg  # 58400
    cand = jax.device_put(jnp.asarray(
        rng.integers(-1, N, size=(B, C)).astype(np.int32)))
    dd_fn = jax.jit(jax.vmap(lambda c: _ordered_unique_mask(c, N)))
    dt_dd = time_dev(lambda: dd_fn(cand))
    results["dedup_only_ms_per_batch"] = round(1000 * dt_dd, 2)
    log(f"dedup only (C={C}): {1000*dt_dd:.1f} ms/batch")

    # depth-1 reference point at the same k
    dt_d1 = time_dev(lambda: engine.query_batch_device(
        dq, top_k=K, expansion_depth=1))
    results["full_step_depth1_qps"] = round(B / dt_d1, 1)
    log(f"full step depth-1: {1000*dt_d1:.1f} ms -> {B/dt_d1:.0f} QPS")

    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    key = (
        "synthetic_1M_top100_depth3" if B == 64
        else f"synthetic_1M_top100_depth3_b{B}"
    )
    prev = data.get(key, {}).get("qps")
    data[key] = dict(
        qps=results["full_step_qps"], batch=B, prev_round_qps=prev,
        breakdown=results,
        note=(
            "full_step uses expand_batch_early_exit: top-100 seeds x "
            "degree-8 give ~800 hop-1 candidates >> the 20-node cap, so "
            "the fused step exits after ONE hop and never runs the deep "
            "gathers.  expansion_only / dedup_only are WORST-CASE "
            "microbenches of the non-early-exit paths (expand_batch over "
            "all 3 hops; one standalone [B, 58400] adversarial-random "
            "dedup) — they bound what an adversarial batch could cost, "
            "they are NOT components of the measured full_step time "
            "(round-5 VERDICT weak-6 clarification; cap-boundary "
            "semantics pinned by tests/unit/test_property_based.py::"
            "TestCapBoundary)"
        ),
    )
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
