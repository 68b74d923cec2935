"""Round-5c follow-ups to the fused-kernel sweep (round5b_fused.py):

1. int8+f32-rescore at lane_t=1 (B 1024/4096) — t1 gave +1.7% on bf16;
2. int8+f32-rescore and bf16 at B=8192 (dispatch amortization: the ~4.5 ms
   relay dispatch is ~9% of the 50 ms B=4096 step);
3. clean re-fit of the fused_t2 slope (the round5b run's 131072-point was
   polluted by a 289 ms relay hiccup, wrecking the 4-point fit).

Merges into the same results rows as round5b.
"""

from __future__ import annotations

import functools
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
    import ml_dtypes

    from __graft_entry__ import _synthetic_setup
    from benchmarks.round5b_fused import brute_force_top10
    from hcrag_tpu.query.engine import QueryEngine
    from hcrag_tpu.utils.cache import enable_compilation_cache
    import hcrag_tpu.ops.topk_pallas as tp

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N, D, K = 1_000_000, 384, 10
    index, graph = _synthetic_setup(N, D, graph_degree=4)
    emb_f32 = np.asarray(index.emb, dtype=np.float32)
    rng = np.random.default_rng(7)
    qmax = rng.standard_normal((8192, D)).astype(np.float32)
    qmax /= np.linalg.norm(qmax, axis=1, keepdims=True)
    ref_top = brute_force_top10(emb_f32, qmax[:256], K)
    log("setup done")

    def measure(engine, B, depth=1, steps=10, gate=0.999):
        dq = jax.device_put(jnp.asarray(qmax[:B]))
        res = engine.query_batch(qmax[:256], top_k=K, expansion_depth=depth)
        hits = sum(
            len(set(res.top_indices[i]) & set(ref_top[i]))
            for i in range(256)
        )
        recall = hits / (256 * K)
        warm = engine.query_batch_device(dq, top_k=K, expansion_depth=depth)
        jax.block_until_ready(warm); _ = np.asarray(warm[0])
        t0 = time.time()
        outs = [
            engine.query_batch_device(dq, top_k=K, expansion_depth=depth)
            for _ in range(steps)
        ]
        jax.block_until_ready(outs); _ = np.asarray(outs[-1][0])
        dt = (time.time() - t0) / steps
        log(f"B={B}: {1e3*dt:.1f} ms/batch -> {B/dt:.0f} QPS, "
            f"recall {recall:.4f}")
        return dict(qps=round(B / dt, 1), ms_per_batch=round(1e3 * dt, 2),
                    recall_at_10=round(recall, 4), batch=B,
                    recall_gate_queries=256,
                    resolved_kernel=engine.resolved_kernel_config(B, K))

    def residency(engine):
        for a in engine._bank().values():
            if hasattr(a, "dtype") and a.ndim >= 1:
                np.asarray(jnp.sum(a.reshape(-1)[-8:].astype(jnp.float32)))

    sweep = {}
    variants = [
        ("int8f32_t1", dict(quantize_int8=True, int8_rescore=32,
                            int8_f32_rescore=True, pallas_super=1,
                            select_lane_t=1), (1024, 4096, 8192)),
        ("int8f32", dict(quantize_int8=True, int8_rescore=32,
                         int8_f32_rescore=True, pallas_super=1), (8192,)),
        ("bf16", dict(exact_rescore=32, pallas_super=1), (8192,)),
    ]
    sel = os.environ.get("R5C_VARIANTS")
    if sel:
        names = set(sel.split(","))
        variants = [v for v in variants if v[0] in names]
    for name, kw, batches in variants:
        eng = QueryEngine(index, graph, ell_max_degree=8, **kw)
        residency(eng)
        log(f"--- {name} resolved "
            f"{json.dumps(eng.resolved_kernel_config(1024, K))}")
        for B in batches:
            sweep[f"{name}_b{B}"] = measure(eng, B)
        del eng

    data = json.load(open(RESULTS)) if os.path.exists(RESULTS) else {}
    if sweep:
        prior = {
            k: v for k, v in data.get("synthetic_1M_fused_r5b", {}).items()
            if k != "note"
        }
        note = data.get("synthetic_1M_fused_r5b", {}).get("note", "")
        prior.update(sweep)
        data["synthetic_1M_fused_r5b"] = dict(prior, note=note)
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)

    # Clean fused_t2 slope re-fit.
    B = 512
    d_q = jax.device_put(jnp.asarray(qmax[:B]))
    fn = functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=2048,
        packed_select=True, merge_k=32, two_level=True, lane_t=0,
    )
    pts = []
    for n_fit in (131072, 262144, 524288, 999424):
        d_e = jax.device_put(jnp.asarray(
            emb_f32[:n_fit].astype(ml_dtypes.bfloat16)))
        d_m = jax.device_put(jnp.ones(n_fit, bool))
        np.asarray(jnp.sum(d_e[:, -1].astype(jnp.float32)))
        for _ in range(2):  # double warmup: absorb any relay hiccup
            v, i = fn(d_q, d_e, d_m)
            jax.block_until_ready((v, i)); np.asarray(v)
        steps = 12
        t0 = time.time()
        outs = [fn(d_q, d_e, d_m) for _ in range(steps)]
        jax.block_until_ready(outs); _ = np.asarray(outs[-1][0])
        dt = (time.time() - t0) / steps
        log(f"fused_t2 N={n_fit}: {1e3*dt:.2f} ms/call")
        pts.append((n_fit, 1e3 * dt))
        del d_e, d_m
    ns = np.array([p[0] for p in pts], np.float64)
    ts = np.array([p[1] for p in pts], np.float64)
    d_slope, a_fit = np.polyfit(ns, ts, 1)
    data = json.load(open(RESULTS))
    row = data.get("dispatch_floor_fit_r5b", {})
    row["fused_t2"] = {
        "per_call_ms": {str(int(n)): round(t, 3) for n, t in pts},
        "fit_dispatch_overhead_ms": round(float(a_fit), 3),
        "fit_device_ms_per_1M_rows": round(float(d_slope * 1e6), 3),
    }
    data["dispatch_floor_fit_r5b"] = row
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    out = {"slope_fused_t2": row["fused_t2"]["fit_device_ms_per_1M_rows"]}
    if sweep:
        best_name = max(sweep, key=lambda k: sweep[k]["qps"])
        out["best"] = best_name
        out["best_qps"] = sweep[best_name]["qps"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
