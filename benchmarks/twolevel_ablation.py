"""Ablation: two-level packed selection vs the k-pass loops, on hardware.

The per-tile top-k selection was linear in k (k max+mask full-width VPU
passes per tile).  Two-level selection reduces the tile to per-lane top-2 in
ONE streamed pass, then picks k from the [B, 256] reduced buffer
(`ops/topk_pallas._packed_two_level_select`).  This measures the raw kernel
and the end-to-end engine effect at 1M rows.

Usage (TPU): python benchmarks/twolevel_ablation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, recall_gate, throughput, timed


def time_kernel(fn, *args, steps=20, **kw):
    import jax

    # Two warmup executions with a forced readback: compile + drain any
    # queued device work the under-blocking relay hasn't surfaced yet.
    for _ in range(2):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        np.asarray(out[0])
    t0 = time.time()
    outs = [fn(*args, **kw) for _ in range(steps)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1][0])
    return (time.time() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    import hcrag_tpu.ops.topk_pallas as tp
    from hcrag_tpu.ops.quantize import quantize_rows
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N, D, B, K = 1_000_000, 384, 512, 10
    rng = np.random.default_rng(7)
    with timed("gen"):
        E = rng.standard_normal((N, D)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        Q = rng.standard_normal((B, D)).astype(np.float32)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        e8, sc = quantize_rows(E)

    d_q = jax.device_put(jnp.asarray(Q))
    d_e_bf16 = jax.device_put(jnp.asarray(E.astype(ml_dtypes.bfloat16)))
    d_e8 = jax.device_put(jnp.asarray(e8))
    d_sc = jax.device_put(jnp.asarray(sc))
    d_mask = jax.device_put(jnp.ones(N, bool))
    # Force bank residency BEFORE any timing: block_until_ready under-blocks
    # through the relay (see NOTES.md), so the first timed window would
    # otherwise absorb the async 0.4-0.8 GB bank uploads (measured: a fresh
    # process's first window showed 62 QPS for a kernel that runs at 43k+).
    with timed("bank residency readback"):
        for bank in (d_e_bf16, d_e8, d_sc, d_q):
            np.asarray(jnp.sum(bank[..., -1].astype(jnp.float32)))

    results = {}

    def run(label, fn, *args, **kw):
        dt = time_kernel(fn, *args, **kw)
        qps = B / dt
        log(f"[{label}] {1000*dt:.2f} ms/batch -> {qps:.0f} QPS")
        results[label] = round(qps, 1)

    # int8 packed: two-level vs k-pass loop.  The strategy is a STATIC jit
    # argument (two_level=) — the earlier monkeypatch of _use_two_level was
    # defeated by the jit cache and measured the same kernel twice.
    run("int8_packed_two_level", tp.pallas_cosine_top_k_int8,
        d_q, d_e8, d_sc, d_mask, K, packed_select=True, merge_k=32,
        two_level=True)
    run("int8_packed_kpass", tp.pallas_cosine_top_k_int8,
        d_q, d_e8, d_sc, d_mask, K, packed_select=True, merge_k=32,
        two_level=False)

    # bf16: exact k-pass (engine default) vs packed two-level
    run("bf16_exact_kpass", tp.pallas_cosine_top_k,
        d_q, d_e_bf16, d_mask, K, merge_k=32)
    run("bf16_packed_two_level", tp.pallas_cosine_top_k,
        d_q, d_e_bf16, d_mask, K, packed_select=True, merge_k=32)

    # agreement of the two-level results vs brute force (top-32 merge sets)
    v, i = tp.pallas_cosine_top_k_int8(
        d_q, d_e8, d_sc, d_mask, K, packed_select=True, merge_k=32)
    i = np.asarray(i)[:8]
    ref = np.argsort(
        -(Q[:8] @ E.T), axis=1, kind="stable")[:, :K]
    overlap = np.mean([len(set(i[b]) & set(ref[b, :K])) / K for b in range(8)])
    results["int8_two_level_top10_in_merge32_vs_f32_brute"] = overlap
    log(f"recall of f32-true top-10 inside int8 two-level merge-32: {overlap}")

    print(json.dumps(results))
    out = "benchmarks/results.json"
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["two_level_selection_ablation_1M"] = dict(
        results,
        note=("raw fused-kernel QPS at 1M/B=512/k=10/merge=32: per-tile "
              "selection via one streamed per-lane top-2 pass + picks over "
              "the [B,256] reduction, vs k full-width max+mask passes"),
    )
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
