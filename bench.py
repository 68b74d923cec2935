"""Benchmark: batched query throughput on one chip.

Measures the BASELINE.md headline — queries/sec/chip through the FULL fused
query path (cosine top-k + graph expansion + weighted relevance fusion) on a
synthetic index — after verifying exact recall@10 parity against f32 NumPy
brute force.

Prints ONE JSON line:
  {"metric": "queries_per_sec_per_chip", "value": N, "unit": "qps",
   "vs_baseline": N / 10000}

Robustness: the TPU here sits behind a tunneled relay that can stall for
minutes (see NOTES.md), so the default mode supervises a worker subprocess
per config, walking down index sizes (1M -> 250k -> 100k) until one
completes inside its time budget.  `BENCH_DIRECT=1` runs a single config
inline (the worker mode).  Extra context goes to stderr; the result reports
which config ran.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_direct():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    from hcrag_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from hcrag_tpu.query.engine import QueryEngine
    from __graft_entry__ import _synthetic_setup

    n = int(os.environ.get("BENCH_N", 1_000_000))
    dim = int(os.environ.get("BENCH_DIM", 384))
    # B=4096 default (round 4): the packed engine path internally splits
    # into 512-query VMEM blocks, and ~4.5-6 ms of every dispatch is relay
    # overhead (results.json:dispatch_floor_fit), so larger submitted
    # batches amortize it — measured 61.5k/69.5k/75.3k QPS at B=1024/2048/
    # 4096 within one session (synthetic_1M_batch_sweep_r4).
    # Round-5 headline defaults (benchmarks/results.json:
    # synthetic_1M_fused_r5b): int8 selection + f32 exact rescore at
    # lane_t=1, B=8192 — 90.9k QPS at recall 1.0000 on the 256-query gate
    # (vs 75.0k bf16 B=4096).  B=8192 amortizes the ~4.5 ms relay dispatch
    # overhead; the engine still splits into 512-query VMEM sub-batches.
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    top_k = int(os.environ.get("BENCH_TOPK", 10))
    depth = int(os.environ.get("BENCH_DEPTH", 1))
    dtype = os.environ.get("BENCH_DTYPE", "int8")
    bp = os.environ.get("BENCH_PALLAS")
    use_pallas = None if bp is None else bp == "1"

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    log(f"building synthetic index n={n} dim={dim} dtype={dtype} ...")
    t0 = time.time()
    index, graph = _synthetic_setup(n, dim, graph_degree=4)
    emb_f32 = np.asarray(index.emb, dtype=np.float32)  # host copy for checks
    quantize_int8 = dtype == "int8"
    # Default: exact-rescore hybrid residency (bf16 kernel bank + f32
    # candidate rescoring) -> exact-match recall at bf16 selection speed.
    # BENCH_RESCORE=0 falls back to single-dtype residency.
    rescore = int(os.environ.get("BENCH_RESCORE", 32))
    # int8 residency mode: "" = int8 + bf16 rescore copy; "only" = no
    # rescore source (max density); "residual" = int8 + int8-residual
    # rescore bank (2 bytes/elem stored, 1 byte/elem streamed — the 10M
    # one-chip config with exact-rescore recall); "f32" = int8 selection +
    # f32 exact rescore (round-5 throughput mode: int8 E-read/MXU speed,
    # f32 recall-1.0 ranking; +4 bytes/elem resident).
    int8_mode = os.environ.get(
        "BENCH_INT8_MODE", "f32" if dtype == "int8" else ""
    )
    # Per-lane plane count for the fused two-level selection (0 = auto,
    # 1 = single plane: half the insert passes; probabilistic-drop
    # contract — the recall gate below watches it).  Default 1: measured
    # recall 1.0000 at 1M/489 tiles (drop odds ~(better same-tile rows)/128
    # per query — negligible at production tile counts).
    lane_t = int(os.environ.get("BENCH_LANE_T", 1))
    # Residual/f32-rescore modes quantize + rescore from TRUE f32 (the
    # refinement must see f32 values, not bf16-rounded ones, to recover
    # exact-match recall); other int8/bf16 modes downcast the host index to
    # halve transfer.
    if (quantize_int8 and int8_mode not in ("residual", "f32")) or (
        dtype == "bfloat16" and not rescore
    ):
        import ml_dtypes

        index.emb = emb_f32.astype(ml_dtypes.bfloat16)
    log(f"index built in {time.time() - t0:.1f}s")

    t0 = time.time()
    engine = QueryEngine(
        index, graph, ell_max_degree=8, use_pallas=use_pallas,
        quantize_int8=quantize_int8,
        int8_only=int8_mode == "only",
        int8_residual=int8_mode == "residual",
        int8_f32_rescore=int8_mode == "f32",
        int8_rescore=rescore,
        exact_rescore=rescore if dtype == "bfloat16" else 0,
        select_lane_t=lane_t,
    )
    resolved = engine.resolved_kernel_config(batch, top_k)
    log(
        f"engine init (device transfer) in {time.time() - t0:.1f}s; "
        f"resolved kernel: {json.dumps(resolved)}"
    )

    rng = np.random.default_rng(7)
    queries = rng.standard_normal((batch, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    # --- correctness gate: recall@10 vs f32 NumPy brute force -------------
    # 256 gate queries (round-4 VERDICT #9; was 64): a selection bug
    # touching ~0.4% of queries must fail the gate before it ships a
    # headline.  The brute force runs in row chunks to bound the
    # [n_check, N] score buffer (256 x 250k f32 = 256 MB per chunk).
    n_check = min(int(os.environ.get("BENCH_GATE_QUERIES", 256)), batch)
    ref_top = np.zeros((n_check, top_k), dtype=np.int64)
    chunk = 250_000
    best_v = np.full((n_check, top_k), -np.inf, dtype=np.float32)
    best_i = np.zeros((n_check, top_k), dtype=np.int64)
    for lo in range(0, emb_f32.shape[0], chunk):
        s = queries[:n_check] @ emb_f32[lo : lo + chunk].T
        cand_i = np.argsort(-s, axis=1, kind="stable")[:, :top_k] + lo
        cand_v = np.take_along_axis(s, cand_i - lo, axis=1)
        allv = np.concatenate([best_v, cand_v], axis=1)
        alli = np.concatenate([best_i, cand_i], axis=1)
        # stable global merge: sort by (-score, index)
        order = np.lexsort((alli, -allv), axis=1)[:, :top_k]
        best_v = np.take_along_axis(allv, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
    ref_top = best_i
    res = engine.query_batch(queries, top_k=top_k, expansion_depth=depth)
    hits = sum(
        len(set(res.top_indices[i]) & set(ref_top[i])) for i in range(n_check)
    )
    recall = hits / (n_check * top_k)
    log(f"recall@{top_k} vs f32 brute force ({n_check} queries): {recall:.4f}")
    # Gate (asserted): exact-match configs gate at 0.998 (one slot of 640
    # tolerated for f32 score ties at the k boundary — brute force breaks
    # ties by lowest index, the device merge by candidate position);
    # int8-only / no-rescore modes carry quantization noise, gate 0.95.
    min_recall = 0.998 if (rescore and int8_mode != "only") else 0.95
    if recall < min_recall:
        log(
            f"RECALL GATE FAILED: {recall:.4f} < {min_recall} "
            f"(dtype={dtype}, int8_mode={int8_mode!r}, rescore={rescore})"
        )
        sys.exit(3)

    # --- throughput: pipelined async dispatch (the serving pattern) -------
    import jax.numpy as jnp

    dq = jnp.asarray(queries)  # pre-uploaded, normalized
    warm = engine.query_batch_device(dq, top_k=top_k, expansion_depth=depth)
    jax.block_until_ready(warm)
    steps = int(os.environ.get("BENCH_STEPS", 20))
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
    elapsed = time.time() - t0
    qps = steps * batch / elapsed
    log(
        f"{steps} steps x {batch} queries in {elapsed:.3f}s "
        f"({1000 * elapsed / steps:.1f} ms/batch, pipelined)"
    )

    # --- measured bandwidth artifact ---------------------------------------
    # The retrieval step is HBM-bandwidth-bound at large N: the dominant
    # traffic is one full read of the SELECTION bank per sub-batch pass
    # (the fused kernel writes only [B, k] candidates; rescore gathers are
    # m*B rows — noise).  bytes/step and the implied effective GB/s make
    # the "memory-bandwidth speed-of-light" claim checkable from the JSON.
    sub_b = resolved.get("sub_batch", 512)
    if quantize_int8:
        sel_bytes = 1
        n_bank = engine.d_emb_int8.shape[0]
    else:
        sel_bytes = np.dtype(np.asarray(engine.d_emb).dtype).itemsize
        n_bank = engine.d_emb.shape[0]
    passes = -(-batch // sub_b)  # bank re-read per lax.map sub-batch chunk
    bank_bytes_per_step = n_bank * dim * sel_bytes * passes
    eff_gbps = bank_bytes_per_step / (elapsed / steps) / 2**30
    log(
        f"bank read: {bank_bytes_per_step / 2**20:.0f} MiB/step x {passes} "
        f"pass(es) -> effective {eff_gbps:.1f} GiB/s"
    )

    # --- BASELINE-defined pipeline: TEXT in -> ranked results out ---------
    # BASELINE.md's throughput metric is "embed -> top-k -> expansion ->
    # weighted fusion"; the headline above starts from pre-embedded queries.
    # This row runs the full definition: host tokenization + the distilled
    # on-device MiniLM encoder (models/minilm.py) + the fused query step,
    # all inside the timed loop (tokenization overlaps device compute via
    # async dispatch).  Encoder-only texts/sec is reported alongside.
    qps_text = None
    enc_tps = None
    if os.environ.get("BENCH_TEXT", "1") == "1":
        from hcrag_tpu.models.minilm import load_distilled_embedder

        emb_model = load_distilled_embedder()
        if emb_model is None:
            log("text-to-results: distilled encoder artifacts absent, skipped")
        else:
            adjs = ["red", "black", "lightweight", "durable", "mountain",
                    "road", "touring", "carbon", "aluminum", "silver"]
            nouns = ["bike", "frame", "helmet", "jersey", "wheel", "pedal",
                     "fork", "saddle", "chain", "light"]
            texts = [
                f"{adjs[i % 10]} {nouns[(i // 10) % 10]} model {i}"
                for i in range(batch)
            ]
            tok = emb_model.tokenizer
            apply_fn = emb_model._apply
            params = emb_model.params

            def text_step(txts):
                # max_len 64 for query batches: identical embeddings for
                # texts that fit (pooling/attention mask padding), ~9x less
                # encoder attention work than the 192-token corpus setting.
                ids, mask = tok.encode_batch(txts, max_len=64)  # host
                qv = apply_fn(params, ids, mask)    # device, L2-normalized
                return engine.query_batch_device(
                    qv.astype(jnp.float32), top_k=top_k,
                    expansion_depth=depth,
                )

            warm_t = text_step(texts)
            jax.block_until_ready(warm_t)
            _ = np.asarray(warm_t[0])
            t0 = time.time()
            outs_t = [text_step(texts) for _ in range(steps)]
            jax.block_until_ready(outs_t)
            _ = np.asarray(outs_t[-1][0])
            el_t = time.time() - t0
            qps_text = steps * batch / el_t
            log(
                f"text->results: {steps} steps x {batch} texts in "
                f"{el_t:.3f}s -> {qps_text:.0f} QPS"
            )

            # encoder-only texts/sec (tokenize + encode + readback-forced)
            warm_e = apply_fn(params, *tok.encode_batch(texts, max_len=64))
            jax.block_until_ready(warm_e)
            _ = np.asarray(warm_e)
            t0 = time.time()
            encs = [
                apply_fn(params, *tok.encode_batch(texts, max_len=64))
                for _ in range(steps)
            ]
            jax.block_until_ready(encs)
            _ = np.asarray(encs[-1])
            el_e = time.time() - t0
            enc_tps = steps * batch / el_e
            log(f"encoder only: {enc_tps:.0f} texts/s")

    target = 10_000.0
    out = {
        "metric": "queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / target, 3),
        "config": {
            "index_rows": n,
            "batch": batch,
            "top_k": top_k,
            "expansion_depth": depth,
            "dtype": dtype,
            "int8_mode": int8_mode,
            "recall_at_10": recall,
            "recall_gate_queries": n_check,
            "resolved_kernel": resolved,
        },
        "bank_bytes_per_step": bank_bytes_per_step,
        "effective_hbm_gib_s": round(eff_gbps, 1),
    }
    if qps_text is not None:
        out["qps_text_to_results"] = round(qps_text, 1)
        out["encoder_texts_per_sec"] = round(enc_tps, 1)
    print(json.dumps(out))


#: (index rows, wall-clock budget seconds) tried in order by the supervisor.
FALLBACK_CONFIGS = [
    (1_000_000, 2400),
    (250_000, 1200),
    (100_000, 900),
]


def run_supervised():
    for n, budget in FALLBACK_CONFIGS:
        if "BENCH_N" in os.environ:
            n = int(os.environ["BENCH_N"])
        log(f"=== attempting config n={n} (budget {budget}s) ===")
        env = dict(os.environ, BENCH_DIRECT="1", BENCH_N=str(n))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            log(f"config n={n} exceeded {budget}s budget; falling back")
            continue
        sys.stderr.write(proc.stderr)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line)
                return
        log(f"config n={n} exited {proc.returncode} without a result")
        if "BENCH_N" in os.environ:
            break
    # Total failure: emit an explicit zero so the driver records the attempt.
    print(
        json.dumps(
            {
                "metric": "queries_per_sec_per_chip",
                "value": 0.0,
                "unit": "qps",
                "vs_baseline": 0.0,
                "error": "all benchmark configs timed out (TPU relay stall)",
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("BENCH_DIRECT", "0") == "1":
        run_direct()
    else:
        run_supervised()
