"""Stage ablation benchmark: where does the per-batch time go?

Times, on one chip at a given index size:
  1. cosine matmul only
  2. matmul + XLA top-k (chunked / streaming)
  3. Pallas fused cosine+top-k
  4. full engine step (retrieval + scoring + expansion)
  5. full engine step without expansion (depth handled by max_expanded=1)

Run AFTER other TPU work drains (single-client rule, NOTES.md):
  python benchmarks/ablation.py [n] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, flush=True)


def bench(fn, *args, steps=10, label=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(steps)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / steps
    log(f"  {label:36s} {dt * 1000:8.2f} ms/batch")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    k = 10

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from hcrag_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from hcrag_tpu.ops.similarity import streaming_masked_top_k, masked_top_k
    from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k
    from hcrag_tpu.query.engine import QueryEngine
    from __graft_entry__ import _synthetic_setup

    log(f"backend={jax.default_backend()} n={n} b={b} k={k}")
    index, graph = _synthetic_setup(n, 384, graph_degree=4)
    emb_bf16 = np.asarray(index.emb, np.float32).astype(ml_dtypes.bfloat16)
    index.emb = emb_bf16

    dE = jax.device_put(jnp.asarray(emb_bf16))
    rng = np.random.default_rng(7)
    q = rng.standard_normal((b, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dq = jax.device_put(jnp.asarray(q))
    mask = jax.device_put(jnp.ones((n,), bool))

    # 1. matmul only
    mm = jax.jit(
        lambda qq: jnp.dot(
            qq.astype(dE.dtype), dE.T, preferred_element_type=jnp.float32
        ).sum(axis=1)  # reduce so the [B,N] matrix is consumed on device
    )
    t_mm = bench(mm, dq, label="matmul only (reduced)")

    # 2. matmul + XLA top-k
    if n > (1 << 18):
        xla_topk = jax.jit(
            lambda qq: streaming_masked_top_k(qq, dE, mask, k)
        )
        t_xla = bench(xla_topk, dq, label="matmul + streaming XLA top-k")
    else:
        xla_topk = jax.jit(
            lambda qq: masked_top_k(
                jnp.dot(qq.astype(dE.dtype), dE.T,
                        preferred_element_type=jnp.float32),
                mask, k,
            )
        )
        t_xla = bench(xla_topk, dq, label="matmul + chunked XLA top-k")

    # 3. pallas fused
    n_pad = ((n + 2047) // 2048) * 2048
    dE_pad = jax.device_put(
        jnp.asarray(
            np.pad(emb_bf16, ((0, n_pad - n), (0, 0))) if n_pad != n else emb_bf16
        )
    )
    mask_pad = jax.device_put(
        jnp.asarray(np.arange(n_pad) < n)
    )
    pall = jax.jit(
        lambda qq: pallas_cosine_top_k(qq, dE_pad, mask_pad, k, tile_n=2048)
    )
    try:
        t_pallas = bench(pall, dq, label="pallas fused cosine+top-k")
    except Exception as e:
        log(f"  pallas failed: {type(e).__name__}: {str(e)[:200]}")
        t_pallas = None

    # 4/5. full engine step with / without expansion
    engine = QueryEngine(index, graph, ell_max_degree=8)
    for depth, max_exp, label in ((1, 20, "full step (expansion d1)"),
                                  (1, 1, "full step (max_expanded=1)")):
        fn = lambda qq: engine.query_batch_device(
            qq, top_k=k, expansion_depth=depth, max_expanded=max_exp
        )
        bench(fn, dq, label=label)

    log("done")


if __name__ == "__main__":
    main()
