"""Hardware validation of the Pallas kernels (compiled, not interpreted).

Runs both kernels on the real TPU at modest sizes and checks exact parity
against the XLA ops.  Run alone (single TPU client, NOTES.md):

    python benchmarks/pallas_validate.py [n] [batch]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    k = 10

    import jax
    import jax.numpy as jnp

    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} n={n} b={b}", flush=True)

    rng = np.random.default_rng(0)
    e = rng.standard_normal((n, 384)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((b, 384)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mask = np.ones(n, bool)
    mask[:50] = False

    # --- fused cosine+top-k -------------------------------------------------
    from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k

    dq, dE, dm = jnp.asarray(q), jnp.asarray(e), jnp.asarray(mask)
    t0 = time.time()
    v, i = pallas_cosine_top_k(dq, dE, dm, k, tile_n=2048)
    iv = np.asarray(i)
    print(f"pallas top-k compile+run {time.time() - t0:.1f}s", flush=True)

    s = q @ e.T
    s[:, :50] = -np.inf
    ref = np.argsort(-s, axis=1, kind="stable")[:, :k]
    setmatch = np.mean(
        [len(set(iv[r]) & set(ref[r])) / k for r in range(b)]
    )
    print(f"pallas top-k recall vs brute force: {setmatch:.4f}", flush=True)

    t0 = time.time()
    outs = [pallas_cosine_top_k(dq, dE, dm, k, tile_n=2048) for _ in range(10)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1][0])
    dt = (time.time() - t0) / 10
    print(f"pallas top-k: {dt * 1000:.2f} ms/batch -> {b / dt:.0f} QPS", flush=True)

    # --- fused relevance scoring ---------------------------------------------
    from hcrag_tpu.core.types import ScorerType, scorer_spec
    from hcrag_tpu.ops.scoring_pallas import pallas_batch_relevance

    w_arr, red = scorer_spec(ScorerType.COMPOSITE, None)
    nb = rng.integers(0, 2**32, (n, 8), dtype=np.uint32) & rng.integers(
        0, 2**32, (n, 8), dtype=np.uint32
    )
    qb = rng.integers(0, 2**32, (b, 8), dtype=np.uint32) & rng.integers(
        0, 2**32, (b, 8), dtype=np.uint32
    )
    qc = np.array(
        [bin(int.from_bytes(r.tobytes(), "little")).count("1") for r in qb],
        np.int32,
    )
    nc = np.array(
        [bin(int.from_bytes(r.tobytes(), "little")).count("1") for r in nb],
        np.int32,
    )
    tids = rng.integers(0, 6, n).astype(np.int32)
    intents = rng.integers(0, 5, b).astype(np.int32)

    t0 = time.time()
    out = pallas_batch_relevance(
        jnp.asarray(q), jnp.asarray(qb), jnp.asarray(qc), jnp.asarray(intents),
        jnp.asarray(e), jnp.asarray(nb), jnp.asarray(nc), jnp.asarray(tids),
        jnp.asarray(w_arr), None, reduction=red, tile=512,
    )
    out_h = np.asarray(out)
    print(f"pallas scoring compile+run {time.time() - t0:.1f}s", flush=True)

    # XLA reference on a slice
    import jax.numpy as jnp2

    from hcrag_tpu.ops.scoring import (
        entity_match_scores,
        node_type_priority_scores,
        semantic_similarity_scores,
    )

    sl = slice(0, 2000)
    sem = np.asarray(semantic_similarity_scores(q[:8], e[sl]))
    ent = np.asarray(
        entity_match_scores(jnp2.asarray(qb[:8]), jnp2.asarray(nb[sl]))
    )
    typ = np.asarray(
        node_type_priority_scores(jnp2.asarray(intents[:8]), jnp2.asarray(tids[sl]))
    )
    ref_scores = 0.3 * sem + 0.15 * ent + 0.10 * typ
    err = np.abs(out_h[:8, sl] - ref_scores).max()
    print(f"pallas scoring max err vs XLA: {err:.2e}", flush=True)
    print("OK" if err < 1e-3 and setmatch > 0.99 else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
