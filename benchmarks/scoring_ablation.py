"""Integrate-or-retire ablation for `ops/scoring_pallas.py`.

The fused-scoring Pallas kernel is validated but unused by the engine (the
fused step scores [B, k]/[B, E] metric stacks with plain jnp, which XLA
fuses into the retrieval program).  The one place a dedicated kernel could
plausibly win is CANDIDATE-BANK scoring at large bank sizes — the agent's
sampled-node scoring and expanded-neighborhood re-scoring paths
(`pallas_batch_relevance`'s actual shape: a query batch against a shared
[N]-node bank).  This measures jnp (`ops/scoring.py`) vs the Pallas kernel
at N in {128, 1024, 8192} on hardware and records the decision.

Usage (TPU): python benchmarks/scoring_ablation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, timed


def time_op(fn, steps=30):
    import jax

    for _ in range(2):
        out = fn()
        jax.block_until_ready(out)
        np.asarray(out)
    t0 = time.time()
    outs = [fn() for _ in range(steps)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1])
    return (time.time() - t0) / steps


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hcrag_tpu.core.types import ScorerType
    from hcrag_tpu.ops.scoring import (
        entity_match_scores,
        node_type_priority_scores,
        semantic_similarity_scores,
    )
    from hcrag_tpu.ops.scoring_pallas import pallas_batch_relevance
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    B, D, W = 256, 384, 8
    weights = jnp.asarray(np.array([0.3, 0.45, 0.15, 0.10], np.float32))
    results = {}
    rng = np.random.default_rng(3)

    @functools.partial(jax.jit, static_argnames=())
    def jnp_path(q_emb, q_bits, q_counts, intents, n_emb, n_bits, n_counts,
                 n_types, w):
        sem = semantic_similarity_scores(q_emb, n_emb)
        inter = jnp.sum(
            jax.lax.population_count(q_bits[:, None, :] & n_bits[None, :, :]),
            axis=-1,
        )
        ratio = inter.astype(jnp.float32) / jnp.maximum(
            q_counts[:, None].astype(jnp.float32), 1.0
        )
        ent = jnp.where(
            (q_counts == 0)[:, None],
            jnp.where((n_counts == 0)[None, :], 0.5, 0.1),
            ratio,
        )
        typ = node_type_priority_scores(intents, n_types)
        llm = jnp.zeros_like(sem)
        metrics = jnp.stack([sem, llm, ent, typ], axis=-1)
        return jnp.einsum("bnm,m->bn", metrics, w)

    for n_nodes in (128, 1024, 8192):
        q_emb = rng.standard_normal((B, D)).astype(np.float32)
        q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
        n_emb = rng.standard_normal((n_nodes, D)).astype(np.float32)
        n_emb /= np.linalg.norm(n_emb, axis=1, keepdims=True)
        q_bits = rng.integers(0, 2**31, (B, W)).astype(np.uint32)
        n_bits = rng.integers(0, 2**31, (n_nodes, W)).astype(np.uint32)
        q_counts = np.asarray(
            [bin(int.from_bytes(row.tobytes(), "little")).count("1")
             for row in q_bits], np.int32)
        n_counts = np.asarray(
            [bin(int.from_bytes(row.tobytes(), "little")).count("1")
             for row in n_bits], np.int32)
        intents = rng.integers(0, 5, B).astype(np.int32)
        n_types = rng.integers(0, 6, n_nodes).astype(np.int32)

        d = {k: jax.device_put(jnp.asarray(v)) for k, v in dict(
            q_emb=q_emb, q_bits=q_bits, q_counts=q_counts, intents=intents,
            n_emb=n_emb, n_bits=n_bits, n_counts=n_counts, n_types=n_types,
        ).items()}
        for v in d.values():
            np.asarray(jnp.sum(v.astype(jnp.float32)))  # residency

        dt_jnp = time_op(lambda: jnp_path(
            d["q_emb"], d["q_bits"], d["q_counts"], d["intents"],
            d["n_emb"], d["n_bits"], d["n_counts"], d["n_types"], weights))
        dt_pal = time_op(lambda: pallas_batch_relevance(
            d["q_emb"], d["q_bits"], d["q_counts"], d["intents"],
            d["n_emb"], d["n_bits"], d["n_counts"], d["n_types"], weights))
        log(
            f"N={n_nodes}: jnp {1000*dt_jnp:.3f} ms, "
            f"pallas {1000*dt_pal:.3f} ms "
            f"({dt_jnp/dt_pal:.2f}x)"
        )
        results[f"n{n_nodes}"] = {
            "jnp_ms": round(1000 * dt_jnp, 3),
            "pallas_ms": round(1000 * dt_pal, 3),
            "pallas_speedup": round(dt_jnp / dt_pal, 2),
        }

    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["fused_scoring_ablation"] = dict(
        results,
        config={"batch": B, "dim": D, "bitset_words": W},
        note=(
            "jnp metric stack (ops/scoring.py, XLA-fused) vs the Pallas "
            "fused-scoring kernel (ops/scoring_pallas.py) on candidate "
            "banks — the integrate-or-retire measurement for the unused "
            "kernel."
        ),
    )
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
