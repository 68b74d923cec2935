"""Fused relevance-scoring Pallas kernel vs the XLA reference ops."""

import numpy as np
import pytest

from hcrag_tpu.core.types import CompositeWeights, ScorerType, scorer_spec


def _bank(b=4, n=700, d=128, w=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    qb = rng.integers(0, 2**32, (b, w), dtype=np.uint32) & rng.integers(
        0, 2**32, (b, w), dtype=np.uint32
    )
    nb = (
        rng.integers(0, 2**32, (n, w), dtype=np.uint32)
        & rng.integers(0, 2**32, (n, w), dtype=np.uint32)
        & rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    )
    qb[1] = 0  # empty-entity query
    nb[5] = 0  # empty-entity node
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
    llm = rng.uniform(0, 1, (b, n)).astype(np.float32)
    return q, e, qb, nb, qc, nc, tids, intents, llm


def _reference(q, e, qb, nb, tids, intents, llm):
    import jax.numpy as jnp

    from hcrag_tpu.ops.scoring import (
        entity_match_scores,
        node_type_priority_scores,
        semantic_similarity_scores,
    )

    sem = np.asarray(semantic_similarity_scores(q, e))
    ent = np.asarray(entity_match_scores(jnp.asarray(qb), jnp.asarray(nb)))
    typ = np.asarray(
        node_type_priority_scores(jnp.asarray(intents), jnp.asarray(tids))
    )
    return sem, ent, typ


def _run_kernel(bank, scorer, weights=None, tile=256):
    import jax.numpy as jnp

    from hcrag_tpu.ops.scoring_pallas import pallas_batch_relevance

    q, e, qb, nb, qc, nc, tids, intents, llm = bank
    w, red = scorer_spec(scorer, weights)
    return np.asarray(
        pallas_batch_relevance(
            jnp.asarray(q), jnp.asarray(qb), jnp.asarray(qc),
            jnp.asarray(intents), jnp.asarray(e), jnp.asarray(nb),
            jnp.asarray(nc), jnp.asarray(tids), jnp.asarray(w),
            jnp.asarray(llm), reduction=red, tile=tile, interpret=True,
        )
    )


class TestPallasScoring:
    def test_composite_parity(self):
        bank = _bank()
        q, e, qb, nb, qc, nc, tids, intents, llm = bank
        sem, ent, typ = _reference(q, e, qb, nb, tids, intents, llm)
        weights = CompositeWeights(0.4, 0.2, 0.3, 0.1)
        out = _run_kernel(bank, ScorerType.COMPOSITE, weights)
        ref = 0.4 * sem + 0.2 * llm + 0.3 * ent + 0.1 * typ
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_parallel_max_parity(self):
        bank = _bank(seed=3)
        q, e, qb, nb, qc, nc, tids, intents, llm = bank
        sem, ent, typ = _reference(q, e, qb, nb, tids, intents, llm)
        out = _run_kernel(bank, ScorerType.PARALLEL)
        np.testing.assert_allclose(
            out, np.maximum.reduce([sem, llm, ent, typ]), atol=1e-5
        )

    def test_router_variants(self):
        bank = _bank(seed=5, n=300)
        q, e, qb, nb, qc, nc, tids, intents, llm = bank
        sem, ent, typ = _reference(q, e, qb, nb, tids, intents, llm)
        out = _run_kernel(bank, ScorerType.ROUTER)
        np.testing.assert_allclose(out, (sem + llm + typ) / 3, atol=1e-5)
        out2 = _run_kernel(bank, ScorerType.ROUTER_TWO_ENT_TYPE)
        np.testing.assert_allclose(out2, (ent + typ) / 2, atol=1e-5)

    def test_empty_entity_rules(self):
        bank = _bank(seed=7, n=260)
        out = _run_kernel(bank, ScorerType.ROUTER_SINGLE_ENT)
        # query row 1 has zero entities: nodes with empty sets -> 0.5, else 0.1
        nb_counts_zero = 5  # node 5 emptied in _bank
        assert out[1, nb_counts_zero] == pytest.approx(0.5)
        assert out[1, 0] == pytest.approx(0.1)


class TestFusedHostIntegration:
    """`batch_isRelevant`'s large-bank fast path (`_fused_device_scores`)
    must agree with the XLA metric stack it replaces (integration decision:
    benchmarks/scoring_ablation.py, 2.7x at 8k nodes)."""

    def test_fused_path_matches_jnp_path(self):
        from hcrag_tpu.core.types import (
            CompositeWeights,
            NodeInput,
            QueryInput,
            QueryIntent,
            ScorerType,
        )
        from hcrag_tpu.pipeline.isrelevant import (
            _fused_device_scores,
            batch_isRelevant,
        )

        rng = np.random.default_rng(11)
        ents = ["bike", "red", "frame", "manual", "helmet"]
        nodes = [
            NodeInput(
                text=f"n{i}",
                embeddings=rng.standard_normal(128).astype(np.float32),
                graph_relations={},
                node_type=["product", "document", "unknown"][i % 3],
                entities=[ents[i % 5]] if i % 4 else [],
            )
            for i in range(300)
        ]
        query = QueryInput(
            text="red bike",
            embeddings=rng.standard_normal(128).astype(np.float32),
            entities=["red", "bike"],
            intent=QueryIntent.PRODUCT_SEARCH,
        )
        from hcrag_tpu.core.types import scorer_needs_llm
        from hcrag_tpu.pipeline.isrelevant import _batch_process_with_llm

        for st in (ScorerType.COMPOSITE, ScorerType.PARALLEL,
                   ScorerType.ROUTER_TWO_ENT_TYPE):
            ref = batch_isRelevant(query, nodes, st)  # jnp path (small n)
            llm = (
                _batch_process_with_llm(query, nodes, 10, None)
                if scorer_needs_llm(st) else None
            )
            fused = _fused_device_scores(
                query, nodes, st, CompositeWeights(), llm=llm, interpret=True
            )
            np.testing.assert_allclose(fused, ref, atol=2e-5)
