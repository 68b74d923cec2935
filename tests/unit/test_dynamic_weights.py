"""v0 dynamic per-(intent, node-type) weight parity.

The reference's first scorer design dispatches per-component weights on
(query intent, node type) via `get_weight` methods and combines with a
weighted average + consistency confidence
(relevance_scorer_design.py:104-111, 151-168, 257-265, 374-385, 419-427,
500-502, 546-595).  These tests re-derive those rules INDEPENDENTLY in
NumPy/Python and check the repo's tensorized form cell-for-cell, then check
the device-side fused reduction against the same math.
"""

import numpy as np
import pytest

from hcrag_tpu.core.types import (
    INTENT_ORDER,
    NODE_TYPES,
    NodeInput,
    QueryInput,
    QueryIntent,
)
from hcrag_tpu.pipeline.scorer_designs import (
    DESIGN_INTENT_ORDER,
    DESIGN_TYPE_ORDER,
    DESIGN_UNKNOWN_TYPE,
    V0_COMPONENT_ORDER,
    DesignNodeType,
    DesignQueryIntent,
    DynamicWeightScorer,
    RelevanceMetric,
    canonical_dynamic_weight_tensor,
    v0_weight_tensor,
)


def _ref_get_weight(component, intent, node_type):
    """Literal transcription of the five reference get_weight bodies,
    kept deliberately separate from the library's implementation."""
    if component == "semantic_similarity":  # :151-163
        base = 0.3
        if intent == "document_request":
            return base + 0.1
        if node_type in ("pdf_chunk", "annotation"):
            return base + 0.05
        return base
    if component == "llm_judge":  # :257-265
        base = 0.25
        if intent in ("comparison", "troubleshooting"):
            return base + 0.1
        return base
    if component == "entity_match":  # :374-385
        base = 0.2
        if intent == "product_search" and node_type == "product":
            return base + 0.15
        if intent == "document_request" and node_type in (
            "document", "pdf_chunk",
        ):
            return base + 0.1
        return base
    if component == "graph_centrality":  # :419-427
        base = 0.15
        if intent in ("compatibility", "comparison"):
            return base + 0.05
        return base
    if component == "data_type_priority":  # :500-502
        return 0.1
    raise KeyError(component)


class TestWeightTensorParity:
    def test_every_cell_matches_reference_rules(self):
        w = v0_weight_tensor()
        assert w.shape == (5, 6, 7)
        for ci, comp in enumerate(V0_COMPONENT_ORDER):
            for ii, intent in enumerate(DESIGN_INTENT_ORDER):
                for ti, ntype in enumerate(DESIGN_TYPE_ORDER):
                    want = _ref_get_weight(comp, intent.value, ntype.value)
                    assert w[ci, ii, ti] == pytest.approx(want), (
                        comp, intent, ntype,
                    )
                # unknown column: no type-conditional rule fires
                want = _ref_get_weight(comp, intent.value, "unknown")
                assert w[ci, ii, DESIGN_UNKNOWN_TYPE] == pytest.approx(want)

    def test_canonical_projection_matches_reference_rules(self):
        """[4, 5, 6] engine tensor: same rules through the intent/type
        taxonomy mapping (TECHNICAL_SUPPORT->troubleshooting,
        COMPARISON_REQUEST->comparison, specification->json_table, ...)."""
        w = canonical_dynamic_weight_tensor()
        assert w.shape == (4, len(INTENT_ORDER), len(NODE_TYPES))
        intent_map = {
            QueryIntent.PRODUCT_SEARCH: "product_search",
            QueryIntent.DOCUMENT_REQUEST: "document_request",
            QueryIntent.TECHNICAL_SUPPORT: "troubleshooting",
            QueryIntent.COMPARISON_REQUEST: "comparison",
            QueryIntent.SPECIFICATION_INQUIRY: "specification",
        }
        type_map = {
            "product": "product", "category": "category",
            "specification": "json_table", "document": "document",
            "annotation": "annotation", "unknown": "unknown",
        }
        comps = ["semantic_similarity", "llm_judge", "entity_match",
                 "data_type_priority"]
        for ci, comp in enumerate(comps):
            for ii, intent in enumerate(INTENT_ORDER):
                for ti, tname in enumerate(NODE_TYPES):
                    want = _ref_get_weight(
                        comp, intent_map[intent], type_map[tname]
                    )
                    assert w[ci, ii, ti] == pytest.approx(want)


class _StubMetric(RelevanceMetric):
    def __init__(self, name, values):
        self.name = name
        self._values = values

    def score_batch(self, query, nodes):
        return list(self._values[: len(nodes)])


class TestDynamicWeightScorerCombination:
    def _nodes(self, types):
        return [
            NodeInput(
                text=f"n{i}", embeddings=np.zeros(4, np.float32),
                graph_relations={}, node_type=t, entities=[],
            )
            for i, t in enumerate(types)
        ]

    def _query(self, intent):
        return QueryInput(
            text="q", embeddings=np.zeros(4, np.float32), entities=[],
            intent=intent,
        )

    def test_weighted_average_matches_reference_combiner(self):
        """_score_single_node: total_weighted_score / total_weights
        (relevance_scorer_design.py:546-580), for every v0 intent over all
        node types, with arbitrary component scores."""
        rng = np.random.default_rng(0)
        types = [t.value for t in DesignNodeType] + ["mystery_type"]
        scores = rng.uniform(size=(5, len(types)))
        metrics = [
            _StubMetric(name, scores[i])
            for i, name in enumerate(V0_COMPONENT_ORDER)
        ]
        # node_type_priority is the metric-class name for data_type_priority
        metrics[4].name = "node_type_priority"
        scorer = DynamicWeightScorer(metrics=metrics)
        for intent in DesignQueryIntent:
            got = scorer.score_batch(self._query(intent), self._nodes(types))
            for ni, tname in enumerate(types):
                tw, ts = 0.0, 0.0
                for ci, comp in enumerate(V0_COMPONENT_ORDER):
                    weight = _ref_get_weight(
                        comp, intent.value,
                        tname if tname != "mystery_type" else "unknown",
                    )
                    tw += weight
                    ts += weight * scores[ci, ni]
                assert got[ni] == pytest.approx(ts / tw), (intent, tname)

    def test_confidence_is_one_minus_std(self):
        scores = np.array([
            [0.9, 0.1], [0.9, 0.9], [0.9, 0.1], [0.9, 0.9], [0.9, 0.1],
        ])
        metrics = [
            _StubMetric(name, scores[i])
            for i, name in enumerate(V0_COMPONENT_ORDER)
        ]
        scorer = DynamicWeightScorer(metrics=metrics)
        rows = scorer.explain(
            self._query(DesignQueryIntent.PRODUCT_SEARCH),
            self._nodes(["product", "document"]),
        )
        assert rows[0]["confidence"] == pytest.approx(1.0 - 0.0)
        assert rows[1]["confidence"] == pytest.approx(
            float(np.clip(1.0 - np.std(scores[:, 1]), 0.0, 1.0))
        )

    def test_canonical_intent_maps_to_v0_rules(self):
        """TECHNICAL_SUPPORT uses the troubleshooting llm_judge bump."""
        scorer = DynamicWeightScorer()
        w = scorer.node_weights(
            self._query(QueryIntent.TECHNICAL_SUPPORT),
            self._nodes(["product"]),
        )
        # metric order: sem, llm, ent, centrality, type_priority
        assert w[0, 1] == pytest.approx(0.35)  # llm_judge 0.25 + 0.1


class TestFusedDynamicReduction:
    def test_combine_metrics_dynamic_matches_numpy(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.scoring import combine_metrics_dynamic

        rng = np.random.default_rng(1)
        B, K, M, I, T = 3, 7, 4, 5, 6
        metrics = rng.uniform(size=(B, K, M)).astype(np.float32)
        w = rng.uniform(0.05, 0.5, size=(M, I, T)).astype(np.float32)
        intents = rng.integers(0, I, size=B).astype(np.int32)
        tids = rng.integers(0, T, size=(B, K)).astype(np.int32)
        got = np.asarray(
            combine_metrics_dynamic(
                jnp.asarray(metrics), jnp.asarray(w),
                jnp.asarray(intents)[:, None], jnp.asarray(tids),
            )
        )
        for b in range(B):
            for k in range(K):
                wv = w[:, intents[b], tids[b, k]]
                want = float(wv @ metrics[b, k] / wv.sum())
                assert got[b, k] == pytest.approx(want, rel=1e-5)

    def test_engine_dynamic_tensor_equals_composite_when_uniform(self):
        """A dynamic tensor that is CONSTANT across (intent, type) and sums
        to 1 across metrics must reproduce the plain composite reduction —
        the normalization divides by 1."""
        from hcrag_tpu.core.types import CompositeWeights
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        index = synthetic_dense_index(512, 128, seed=3)
        eng = QueryEngine(index, None)
        q = np.asarray(index.emb[11], dtype=np.float32)
        cw = CompositeWeights()
        flat = np.array(
            [cw.semantic_similarity, cw.llm_judge, cw.entity_match,
             cw.node_type_priority],
            np.float32,
        )
        dyn = np.broadcast_to(
            flat[:, None, None], (4, len(INTENT_ORDER), len(NODE_TYPES))
        ).copy()
        r_dyn = eng.query_batch(q, top_k=5, dynamic_weight_tensor=dyn)
        r_ref = eng.query_batch(q, top_k=5, weights=cw)
        np.testing.assert_array_equal(r_dyn.top_indices, r_ref.top_indices)
        np.testing.assert_allclose(
            r_dyn.relevance, r_ref.relevance, atol=1e-6
        )

    def test_engine_dynamic_tensor_varies_by_type(self):
        """A tensor favoring the type-priority metric for one intent must
        change relevance vs the composite default (sanity that the gather
        actually reads the (intent, type) cells)."""
        from hcrag_tpu.pipeline.scorer_designs import (
            canonical_dynamic_weight_tensor,
        )
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        index = synthetic_dense_index(512, 128, seed=4)
        eng = QueryEngine(index, None)
        q = np.asarray(index.emb[7], dtype=np.float32)
        dyn = canonical_dynamic_weight_tensor()
        res = eng.query_batch(q, top_k=5, dynamic_weight_tensor=dyn)
        ref = eng.query_batch(q, top_k=5)
        assert res.top_indices.shape == ref.top_indices.shape
        assert not np.allclose(res.relevance, ref.relevance)
