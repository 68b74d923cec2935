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


class TestV0ScorerDetails:
    """Round-4 parity items: content-quality boost factors
    (relevance_scorer_design.py:136-148), single-component confidence
    (:585-590), and the GraphCentralityMetric relationship-weight blend
    (relevance_scorer.py:241-269) — each re-derived independently here."""

    def _query(self):
        q = np.zeros(4, np.float32)
        q[0] = 1.0
        return QueryInput(
            text="q", embeddings=q, entities=[],
            intent=QueryIntent.PRODUCT_SEARCH,
        )

    def _node(self, text="n", relations=None, emb=None, score=0.0,
              node_type="product"):
        if emb is None:
            emb = np.zeros(4, np.float32)
        return NodeInput(
            text=text, embeddings=emb, graph_relations=relations or {},
            node_type=node_type, entities=[], score=score,
        )

    @staticmethod
    def _ref_v0_semantic(similarity_score, content_embedding, query_embedding,
                         content_length, content_quality):
        """Literal transcription of SemanticSimilarityScorer.score
        (relevance_scorer_design.py:115-148)."""
        if similarity_score > 0:
            base_score = similarity_score
        elif content_embedding is not None:
            base_score = max(0, float(np.dot(query_embedding,
                                             content_embedding)))
        else:
            base_score = 0.0
        boost_factor = 1.0
        if content_length > 100:
            boost_factor *= 1.1
        if content_quality > 0.8:
            boost_factor *= 1.15
        return min(1.0, base_score * boost_factor)

    def test_content_boost_factors_all_cells(self):
        from hcrag_tpu.pipeline.scorer_designs import v0_content_boost

        for length in (0, 100, 101, 5000):
            for quality in (0.0, 0.8, 0.81, 1.0):
                expected = 1.0
                if length > 100:
                    expected *= 1.1
                if quality > 0.8:
                    expected *= 1.15
                assert v0_content_boost(length, quality) == pytest.approx(
                    expected
                ), (length, quality)

    def test_v0_semantic_metric_matches_reference(self):
        from hcrag_tpu.pipeline.scorer_designs import (
            V0SemanticSimilarityMetric,
        )

        q = self._query()
        emb = np.zeros(4, np.float32)
        emb[0] = 0.6
        cases = [
            # (precomputed score, relations, expected base source)
            (0.5, {}, 0.5),                             # precomputed wins
            (0.0, {}, 0.6),                             # fresh dot product
            (0.95, {"content_length": 200}, 0.95),      # substantial boost
            (0.95, {"content_length": 200,
                    "content_quality": 0.9}, 0.95),     # both boosts, cap
            (0.5, {"content_quality": 0.9}, 0.5),       # quality boost only
        ]
        nodes = [self._node(relations=dict(rel), emb=emb, score=s)
                 for s, rel, _ in cases]
        got = V0SemanticSimilarityMetric().score_batch(q, nodes)
        for i, (s, rel, base) in enumerate(cases):
            expected = self._ref_v0_semantic(
                s, emb, q.embeddings,
                rel.get("content_length", 2), rel.get("content_quality", 0.0),
            )
            assert got[i] == pytest.approx(expected, abs=1e-6), cases[i]
        # the both-boosts case must actually hit the 1.0 cap
        assert got[3] == pytest.approx(1.0)

    def test_single_component_confidence_is_half(self):
        """v0 reports confidence 0.5 with one component, not 1 - std == 1.0
        (relevance_scorer_design.py:585-590)."""
        metrics = [_StubMetric("semantic_similarity", np.array([0.9, 0.2]))]
        scorer = DynamicWeightScorer(metrics=metrics)
        rows = scorer.explain(
            self._query(),
            [self._node(node_type="product"),
             self._node(node_type="document")],
        )
        assert all(r["confidence"] == pytest.approx(0.5) for r in rows)
        metrics2 = [
            _StubMetric("semantic_similarity", np.array([0.9])),
            _StubMetric("llm_judge", np.array([0.5])),
        ]
        rows2 = DynamicWeightScorer(metrics=metrics2).explain(
            self._query(), [self._node()]
        )
        assert rows2[0]["confidence"] == pytest.approx(1.0 - 0.2)

    @staticmethod
    def _ref_centrality(relations):
        """Literal transcription of GraphCentralityMetric.calculate
        (relevance_scorer.py:244-266)."""
        incoming_count = len(relations.get("incoming", []))
        outgoing_count = len(relations.get("outgoing", []))
        total_degree = incoming_count + outgoing_count
        degree_score = min(total_degree / 50, 1.0)
        relationship_weights = relations.get("relationship_weights", {})
        if relationship_weights:
            weighted = (sum(relationship_weights.values())
                        / len(relationship_weights))
            degree_score = (degree_score + weighted) / 2
        return degree_score

    def test_centrality_relationship_weight_blend(self):
        from hcrag_tpu.pipeline.scorer_designs import GraphCentralityMetric

        cases = [
            {"incoming": list(range(10)), "outgoing": list(range(5))},
            {"incoming": list(range(60)), "outgoing": []},
            {"incoming": list(range(10)),
             "relationship_weights": {"a": 0.9, "b": 0.3}},
            {"incoming": list(range(100)), "outgoing": list(range(100)),
             "relationship_weights": {"x": 0.5}},
            {"relationship_weights": {"only": 1.0}},
            {},
        ]
        nodes = [self._node(relations=dict(r)) for r in cases]
        got = GraphCentralityMetric().score_batch(self._query(), nodes)
        for i, rel in enumerate(cases):
            assert got[i] == pytest.approx(self._ref_centrality(rel)), rel

    def test_centrality_legacy_degree_keys_still_work(self):
        from hcrag_tpu.pipeline.scorer_designs import GraphCentralityMetric

        nodes = [
            self._node(relations={"degree": 25}),
            self._node(relations={"neighbors": list(range(10))}),
        ]
        got = GraphCentralityMetric().score_batch(self._query(), nodes)
        assert got[0] == pytest.approx(0.5)
        assert got[1] == pytest.approx(0.2)
