"""Mathematical ground-truth tests for the scoring kernels.

Ports the reference's kernel-identity assertions
(`/root/reference/tests/unit/test_milestone1_core_components.py:108-263`):
cosine normalization identities (1.0 / 0.0 / 0.5), entity-match fractions and
empty-set rules, and priority-matrix lookups — re-expressed against the
vectorized JAX ops.
"""

import numpy as np
import pytest

from hcrag_tpu.core.types import (
    INTENT_ORDER,
    NODE_TYPES,
    PRIORITY_MATRIX,
    CompositeWeights,
    QueryIntent,
    ScorerType,
    node_type_id,
    scorer_spec,
)
from hcrag_tpu.core.vocab import EntityVocab
from hcrag_tpu.ops.scoring import (
    batch_relevance,
    entity_match_scores,
    node_type_priority_scores,
    semantic_similarity_scores,
)


class TestSemanticSimilarity:
    def test_identical_embeddings_score_one(self):
        v = np.random.default_rng(0).standard_normal(384).astype(np.float32)
        out = semantic_similarity_scores(v, v[None, :])
        assert np.allclose(np.asarray(out), 1.0, atol=1e-5)

    def test_opposite_embeddings_score_zero(self):
        v = np.random.default_rng(1).standard_normal(384).astype(np.float32)
        out = semantic_similarity_scores(v, -v[None, :])
        assert np.allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_orthogonal_embeddings_score_half(self):
        a = np.zeros(384, np.float32)
        b = np.zeros(384, np.float32)
        a[0] = 1.0
        b[1] = 1.0
        out = semantic_similarity_scores(a, b[None, :])
        assert np.allclose(np.asarray(out), 0.5, atol=1e-6)

    def test_batch_shape_and_range(self):
        rng = np.random.default_rng(2)
        q = rng.standard_normal((3, 384)).astype(np.float32)
        nodes = rng.standard_normal((17, 384)).astype(np.float32)
        out = np.asarray(semantic_similarity_scores(q, nodes))
        assert out.shape == (3, 17)
        assert (out >= 0.0 - 1e-6).all() and (out <= 1.0 + 1e-6).all()

    def test_matches_sklearn_formula(self):
        rng = np.random.default_rng(3)
        q = rng.standard_normal(384).astype(np.float32)
        nodes = rng.standard_normal((11, 384)).astype(np.float32)
        out = np.asarray(semantic_similarity_scores(q, nodes))
        qn = q / np.linalg.norm(q)
        nn = nodes / np.linalg.norm(nodes, axis=1, keepdims=True)
        expected = (nn @ qn + 1.0) / 2.0
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestEntityMatch:
    def _score(self, query_entities, node_entities):
        vocab = EntityVocab.build([node_entities])
        nb, _ = vocab.encode_batch([node_entities])
        qb, oov = vocab.encode(query_entities)
        out = entity_match_scores(qb, nb, query_oov=np.int32(oov))
        return float(np.asarray(out)[0])

    def test_exact_match_full(self):
        assert self._score(["red", "bike"], ["red", "bike"]) == pytest.approx(1.0)

    def test_half_match(self):
        assert self._score(["red", "bike"], ["red", "car"]) == pytest.approx(0.5)

    def test_no_match(self):
        assert self._score(["red", "bike"], ["blue", "car"]) == pytest.approx(0.0)

    def test_empty_query_empty_node(self):
        assert self._score([], []) == pytest.approx(0.5)

    def test_empty_query_nonempty_node(self):
        assert self._score([], ["bike"]) == pytest.approx(0.1)

    def test_oov_query_entities_count_in_denominator(self):
        # "unicorn" is not in any node's entity set: it can never match but
        # still inflates |q| (reference uses raw Python sets).
        assert self._score(["red", "unicorn"], ["red", "bike"]) == pytest.approx(0.5)

    def test_duplicate_entities_are_set_semantics(self):
        assert self._score(["red", "red", "bike"], ["red", "bike"]) == pytest.approx(
            1.0
        )


class TestNodeTypePriority:
    def test_full_matrix_matches_reference_values(self):
        # Reference dict from isRelevant.py:128-169
        expected = {
            QueryIntent.PRODUCT_SEARCH: dict(
                product=1.0, category=0.8, specification=0.6,
                document=0.3, annotation=0.2, unknown=0.1,
            ),
            QueryIntent.DOCUMENT_REQUEST: dict(
                document=1.0, specification=0.7, annotation=0.6,
                product=0.4, category=0.2, unknown=0.1,
            ),
            QueryIntent.TECHNICAL_SUPPORT: dict(
                document=1.0, specification=0.9, annotation=0.7,
                product=0.6, category=0.3, unknown=0.1,
            ),
            QueryIntent.COMPARISON_REQUEST: dict(
                product=1.0, specification=0.8, category=0.6,
                document=0.4, annotation=0.3, unknown=0.1,
            ),
            QueryIntent.SPECIFICATION_INQUIRY: dict(
                specification=1.0, product=0.7, annotation=0.6,
                document=0.5, category=0.3, unknown=0.1,
            ),
        }
        for intent, row in expected.items():
            for node_type, value in row.items():
                i, t = intent.index, NODE_TYPES.index(node_type)
                assert PRIORITY_MATRIX[i, t] == pytest.approx(value), (
                    intent, node_type,
                )

    def test_gather_op(self):
        type_ids = np.array(
            [node_type_id(t) for t in ["product", "document", "weird_type"]],
            dtype=np.int32,
        )
        out = np.asarray(
            node_type_priority_scores(
                np.int32(QueryIntent.PRODUCT_SEARCH.index), type_ids
            )
        )
        np.testing.assert_allclose(out, [1.0, 0.3, 0.1], atol=1e-6)

    def test_unknown_type_maps_to_unknown_bucket(self):
        assert node_type_id("not_a_type") == NODE_TYPES.index("unknown")
        assert node_type_id("Product") == NODE_TYPES.index("product")


class TestCompositeWeights:
    def test_defaults(self):
        w = CompositeWeights()
        assert w.semantic_similarity == pytest.approx(0.3)
        assert w.llm_judge == pytest.approx(0.45)
        assert w.entity_match == pytest.approx(0.15)
        assert w.node_type_priority == pytest.approx(0.10)

    def test_sum_validation(self):
        with pytest.raises(ValueError, match="sum to 1.0"):
            CompositeWeights(0.5, 0.5, 0.5, 0.5)

    def test_negativity_validation(self):
        with pytest.raises(ValueError, match="non-negative"):
            CompositeWeights(-0.1, 0.6, 0.3, 0.2)

    def test_presets(self):
        assert CompositeWeights.create_balanced().as_array().tolist() == [
            0.25, 0.25, 0.25, 0.25,
        ]
        assert CompositeWeights.create_semantic_focused().semantic_similarity == 0.6
        assert CompositeWeights.create_llm_focused().llm_judge == 0.6
        assert CompositeWeights.create_entity_focused().entity_match == 0.4

    def test_dict_roundtrip(self):
        w = CompositeWeights(0.4, 0.3, 0.2, 0.1)
        assert CompositeWeights.from_dict(w.to_dict()) == w


class TestScorerStrategies:
    """Every strategy formula vs a NumPy re-derivation (isRelevant.py:479-501)."""

    def setup_method(self):
        rng = np.random.default_rng(7)
        self.n = 13
        self.sem = rng.uniform(0, 1, self.n).astype(np.float32)
        self.llm = rng.uniform(0, 1, self.n).astype(np.float32)
        self.ent = rng.uniform(0, 1, self.n).astype(np.float32)
        self.typ = rng.uniform(0, 1, self.n).astype(np.float32)

    def _apply(self, scorer_type, weights=None):
        from hcrag_tpu.ops.scoring import combine_metrics
        import jax.numpy as jnp

        metrics = np.stack([self.sem, self.llm, self.ent, self.typ], axis=-1)
        w, reduction = scorer_spec(scorer_type, weights)
        return np.asarray(combine_metrics(jnp.asarray(metrics), jnp.asarray(w), reduction))

    def test_composite_default(self):
        out = self._apply(ScorerType.COMPOSITE)
        exp = 0.3 * self.sem + 0.45 * self.llm + 0.15 * self.ent + 0.1 * self.typ
        np.testing.assert_allclose(out, exp, atol=1e-6)

    def test_composite_custom_weights(self):
        w = CompositeWeights(0.4, 0.3, 0.2, 0.1)
        out = self._apply(ScorerType.COMPOSITE, w)
        exp = 0.4 * self.sem + 0.3 * self.llm + 0.2 * self.ent + 0.1 * self.typ
        np.testing.assert_allclose(out, exp, atol=1e-6)

    def test_parallel_is_max(self):
        out = self._apply(ScorerType.PARALLEL)
        exp = np.max(np.stack([self.sem, self.llm, self.ent, self.typ]), axis=0)
        np.testing.assert_allclose(out, exp, atol=1e-6)

    def test_router(self):
        out = self._apply(ScorerType.ROUTER)
        np.testing.assert_allclose(
            out, (self.sem + self.llm + self.typ) / 3, atol=1e-6
        )

    def test_router_all(self):
        out = self._apply(ScorerType.ROUTER_ALL)
        np.testing.assert_allclose(
            out, (self.sem + self.llm + self.ent + self.typ) / 4, atol=1e-6
        )

    def test_router_two_variants(self):
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_TWO_SEM_LLM),
            (self.sem + self.llm) / 2,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_TWO_ENT_TYPE),
            (self.ent + self.typ) / 2,
            atol=1e-6,
        )

    def test_singles(self):
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_SINGLE_SEM), self.sem, atol=1e-6
        )
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_SINGLE_LLM), self.llm, atol=1e-6
        )
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_SINGLE_ENT), self.ent, atol=1e-6
        )
        np.testing.assert_allclose(
            self._apply(ScorerType.ROUTER_SINGLE_TYPE), self.typ, atol=1e-6
        )


class TestBatchRelevanceEndToEnd:
    """batch_relevance vs a straight-line NumPy port of batch_isRelevant."""

    def test_composite_without_llm_matches_numpy(self):
        rng = np.random.default_rng(11)
        n, d = 9, 384
        q_emb = rng.standard_normal(d).astype(np.float32)
        node_emb = rng.standard_normal((n, d)).astype(np.float32)
        node_entities = [["red", "bike"], ["blue"], []] * 3
        q_entities = ["red", "bike", "zzz_oov"]
        types = ["product", "document", "unknown"] * 3

        vocab = EntityVocab.build(node_entities)
        nb, _ = vocab.encode_batch(node_entities)
        qb, oov = vocab.encode(q_entities)
        type_ids = np.array([node_type_id(t) for t in types], np.int32)

        out = np.asarray(
            batch_relevance(
                query_emb=q_emb,
                query_bits=qb,
                intent_id=QueryIntent.PRODUCT_SEARCH.index,
                node_emb=node_emb,
                node_bits=nb,
                node_type_ids=type_ids,
                scorer_type=ScorerType.COMPOSITE,
                query_oov=oov,
            )
        )

        # NumPy reference path (llm column = 0, as when no judge is attached)
        qn = q_emb / np.linalg.norm(q_emb)
        nn = node_emb / np.linalg.norm(node_emb, axis=1, keepdims=True)
        sem = (nn @ qn + 1) / 2
        qset = set(e for e in q_entities)
        ent = np.array(
            [
                len(qset & set(ne)) / len(qset) if qset else (0.5 if not ne else 0.1)
                for ne in node_entities
            ]
        )
        typ = np.array(
            [PRIORITY_MATRIX[QueryIntent.PRODUCT_SEARCH.index, node_type_id(t)] for t in types]
        )
        exp = 0.3 * sem + 0.45 * 0.0 + 0.15 * ent + 0.1 * typ
        np.testing.assert_allclose(out, exp, atol=1e-5)

    def test_llm_scores_column_feeds_through(self):
        rng = np.random.default_rng(12)
        n, d = 4, 16
        q_emb = rng.standard_normal(d).astype(np.float32)
        node_emb = rng.standard_normal((n, d)).astype(np.float32)
        vocab = EntityVocab.build([["x"]])
        nb, _ = vocab.encode_batch([["x"]] * n)
        qb, oov = vocab.encode(["x"])
        type_ids = np.zeros(n, np.int32)
        llm = np.array([0.9, 0.1, 0.5, 0.7], np.float32)

        out_single_llm = np.asarray(
            batch_relevance(
                query_emb=q_emb,
                query_bits=qb,
                intent_id=0,
                node_emb=node_emb,
                node_bits=nb,
                node_type_ids=type_ids,
                scorer_type=ScorerType.ROUTER_SINGLE_LLM,
                llm_scores=llm,
                query_oov=oov,
            )
        )
        np.testing.assert_allclose(out_single_llm, llm, atol=1e-6)
