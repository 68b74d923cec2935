"""Retrieval parity: QueryEngine vs NumPy brute force on the real index.

The acceptance bar from BASELINE.md: exact-match recall@10 (1.0) against the
reference's brute-force cosine ranking (`main.py:831-857`) on the shipped
585-vector artifact, across many queries.
"""

import numpy as np
import pytest

from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.core.types import QueryIntent, ScorerType
from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.query.engine import QueryEngine

DATA_DIR = "/root/reference/data"


def reference_find_similar(emb_matrix, query_embedding, top_k, threshold):
    """Line-for-line NumPy port of find_similar_content (main.py:831-857)."""
    qn = query_embedding / np.linalg.norm(query_embedding)
    en = emb_matrix / np.linalg.norm(emb_matrix, axis=1, keepdims=True)
    similarities = en @ qn
    top_indices = np.argsort(similarities)[::-1][:top_k]
    return [
        (int(i), float(similarities[i]))
        for i in top_indices
        if similarities[i] >= threshold
    ]


@pytest.fixture(scope="module")
def raw_embeddings(reference_pickle_path):
    import pickle

    with open(reference_pickle_path, "rb") as f:
        return np.asarray(pickle.load(f)["embeddings"], dtype=np.float32)


@pytest.fixture(scope="module")
def bundle(reference_pickle_path):
    return build_adventureworks(
        DATA_DIR, reference_pickle=reference_pickle_path
    )


@pytest.fixture(scope="module")
def engine(bundle):
    return QueryEngine(bundle.index, bundle.graph)


class TestRetrievalParity:
    def test_recall_at_10_is_exact_for_index_rows(self, engine, raw_embeddings):
        # Every 10th stored vector as the query: retrieved sets must match
        # brute force exactly (including self at rank 0).
        for row in range(0, 585, 10):
            q = raw_embeddings[row]
            ref = reference_find_similar(raw_embeddings, q, 10, 0.0)
            got = engine.find_similar_content(q, top_k=10, similarity_threshold=0.0)
            ref_ids = {i for i, _ in ref}
            got_ids = {
                engine.index.metadata.index(r["metadata"]) for r in got
            }
            assert got_ids == ref_ids, f"row {row}"
            # rank-0 self match with score ~1
            assert got[0]["metadata"] is engine.index.metadata[row]
            assert got[0]["similarity_score"] == pytest.approx(1.0, abs=1e-4)

    def test_recall_for_random_queries(self, engine, raw_embeddings, rng):
        for _ in range(20):
            q = rng.standard_normal(384).astype(np.float32)
            ref = reference_find_similar(raw_embeddings, q, 10, -1.0)
            res = engine.query_batch(q, top_k=10)
            got_ids = res.top_indices[0].tolist()
            ref_ids = [i for i, _ in ref]
            assert set(got_ids) == set(ref_ids)
            # scores agree to float32 matmul tolerance
            ref_scores = dict(ref)
            for i, s in zip(got_ids, res.top_scores[0]):
                assert s == pytest.approx(ref_scores[i], abs=2e-5)

    def test_threshold_filter(self, engine, raw_embeddings):
        q = raw_embeddings[0]
        strict = engine.find_similar_content(q, top_k=10, similarity_threshold=0.99)
        loose = engine.find_similar_content(q, top_k=10, similarity_threshold=0.0)
        assert len(strict) <= len(loose)
        assert all(r["similarity_score"] >= 0.99 for r in strict)

    def test_batched_queries_match_individual(self, engine, raw_embeddings):
        batch = raw_embeddings[[3, 77, 300]]
        res_b = engine.query_batch(batch, top_k=5)
        for i, row in enumerate([3, 77, 300]):
            res_1 = engine.query_batch(raw_embeddings[row], top_k=5)
            np.testing.assert_array_equal(
                res_b.top_indices[i], res_1.top_indices[0]
            )

    def test_category_filtered_search(self, engine, raw_embeddings):
        q = raw_embeddings[580]  # a pdf chunk
        res = engine.query_batch(q, top_k=5, category_filter="pdf_document")
        for idx in res.top_indices[0]:
            assert engine.index.metadata[int(idx)]["type"] == "pdf_document"
        # unfiltered search on the same query must rank that pdf row first
        res_all = engine.query_batch(q, top_k=5)
        assert res_all.top_indices[0][0] == 580

    def test_search_by_category_api_shape(self, engine):
        out = engine.search_by_category("mountain bike", "database_table", top_k=3)
        assert len(out["results"]) == 3
        assert out["results"][0]["rank"] == 1
        assert "database_table" in out["summary"] or "all" in out["summary"]
        empty = engine.search_by_category("anything", "nonexistent_type")
        assert empty["results"] == []
        assert empty["summary"] == "No items match the filter criteria"

    def test_search_by_category_never_leaks_masked_rows(self, bundle):
        """With the Pallas kernels, masked-out rows carry NEG_INF=-1e30
        (finite) scores and packed int8 pad slots carry idx -1; when the
        category has fewer matches than top_k, only true matches may be
        returned (reference: main.py:859-905 filters indices up front) and
        ranks must be contiguous over the returned list."""
        from hcrag_tpu.query.engine import QueryEngine as QE

        for opts in (
            {"use_pallas": True, "pallas_interpret": True},
            {"quantize_int8": True, "pallas_interpret": True},
        ):
            eng = QE(bundle.index, bundle.graph, **opts)
            # json_table has only 6 rows in the artifact; ask for 10.
            out = eng.search_by_category("product table", "json_table", top_k=10)
            assert 0 < len(out["results"]) <= 6, opts
            for r in out["results"]:
                assert r["metadata"]["type"] == "json_table", opts
                assert r["similarity_score"] > -1e29, opts
            assert [r["rank"] for r in out["results"]] == list(
                range(1, len(out["results"]) + 1)
            ), opts


class TestFusedRelevance:
    def test_relevance_scores_match_standalone_op(self, engine, raw_embeddings):
        from hcrag_tpu.core.types import PRIORITY_MATRIX, node_type_id

        q = raw_embeddings[0]
        entities = ["black", "road bike"]
        res = engine.query_batch(
            q,
            top_k=5,
            intents=[QueryIntent.PRODUCT_SEARCH],
            entity_lists=[entities],
            scorer_type=ScorerType.COMPOSITE,
        )
        # NumPy recompute on retrieved rows
        idx = engine.index
        qb, oov = idx.vocab.encode(entities)
        qn = q / np.linalg.norm(q)
        for j, row in enumerate(res.top_indices[0]):
            row = int(row)
            emb_row = np.asarray(idx.emb[row], np.float32)
            sem = (emb_row @ qn + 1) / 2
            row_bits = idx.entity_bits[row]
            inter = bin(
                int.from_bytes(
                    (qb & row_bits).tobytes(), "little"
                )
            ).count("1")
            qc = bin(int.from_bytes(qb.tobytes(), "little")).count("1") + oov
            if qc == 0:
                ent = 0.5 if idx.entity_counts[row] == 0 else 0.1
            else:
                ent = inter / qc
            typ = PRIORITY_MATRIX[
                QueryIntent.PRODUCT_SEARCH.index, idx.type_ids[row]
            ]
            expected = 0.3 * sem + 0.45 * 0.0 + 0.15 * ent + 0.1 * typ
            assert res.relevance[0, j] == pytest.approx(expected, abs=1e-5)
            combined = 0.7 * expected + 0.3 * res.top_scores[0, j]
            assert res.combined[0, j] == pytest.approx(combined, abs=1e-5)


class TestExpansion:
    def test_expansion_returns_whitelisted_neighbors(self, engine):
        # Query with a product row that has DESCRIBED_BY edges: expansion
        # must return only Document/Annotation/Product nodes connected via
        # the whitelist, in deterministic order.
        g = engine.graph
        from hcrag_tpu.core.types import edge_type_id

        # find a product row whose node has whitelisted edges
        wl = {edge_type_id("ANNOTATION"), edge_type_id("DESCRIBED_BY")}
        target_row = None
        for row in range(engine.index.n):
            node = engine.index.graph_ids[row]
            if node < 0:
                continue
            nbrs, types = g.neighbors_of(int(node))
            if any(int(t) in wl for t in types):
                target_row = row
                break
        assert target_row is not None
        q = np.asarray(engine.index.emb[target_row], np.float32)
        res = engine.query_batch(q, top_k=1, expansion_depth=1, max_expanded=20)
        assert res.top_indices[0][0] == target_row
        count = int(res.expanded_counts[0])
        assert count > 0
        expanded = res.expanded_nodes[0][:count]
        node = int(engine.index.graph_ids[target_row])
        allowed_nbrs = {
            int(nb)
            for nb, t in zip(*g.neighbors_of(node))
            if int(t) in wl
        }
        assert set(expanded.tolist()) <= allowed_nbrs

    def test_depth2_reaches_annotations_from_product(self, engine):
        g = engine.graph
        # A product described by a document with annotations: depth-2 must
        # reach the annotations (the reference Product query's 2-hop UNION,
        # subgraph_expander.py:210-218).
        from hcrag_tpu.core.types import edge_type_id

        et_db = edge_type_id("DESCRIBED_BY")
        et_an = edge_type_id("ANNOTATION")
        prod_node = doc_node = None
        for n in range(g.num_nodes):
            if g.node_labels[n] != "Product":
                continue
            nbrs, types = g.neighbors_of(n)
            for nb, t in zip(nbrs, types):
                if int(t) == et_db:
                    nbrs2, types2 = g.neighbors_of(int(nb))
                    if any(int(t2) == et_an for t2 in types2):
                        prod_node, doc_node = n, int(nb)
                        break
            if prod_node is not None:
                break
        assert prod_node is not None
        row = int(g.node_to_row[prod_node])
        assert row >= 0
        q = np.asarray(engine.index.emb[row], np.float32)
        res = engine.query_batch(
            q, top_k=1, expansion_depth=2, max_expanded=30
        )
        count = int(res.expanded_counts[0])
        expanded = set(res.expanded_nodes[0][:count].tolist())
        ann_nodes = {
            int(nb)
            for nb, t in zip(*g.neighbors_of(doc_node))
            if int(t) == et_an
        }
        assert ann_nodes & expanded, "annotations not reached at depth 2"

    def test_max_expanded_cap(self, engine):
        q = np.asarray(engine.index.emb[0], np.float32)
        res = engine.query_batch(q, top_k=10, expansion_depth=2, max_expanded=5)
        assert int(res.expanded_counts[0]) <= 5
        assert (res.expanded_nodes[0] >= -1).all()

    def test_expanded_scores_bounded(self, engine):
        q = np.asarray(engine.index.emb[0], np.float32)
        res = engine.query_batch(q, top_k=5, entity_lists=[["black"]])
        count = int(res.expanded_counts[0])
        scores = res.expanded_relevance[0][:count]
        assert ((scores >= 0) & (scores <= 1)).all()


class TestDepth3Expansion:
    def test_three_hop_reaches_chain(self, engine):
        # Use a synthetic chain graph to verify depth-3 reachability.
        import jax.numpy as jnp

        from hcrag_tpu.ops.expand import expand_k_hop

        nbrs = np.full((8, 1), -1, np.int32)
        for i in range(7):
            nbrs[i, 0] = i + 1
        seeds = jnp.asarray(np.array([0, -1], np.int32))
        out, count = expand_k_hop(jnp.asarray(nbrs), seeds, depth=3, max_nodes=8)
        got = set(np.asarray(out)[: int(count)].tolist())
        assert {1, 2, 3} <= got
