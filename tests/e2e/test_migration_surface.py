"""Migration-surface test: every call mapping in docs/MIGRATION.md works.

A user switching from the reference must find each documented entry point
importable and callable with the documented signature.  This test is the
API-stability guard for that contract.
"""

import numpy as np
import pytest

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def bundle():
    from hcrag_tpu.ingest.adventureworks import build_adventureworks

    return build_adventureworks(DATA_DIR)


@pytest.fixture(scope="module")
def engine(bundle):
    from hcrag_tpu.query import QueryEngine

    return QueryEngine(bundle.index, bundle.graph)


class TestMigrationSurface:
    def test_index_build_surface(self, bundle, tmp_path):
        from hcrag_tpu.ingest.adventureworks import (
            analyze_ingested_documents,
            load_csv_data,
        )

        assert set(load_csv_data(DATA_DIR)) == {
            "products", "categories", "descriptions", "models",
        }
        assert len(analyze_ingested_documents(DATA_DIR)) == 4
        bundle.graph.statistics()
        bundle.index.save(tmp_path)
        bundle.graph.save(tmp_path)

    def test_reference_pickle_compat(self, reference_pickle_path):
        from hcrag_tpu.core import DenseIndex

        idx = DenseIndex.from_reference_pickle(reference_pickle_path)
        assert idx.n == 585

    def test_retrieval_surface(self, engine):
        out = engine.process_query("bike", top_k=3, similarity_threshold=0.0)
        assert set(out) >= {
            "parsed_query", "search_text", "results", "summary",
            "query_embedding",
        }
        emb = np.asarray(engine.index.emb[0], np.float32)
        results = engine.find_similar_content(emb, 3, 0.0)
        assert {"content", "metadata", "similarity_score"} <= set(results[0])
        engine.search_by_category("bike", "database_table", top_k=2)
        engine.get_content_statistics()
        engine.hybrid_search("bike", limit=2)
        engine.query_similar_products(engine.graph.node_keys[0], limit=2)
        engine.suggest_queries()
        engine.query_batch(emb, top_k=3)

    def test_scoring_surface(self):
        from hcrag_tpu import (
            CompositeWeights, NodeInput, QueryInput, QueryIntent, ScorerType,
        )
        from hcrag_tpu.pipeline import batch_isRelevant, isRelevant
        from hcrag_tpu.testing import create_sample_nodes, create_sample_query

        q = create_sample_query()
        nodes = create_sample_nodes()[:3]
        scores = batch_isRelevant(
            q, nodes, ScorerType.COMPOSITE, 10,
            CompositeWeights.create_balanced(),
        )
        assert len(scores) == 3
        isRelevant(q, nodes[0], ScorerType.PARALLEL)
        assert isinstance(nodes[0], NodeInput) and isinstance(q, QueryInput)
        assert QueryIntent.from_string("document_request").value == "document_request"

    def test_config_setters_surface(self):
        from hcrag_tpu.config import (
            GLOBAL_CONFIG, reset_global_config, set_batch_size,
            set_composite_weights, set_random_seed, set_scorer_type,
        )
        from hcrag_tpu.core.types import CompositeWeights, ScorerType

        set_scorer_type(ScorerType.ROUTER)
        set_composite_weights(CompositeWeights.create_balanced())
        set_random_seed(1)
        set_batch_size(5)
        assert GLOBAL_CONFIG.scorer_type == ScorerType.ROUTER
        reset_global_config()
        assert GLOBAL_CONFIG.scorer_type == ScorerType.COMPOSITE

    def test_agent_surface(self, engine):
        from hcrag_tpu.pipeline import (
            ImprovedRetrievalAgent, InMemoryStore, MemorySaver, RetrievalAgent,
        )

        result = RetrievalAgent(engine).run("bike", recursion_limit=15)
        assert result.final_answer
        improved = ImprovedRetrievalAgent(
            engine, checkpointer=MemorySaver(), store=InMemoryStore()
        )
        r2 = improved.run("bike", thread_id="mig")
        assert r2.confidence >= 0

    def test_enhanced_and_integration_surface(self, engine):
        from hcrag_tpu.pipeline import EnhancedRAG, GraphRelevanceScorer

        resp = EnhancedRAG(engine).query("bike", top_k=3,
                                         similarity_threshold=0.0)
        assert resp.answer
        grs = GraphRelevanceScorer(engine)
        out = grs.score_query_against_graph("bike", top_k=2,
                                            similarity_threshold=0.0)
        assert "results" in out

    def test_parser_graphquery_viz_surface(self, engine, bundle, tmp_path):
        from hcrag_tpu.pipeline import QueryParser
        from hcrag_tpu.query import answer_graph_question
        from hcrag_tpu.viz.cytoscape import visualize_query_results

        QueryParser().parse_query("red bikes")
        answer_graph_question(bundle.graph, "documents about bikes")
        visualize_query_results(
            engine, "bike", top_k=3, similarity_threshold=0.0,
            output_path=str(tmp_path / "m.html"),
        )

    def test_parallel_surface(self, bundle):
        from hcrag_tpu.parallel import ShardedQueryEngine, make_row_mesh

        eng = ShardedQueryEngine(bundle.index, bundle.graph,
                                 mesh=make_row_mesh())
        q = np.asarray(bundle.index.emb[0], np.float32)
        assert eng.query_batch(q, top_k=3).top_indices[0][0] == 0

    def test_query_interface_surface(self, engine):
        from hcrag_tpu.query.interface import QueryInterface

        res = QueryInterface(engine).query("find mountain bikes", mode="auto")
        assert res["mode"] == "keyword" and res["source_nodes"] > 0

    def test_path_extraction_surface(self, tmp_path):
        from hcrag_tpu.ingest.path_extract import (
            PropertyGraphBuilder,
            build_graph_index,
        )

        store = PropertyGraphBuilder("implicit").build(DATA_DIR)
        store.save(tmp_path / "property_graph.json")
        index, csr, types = build_graph_index(store)
        assert index.n == csr.num_nodes > 0

    def test_encoder_surface(self, reference_pickle_path):
        from hcrag_tpu.models.minilm import load_distilled_embedder

        emb = load_distilled_embedder()
        if emb is None:
            pytest.skip("distilled artifacts absent")
        out = emb.encode(["mountain bike"])
        assert out.shape == (1, 384)

    def test_train_checkpoint_surface(self, tmp_path):
        from hcrag_tpu.models.reranker import Reranker

        r = Reranker()
        r.save(tmp_path / "r.npz", step=1)
        assert Reranker().restore(tmp_path / "r.npz") == 1
