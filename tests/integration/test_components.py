"""Tests for secondary components: GraphRelevanceScorer, graph-query DSL,
improved agent, visualization, reranker, MiniLM encoder, timing."""

import numpy as np
import pytest

from hcrag_tpu.core.types import ScorerType
from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.query.engine import QueryEngine

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def bundle():
    return build_adventureworks(DATA_DIR)  # self-consistent hashing index


@pytest.fixture(scope="module")
def engine(bundle):
    return QueryEngine(bundle.index, bundle.graph)


class TestGraphRelevanceScorer:
    def test_score_query_against_graph(self, engine):
        from hcrag_tpu.pipeline.integration import GraphRelevanceScorer

        grs = GraphRelevanceScorer(engine)
        out = grs.score_query_against_graph(
            "mountain bike", top_k=5, similarity_threshold=0.0,
            scorer_types=[ScorerType.COMPOSITE, ScorerType.ROUTER_TWO_ENT_TYPE],
        )
        assert out["nodes_found"] > 0
        assert set(out["results"].keys()) == {
            "composite", "router_two_ent_type",
        }
        for scored in out["results"].values():
            vals = [s["relevance_score"] for s in scored]
            assert vals == sorted(vals, reverse=True)

    def test_connected_nodes_have_zero_similarity(self, engine):
        from hcrag_tpu.pipeline.integration import GraphRelevanceScorer

        grs = GraphRelevanceScorer(engine)
        nodes, _ = grs.get_graph_nodes_for_query(
            "mountain bike", top_k=5, similarity_threshold=0.0
        )
        connected = [
            n for n in nodes if n.graph_relations.get("is_connected")
        ]
        assert all(
            n.graph_relations["similarity_score"] == 0.0 for n in connected
        )

    def test_compare_scorer_performance(self, engine):
        from hcrag_tpu.pipeline.integration import GraphRelevanceScorer

        grs = GraphRelevanceScorer(engine)
        out = grs.compare_scorer_performance("mountain bike", top_k=3)
        assert len(out["scorers"]) == len(ScorerType)
        for stats in out["scorers"].values():
            assert 0 <= stats["top_score"] <= 1


class TestGraphQueryDSL:
    def test_offline_generation_and_execution(self, bundle):
        from hcrag_tpu.query.graph_query import answer_graph_question

        out = answer_graph_question(
            bundle.graph, "Show me documents about Mountain Bike Manual"
        )
        assert out["graph_query"]["label"] == "Document"
        assert out["match_count"] == 1
        assert "Mountain Bike Manual" in out["matches"][0]["text"]

    def test_edge_type_follow(self, bundle):
        from hcrag_tpu.query.graph_query import GraphQuery, execute_graph_query

        q = GraphQuery(label="Product", edge_type="SAME_CATEGORY", limit=3)
        matches = execute_graph_query(bundle.graph, q)
        assert len(matches) == 3
        assert all(
            nb["relationship"] == "SAME_CATEGORY"
            for m in matches
            for nb in m["neighbors"]
        )

    def test_key_lookup(self, bundle):
        from hcrag_tpu.query.graph_query import GraphQuery, execute_graph_query

        key = bundle.graph.node_keys[0]
        q = GraphQuery(label="Product", key=str(key))
        matches = execute_graph_query(bundle.graph, q)
        assert len(matches) == 1 and matches[0]["node_id"] == 0


class TestImprovedAgent:
    def test_checkpointing_and_memory(self, engine):
        from hcrag_tpu.pipeline.improved_agent import (
            ImprovedRetrievalAgent,
            MemorySaver,
        )

        saver = MemorySaver()
        agent = ImprovedRetrievalAgent(engine, checkpointer=saver)
        r = agent.run("mountain bike question", thread_id="t-1", user_id="u-1")
        assert r.thread_id == "t-1"
        cps = saver.get("t-1")
        assert len(cps) >= 6  # every node journaled
        assert cps[0]["node"] == "analyze_query"
        assert agent.load_user_preferences("u-1")["interactions"] == 1

    def test_confidence_and_review_hook(self, engine):
        from hcrag_tpu.pipeline.improved_agent import ImprovedRetrievalAgent

        reviewed = {}

        def handler(payload):
            reviewed.update(payload)
            return False  # reject

        agent = ImprovedRetrievalAgent(engine, review_handler=handler)
        r = agent.run("zzzz absurd nonexistent query")
        if r.needs_human_review:
            assert "flagged for review" in r.final_answer
            assert reviewed["confidence"] == r.confidence

    def test_streaming_callback(self, engine):
        from hcrag_tpu.pipeline.improved_agent import ImprovedRetrievalAgent

        chunks = []
        agent = ImprovedRetrievalAgent(
            engine, stream_callback=chunks.append
        )
        r = agent.run("mountain bike")
        assert "".join(chunks).strip() == r.final_answer
        # offline degradation still streams progressively, not one blob
        assert len(chunks) > 5

    def test_call_stream_sse_tokens_arrive_before_return(self, monkeypatch):
        """Real incremental streaming (neo4j_rag_langgraph_improved.py:
        160-210): with a mocked SSE endpoint, on_token fires per delta chunk
        BEFORE call_stream returns, and the return value is the
        concatenation of exactly those chunks."""
        import contextlib
        import json as _json

        import httpx

        from hcrag_tpu.config import RuntimeConfig
        from hcrag_tpu.pipeline.llm import LLMClient

        sse_tokens = ["The ", "Mountain-100 ", "is ", "in ", "stock."]

        class _FakeResp:
            def raise_for_status(self):
                pass

            def iter_lines(self):
                for t in sse_tokens:
                    yield "data: " + _json.dumps(
                        {"choices": [{"delta": {"content": t}}]}
                    )
                    # every chunk must already have been delivered by the
                    # time the next SSE line is read
                    assert seen == sse_tokens[: len(seen)]
                yield "data: [DONE]"

        @contextlib.contextmanager
        def fake_stream(method, url, **kw):
            assert kw["json"]["stream"] is True
            yield _FakeResp()

        monkeypatch.setattr(httpx, "stream", fake_stream)
        client = LLMClient(RuntimeConfig(llm_base_url="http://mock:1/v1"))
        seen = []
        returned = {}

        def on_token(chunk):
            assert not returned, "token arrived after call_stream returned"
            seen.append(chunk)

        answer = client.call_stream("sys", "user", on_token)
        returned["done"] = True
        assert seen == sse_tokens
        assert answer == "".join(sse_tokens)

    def test_garbage_query_triggers_low_confidence_path(self, engine):
        """Round-5 VERDICT next-3: a garbage query through a distilled
        encoder must VISIBLY downgrade — low_confidence flag + keyword
        fallback mode — instead of silently serving unreliable embeddings."""
        from hcrag_tpu.models.minilm import load_distilled_embedder
        from hcrag_tpu.query.interface import QueryInterface

        emb = load_distilled_embedder()
        if emb is None:
            pytest.skip("distilled encoder artifact absent")
        old = engine.embedder
        try:
            engine.attach_device_encoder(emb)
            qi = QueryInterface(engine)
            r = qi.query("zzxqv fnarg blorp quux 9931", mode="vector")
            conf = r["metadata"].get("encoder_confidence")
            assert conf is not None and 0.0 <= conf["score"] <= 1.0
            assert r["metadata"]["low_confidence"] is True
            assert r["metadata"]["fallback_mode"] == "keyword"
            assert r["mode"].endswith("+keyword_fallback")
            # keyword mode itself never consults the encoder -> no gate
            r_kw = qi.query("zzxqv fnarg blorp quux 9931", mode="keyword")
            assert "encoder_confidence" not in r_kw["metadata"]
        finally:
            engine.attach_device_encoder(old)

    def test_agent_surfaces_encoder_confidence(self, engine):
        from hcrag_tpu.models.minilm import load_distilled_embedder
        from hcrag_tpu.pipeline.agent import RetrievalAgent

        emb = load_distilled_embedder()
        if emb is None:
            pytest.skip("distilled encoder artifact absent")
        old = engine.embedder
        try:
            engine.attach_device_encoder(emb)
            agent = RetrievalAgent(engine)
            r = agent.run("mountain bike")
            assert r.encoder_confidence is not None
            assert 0.0 <= r.encoder_confidence["score"] <= 1.0
        finally:
            engine.attach_device_encoder(old)

    def test_call_stream_offline_word_fallback(self):
        """Offline, call_stream preserves the callback contract by emitting
        the fallback answer in word chunks (the reference's degradation)."""
        from hcrag_tpu.pipeline.llm import LLMClient

        client = LLMClient()
        assert client.offline
        seen = []
        answer = client.call_stream(
            "sys", "user", seen.append, fallback="alpha beta gamma"
        )
        assert answer == "alpha beta gamma"
        assert seen == ["alpha ", "beta ", "gamma"]
        assert client.failure_count == 1

    def test_history_compression(self):
        from hcrag_tpu.pipeline.improved_agent import compress_history

        short = ["a"] * 5
        assert compress_history(short) == short
        long = [f"msg {i}" for i in range(20)]
        out = compress_history(long)
        assert len(out) == 5 and out[0].startswith("[Compressed history")

    def test_checkpoint_persistence(self, engine, tmp_path):
        from hcrag_tpu.pipeline.improved_agent import (
            ImprovedRetrievalAgent,
            MemorySaver,
        )

        saver = MemorySaver(persist_dir=str(tmp_path))
        agent = ImprovedRetrievalAgent(engine, checkpointer=saver)
        agent.run("q", thread_id="persisted")
        fresh = MemorySaver(persist_dir=str(tmp_path))
        assert len(fresh.get("persisted")) >= 6


class TestVisualization:
    def test_html_generation(self, engine, tmp_path):
        from hcrag_tpu.viz.cytoscape import visualize_query_results

        out = tmp_path / "viz.html"
        results, path = visualize_query_results(
            engine, "mountain bike", top_k=5, similarity_threshold=0.0,
            output_path=str(out),
        )
        assert path == str(out)
        html = out.read_text()
        assert "cytoscape" in html and "elements" in html
        assert results["results"]

    def test_subgraph_extraction_marks_connected(self, engine):
        from hcrag_tpu.viz.cytoscape import extract_subgraph_from_results

        qr = engine.process_query("mountain bike", top_k=5,
                                  similarity_threshold=0.0)
        sub = extract_subgraph_from_results(engine, qr, expand_subgraph=True)
        assert sub["nodes"]
        direct = [n for n in sub["nodes"] if not n["data"]["is_connected"]]
        assert all(
            n["data"]["similarity_score"] >= 0 for n in direct
        )
        for n in sub["nodes"]:
            if n["data"]["is_connected"]:
                assert n["data"]["similarity_score"] == 0.0

    def test_whole_graph_overview_html(self, engine, tmp_path):
        """save_networkx_graph analogue (graph_builder.py:545): the graph
        STORE itself renders to an interactive page, capped by degree."""
        from hcrag_tpu.viz.cytoscape import save_graph_html

        out = tmp_path / "kg.html"
        path = save_graph_html(engine.graph, output_path=str(out),
                               max_nodes=50)
        assert path == str(out)
        html = out.read_text()
        assert "cytoscape" in html
        n_rendered = html.count('"id": "n')
        assert 0 < n_rendered <= 50
        # cap annotation appears when the graph is larger than the cap
        if engine.graph.num_nodes > 50:
            assert "top " in html and "by degree" in html

    def test_property_store_overview_html(self, tmp_path):
        from hcrag_tpu.core.property_graph import PropertyGraphStore, Triple
        from hcrag_tpu.viz.cytoscape import save_graph_html

        store = PropertyGraphStore()
        store.upsert_node("Mountain Bike", label="product")
        store.upsert_node("Frame Spec", label="document")
        store.upsert_triple(Triple("Mountain Bike", "described_by", "Frame Spec"))
        out = tmp_path / "store.html"
        save_graph_html(store, output_path=str(out))
        html = out.read_text()
        # predicate vocabulary is normalized upper-case on lowering
        assert "DESCRIBED_BY" in html and "Mountain Bike" in html


class TestReranker:
    def test_distillation_reduces_loss(self):
        from hcrag_tpu.models.reranker import Reranker

        rng = np.random.default_rng(0)
        feats = rng.uniform(0, 1, (64, 8, 5)).astype(np.float32)
        labels = feats[..., 4]  # teacher = raw cosine feature
        rr = Reranker(hidden=16, learning_rate=5e-3)
        losses = rr.fit_distill(feats, labels, epochs=8, batch_size=16)
        assert losses[-1] < losses[0]

    def test_score_shape(self):
        from hcrag_tpu.models.reranker import Reranker

        rr = Reranker(hidden=8)
        out = rr.score(np.zeros((3, 7, 5), np.float32))
        assert out.shape == (3, 7)


class TestMiniLMEncoder:
    def test_encode_shape_and_norm(self):
        from hcrag_tpu.models.minilm import FlaxMiniLMEmbedder, MiniLMConfig

        cfg = MiniLMConfig(num_layers=2, vocab_size=1000, hidden_size=128,
                           num_heads=4, intermediate_size=256)
        emb = FlaxMiniLMEmbedder(cfg, max_len=16)
        out = emb.encode(["hello world", "mountain bike manual"])
        assert out.shape == (2, 128)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), 1.0, atol=1e-5
        )

    def test_deterministic(self):
        from hcrag_tpu.models.minilm import FlaxMiniLMEmbedder, MiniLMConfig

        cfg = MiniLMConfig(num_layers=1, vocab_size=500, hidden_size=128,
                           num_heads=4, intermediate_size=128)
        e1 = FlaxMiniLMEmbedder(cfg, seed=1, max_len=8).encode(["abc"])
        e2 = FlaxMiniLMEmbedder(cfg, seed=1, max_len=8).encode(["abc"])
        np.testing.assert_array_equal(e1, e2)

    def test_param_save_load(self, tmp_path):
        from hcrag_tpu.models.minilm import FlaxMiniLMEmbedder, MiniLMConfig

        cfg = MiniLMConfig(num_layers=1, vocab_size=500, hidden_size=128,
                           num_heads=4, intermediate_size=128)
        a = FlaxMiniLMEmbedder(cfg, seed=1, max_len=8)
        path = str(tmp_path / "params.npz")
        a.save_params(path)
        b = FlaxMiniLMEmbedder(cfg, seed=2, max_len=8)
        b.load_params(path)
        np.testing.assert_allclose(
            a.encode(["same text"]), b.encode(["same text"]), atol=1e-6
        )


class TestTiming:
    def test_stage_timer(self):
        from hcrag_tpu.utils.timing import StageTimer

        t = StageTimer()
        with t.span("outer"):
            with t.span("inner"):
                pass
        assert "outer" in t.totals and "outer/inner" in t.totals
        assert "outer" in t.report()

    def test_graph_centrality_metric(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.scoring import graph_centrality_scores

        out = np.asarray(
            graph_centrality_scores(jnp.asarray([0, 25, 50, 500]))
        )
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.0], atol=1e-6)


class TestRerankerIntegration:
    """The learned re-ranker as QueryEngine's optional final stage
    (set_reranker + query_batch(rerank=True)); trained by judge-aware
    distillation (models/reranker.py::distill_judge_aware, measured in
    benchmarks/reranker_eval.py)."""

    def test_rerank_reorders_by_learned_scores(self):
        import numpy as np

        from hcrag_tpu.models.reranker import Reranker
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        index = synthetic_dense_index(512, 64, seed=2)
        engine = QueryEngine(index, None)
        engine.set_reranker(Reranker(hidden=8, seed=1))
        q = np.asarray(index.emb[9], np.float32)
        plain = engine.query_batch(q, top_k=10)
        rr = engine.query_batch(q, top_k=10, rerank=True)
        # same candidate SET, reordered by the reranker's scores
        assert set(rr.top_indices[0].tolist()) == set(
            plain.top_indices[0].tolist()
        )
        assert rr.rerank_scores is not None
        s = rr.rerank_scores[0]
        assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))
        # paired fields stay aligned: scores follow their indices
        pos = {int(ix): j for j, ix in enumerate(plain.top_indices[0])}
        for j, ix in enumerate(rr.top_indices[0]):
            assert rr.top_scores[0][j] == plain.top_scores[0][pos[int(ix)]]

    def test_distill_learns_teacher_ordering(self):
        import numpy as np

        from hcrag_tpu.models.reranker import (
            Reranker,
            distill_judge_aware,
            engine_candidate_features,
            ndcg_at_k,
        )
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        index = synthetic_dense_index(1024, 64, seed=5)
        engine = QueryEngine(index, None)
        rng = np.random.default_rng(0)
        q = rng.standard_normal((32, 64)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        texts = [f"query {i}" for i in range(32)]
        rr = Reranker(hidden=16, learning_rate=3e-3, seed=0)
        out = distill_judge_aware(
            engine, rr, texts, q, top_m=10, epochs=30, seed=0
        )
        assert np.isfinite(out["losses"]).all()
        # the student orders the TRAIN candidates close to the teacher
        res = engine.query_batch(q, top_k=10)
        feats = engine_candidate_features(engine, res)
        pred = np.argsort(-rr.score(feats), axis=1, kind="stable")
        assert ndcg_at_k(pred, out["labels"], 10) > 0.95
