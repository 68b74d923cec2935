"""E2E tests for the agentic pipeline (offline-deterministic).

Ports the reference e2e strategy (SURVEY §4, tests/e2e/
test_milestone3_langgraph_e2e.py + rag_pytest.py:519-1003): step-by-step
state-shape invariants, the revision loop, LLM-failure resilience, and
empty/no-result behavior — all against the in-process engine with no external
services (the LLM client is offline, exercising every fallback path the
reference defines).
"""

import numpy as np
import pytest

from hcrag_tpu import config as cfg
from hcrag_tpu.core.types import QueryIntent, ScorerType
from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.pipeline.agent import RetrievalAgent
from hcrag_tpu.pipeline.enhanced import EnhancedRAG, RAGResponse
from hcrag_tpu.pipeline.llm import FALLBACK_ANSWER, LLMClient
from hcrag_tpu.query.engine import QueryEngine

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def engine(reference_pickle_path):
    bundle = build_adventureworks(
        DATA_DIR, reference_pickle=reference_pickle_path
    )
    return QueryEngine(bundle.index, bundle.graph)


@pytest.fixture()
def agent(engine):
    config = cfg.RuntimeConfig()
    config.random_seed = 42
    return RetrievalAgent(engine, client=LLMClient(config), config=config)


class TestStepByStepPipeline:
    """Scenario 1: each node respects the reference's shape invariants."""

    def test_full_state_progression(self, agent):
        state = {"question": "What mountain bikes do you have?",
                 "revision_history": []}
        state.update(agent.analyze_query(state))
        qi = state["query_input"]
        assert qi.text == state["question"]
        assert qi.embeddings.shape == (384,)
        assert isinstance(qi.intent, QueryIntent)

        state.update(agent.sample_nodes(state))
        assert len(state["sampled_nodes"]) <= cfg.SAMPLE_LIMIT

        state.update(agent.score_semantic_similarity(state))
        gated = state["semantic_scored_nodes"]
        assert all(n.score >= cfg.SEMANTIC_GATE for n in gated)
        scores = [n.score for n in gated]
        assert scores == sorted(scores, reverse=True)

        state.update(agent.expand_subgraph(state))
        # LIMIT 3 per scored node
        assert len(state["expanded_subgraph"]) <= 3 * max(len(gated), 1)

        state.update(agent.score_all_nodes(state))
        final = state["final_relevant_nodes"]
        assert len(final) <= cfg.FINAL_TOP_K
        fscores = [n.score for n in final]
        assert fscores == sorted(fscores, reverse=True)

        state.update(agent.evaluate_context(state))
        assert state["decision"] in ("sufficient", "revision")

        state.update(agent.generate_answer(state))
        assert isinstance(state["final_answer"], str)

    def test_seeded_sampling_is_reproducible(self, agent):
        s1 = agent.sample_nodes({})["sampled_nodes"]
        s2 = agent.sample_nodes({})["sampled_nodes"]
        assert s1 == s2  # random_seed=42 fixed


class TestFullAgentRun:
    def test_invoke_completes_with_all_state_keys(self, agent):
        result = agent.run("What mountain bikes do you have?")
        assert result.final_answer
        assert result.query_input is not None
        assert result.decision == "sufficient"
        assert len(result.final_relevant_nodes) <= cfg.FINAL_TOP_K
        assert "generate_answer" in result.node_trace

    def test_revision_guard_bounds_loop(self, agent):
        # Offline evaluate_context falls back to "sufficient", so the loop
        # terminates on the first pass; the recursion limit bounds the rest.
        result = agent.run("completely absurd query zzzxqwy")
        assert result.final_answer  # never crashes, always answers
        assert len(result.revision_history) <= cfg.MAX_REVISIONS

    def test_offline_llm_resilience(self, agent):
        # Every LLM call fails (offline client); the pipeline must still
        # produce an answer through the deterministic fallbacks.
        assert agent.client.offline
        result = agent.run("Show me products under $500")
        assert isinstance(result.final_answer, str) and result.final_answer
        assert agent.client.failure_count >= 0


class TestEnhancedRAG:
    def test_full_pipeline_response_shape(self, engine):
        rag = EnhancedRAG(engine)
        resp = rag.query("mountain bike", top_k=5, similarity_threshold=0.0)
        assert isinstance(resp, RAGResponse)
        assert resp.query == "mountain bike"
        assert isinstance(resp.answer, str) and resp.answer
        assert resp.processing_time > 0
        assert len(resp.context_used) <= 5
        if resp.context_used:
            assert resp.metadata["nodes_used"] == len(resp.context_used)
            # combined = 0.7*rel + 0.3*sim all within [0, 1]
            assert all(0 <= s <= 1 for s in resp.relevance_scores)

    def test_no_results_path(self, engine):
        rag = EnhancedRAG(engine)
        # Threshold 1.1 is unsatisfiable -> the reference's no-results answer.
        resp = rag.query("anything", similarity_threshold=1.6)
        assert "couldn't find any relevant information" in resp.answer

    def test_context_budgeting(self, engine):
        rag = EnhancedRAG(engine, max_context_tokens=600)
        scored = [
            {"content": "x" * 400, "metadata": {}, "combined_score": 0.9},
            {"content": "y" * 400, "metadata": {}, "combined_score": 0.8},
            {"content": "z" * 400, "metadata": {}, "combined_score": 0.7},
        ]
        sel = rag.optimize_context(scored, None)
        # budget = 600-500 = 100 tokens = 400 chars -> exactly one node fits
        assert len(sel) == 1


class TestLLMClientFallbacks:
    def test_plain_call_offline_returns_apology(self):
        client = LLMClient(cfg.RuntimeConfig())
        out = client.call("system", "user")
        assert out == FALLBACK_ANSWER

    def test_structured_intent_fallback(self):
        from hcrag_tpu.pipeline.llm import QueryIntentResponse

        client = LLMClient(cfg.RuntimeConfig())
        out = client.call("s", "u", QueryIntentResponse)
        assert isinstance(out, QueryIntentResponse)
        assert out.intent == "product_search"
        assert out.confidence == 0.5

    def test_custom_fallback_wins(self):
        client = LLMClient(cfg.RuntimeConfig())
        assert client.call("s", "u", fallback="custom") == "custom"
        assert client.call("s", "u", fallback=lambda: 42) == 42


class TestQueryParser:
    def test_offline_parse_returns_empty_structure(self):
        from hcrag_tpu.pipeline.parser import QueryParser

        parser = QueryParser(LLMClient(cfg.RuntimeConfig()))
        out = parser.parse_query("Find red mountain bikes")
        assert out["product"] == {"name": None, "features": [], "category": None}
        assert out["document"] == {"type": None, "name": None}
        assert out["relationship"] == {"type": None, "direction": None}
        assert out["search_text"] == "Find red mountain bikes"

    def test_batch_parse(self):
        from hcrag_tpu.pipeline.parser import QueryParser

        parser = QueryParser(LLMClient(cfg.RuntimeConfig()))
        outs = parser.parse_queries_batch(["a", "b"])
        assert len(outs) == 2
