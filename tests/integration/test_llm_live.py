"""Conditional live-LLM tests (reference pattern:
tests/unit/test_milestone1_core_components.py:55-74, 265-287 — behavioral
tests against the real endpoint that `pytest.skip` when the service is
down/unconfigured).

These exercise `LLMClient`'s ONLINE code path — HTTP POST, structured-output
JSON-schema parsing, judge score floor, timeout fallback — which the offline
suite can't reach.  Activate with:

    HCRAG_LLM_BASE_URL=http://host:port/v1 \
    HCRAG_LLM_MODEL=... [HCRAG_LLM_API_KEY=...] python -m pytest tests/ -k llm_live
"""

import os

import pytest

BASE_URL = os.environ.get("HCRAG_LLM_BASE_URL", "")


def _reachable() -> bool:
    if not BASE_URL:
        return False
    try:
        import httpx

        httpx.get(BASE_URL.rstrip("/").rsplit("/", 1)[0], timeout=5)
        return True
    except Exception:
        return False


live = pytest.mark.skipif(
    not BASE_URL,
    reason="HCRAG_LLM_BASE_URL not set — live-LLM behavioral tests need an "
    "OpenAI-compatible endpoint (reference pattern: skip when service down)",
)


@pytest.fixture()
def client():
    from hcrag_tpu.config import RuntimeConfig
    from hcrag_tpu.pipeline.llm import LLMClient

    cfg = RuntimeConfig()
    if not cfg.llm_base_url:
        pytest.skip("no LLM endpoint configured")
    if not _reachable():
        pytest.skip(f"LLM service not reachable at {BASE_URL}")
    return LLMClient(cfg)


@live
class TestLiveLLM:
    def test_plain_completion_returns_text(self, client):
        out = client.call(
            "You are a helpful assistant.",
            "Reply with the single word: pong",
            max_tokens=10,
        )
        assert isinstance(out, str) and len(out) > 0
        assert client.failure_count == 0

    def test_structured_output_parses(self, client):
        """The reference's structured-extraction contract
        (query_parser.py:64-131): the endpoint must return schema-conforming
        JSON that pydantic-validates."""
        from hcrag_tpu.pipeline.llm import QueryIntentResponse

        out = client.call(
            "Classify the intent of the user's query about a product "
            "catalog. Respond with JSON.",
            "What mountain bikes are available under $1000?",
            response_format=QueryIntentResponse,
        )
        assert isinstance(out, QueryIntentResponse)
        assert out.intent  # non-empty classification
        assert 0.0 <= out.confidence <= 1.0

    def test_llm_judge_scores_relevant_pair_high(self, client):
        """Reference quality floor: >= 0.85 on an obviously relevant pair
        (test_milestone1_core_components.py:284)."""
        from hcrag_tpu.core.types import QueryIntent, QueryInput, NodeInput
        from hcrag_tpu.pipeline.isrelevant import batch_llm_judge

        import numpy as np

        q = QueryInput(
            text="mountain bike with aluminum frame",
            embeddings=np.zeros(384, np.float32),
            entities=["mountain bike"],
            intent=QueryIntent.PRODUCT_SEARCH,
        )
        node = NodeInput(
            text="Mountain-100 Silver: lightweight aluminum mountain bike "
            "with competition-grade components",
            embeddings=np.zeros(384, np.float32),
            graph_relations={},
            node_type="product",
            entities=["mountain bike"],
        )
        scores = batch_llm_judge(q, [node], client=client)
        assert scores[0] >= 0.85, f"judge scored relevant pair {scores[0]}"

    def test_timeout_falls_back_not_raises(self, client):
        """A sub-millisecond timeout must trip the fallback path, never
        raise (call_ollama_llm contract, neo4j_rag_langgraph.py:131-155)."""
        from hcrag_tpu.pipeline.llm import FALLBACK_ANSWER

        out = client.call(
            "You are a helpful assistant.",
            "Write a 500-word essay.",
            timeout=0.001,
        )
        assert out == FALLBACK_ANSWER
        assert client.failure_count >= 1
