"""Multi-mode QueryInterface (reference query_interface.py:114-449)."""

import numpy as np
import pytest

from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.query.engine import QueryEngine
from hcrag_tpu.query.interface import QueryInterface, select_best_mode

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def iface():
    b = build_adventureworks(DATA_DIR)
    return QueryInterface(QueryEngine(b.index, b.graph), top_k=5)


class TestModeSelection:
    """query_interface.py:272-292 keyword rules, verbatim."""

    def test_vector_words(self):
        assert select_best_mode("products similar to mountain bikes") == "vector"
        assert select_best_mode("Compare the road frames") == "vector"

    def test_keyword_words(self):
        assert select_best_mode("find the touring bike") == "keyword"
        assert select_best_mode("What is a chainring?") == "keyword"

    def test_context_words(self):
        assert select_best_mode("explain the product hierarchy") == "context"
        assert select_best_mode("why do these products connect") == "context"

    def test_rule_precedence_and_default(self):
        # vector rule wins over later rules (the reference checks in order)
        assert select_best_mode("explain similar products") == "vector"
        assert select_best_mode("mountain bikes") == "default"


class TestModes:
    def test_vector_mode(self, iface):
        res = iface.query("mountain bike", mode="vector")
        assert res["mode"] == "vector"
        assert res["source_nodes"] > 0
        assert "mountain" in str(res["metadata"]["results"][0]["content"]).lower()

    def test_keyword_mode_exact_terms(self, iface):
        res = iface.query("Mountain-100 Silver", mode="keyword")
        assert res["mode"] == "keyword"
        hits = res["metadata"]["results"]
        assert hits and "Mountain-100 Silver" in hits[0]["content"]
        # overlap fraction scoring in (0, 1]
        assert 0 < hits[0]["similarity_score"] <= 1.0

    def test_context_mode_includes_graph_context(self, iface):
        res = iface.query("mountain bike documentation", mode="context")
        assert res["mode"] == "context"
        types = {h["metadata"].get("type") for h in res["metadata"]["results"]}
        assert "graph_context" in types  # expanded graph nodes appended

    def test_default_mode(self, iface):
        res = iface.query("touring bike", mode="default")
        assert res["mode"] == "default"
        assert res["source_nodes"] > 0

    def test_unknown_mode_falls_back_to_default(self, iface):
        res = iface.query("touring bike", mode="no_such_mode")
        assert res["mode"] == "default"

    def test_auto_selects(self, iface):
        res = iface.query("find the touring bike")
        assert res["mode"] == "keyword"


class TestResultShape:
    def test_reference_dict_shape(self, iface):
        res = iface.query("mountain bike", mode="vector")
        assert set(res) == {"question", "answer", "mode", "source_nodes", "metadata"}
        assert isinstance(res["answer"], str) and res["answer"]

    def test_failure_shape_never_raises(self, iface):
        # force a runner failure: engine with broken embedder
        broken = QueryInterface(iface.engine, top_k=5)
        broken._vector = lambda q: (_ for _ in ()).throw(RuntimeError("boom"))
        res = broken.query("anything", mode="vector")
        assert res["source_nodes"] == 0
        assert res["answer"].startswith("Query failed:")
        assert res["metadata"] == {}

    def test_offline_answer_is_extractive(self, iface):
        res = iface.query("mountain bike", mode="vector")
        # offline LLM -> deterministic extractive fallback
        assert "matching resources" in res["answer"] or len(res["answer"]) > 20


class TestExploreAndSuggest:
    def test_explore_graph(self, iface):
        stats = iface.explore_graph()
        assert stats["total_nodes"] > 0
        assert "relationship_types" in stats
        assert "Product" in stats["node_types"]

    def test_suggestions_cover_types(self, iface):
        sugg = iface.suggest_queries()
        assert len(sugg) >= 8
        assert any("entities" in s for s in sugg)
        assert any("relationships" in s for s in sugg)
