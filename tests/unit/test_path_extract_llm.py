"""LLM-online path of the path extractors (graph_builder.py:428-443).

The live endpoint is absent in CI, so these tests drive the extractors with
a stub LLM client that honors the `LLMClient.call` contract (returns a
parsed response_format instance, or the fallback on 'failure') — covering
the structured-extraction branch, the schema-discovery branch, and
degradation to the offline heuristics when the LLM misbehaves.
"""

from hcrag_tpu.ingest.path_extract import (
    DynamicPathExtractor,
    SchemaResponse,
    SimplePathExtractor,
    TriplesResponse,
)


class StubLLM:
    """Duck-typed LLMClient: online, returns canned structured responses."""

    offline = False

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def call(self, system_prompt, user_prompt, response_format=None,
             fallback=None, **kw):
        self.calls.append((system_prompt, user_prompt, response_format))
        if self.responses:
            resp = self.responses.pop(0)
            if resp is not None:
                return resp
        return fallback() if callable(fallback) else fallback


class TestSimpleLLMPath:
    def test_structured_triples_used(self):
        llm = StubLLM([TriplesResponse.model_validate({
            "triples": [
                {"subject": "Mountain-100", "predicate": "made of",
                 "object": "aluminum", "subject_type": "product",
                 "object_type": "material"},
                {"subject": "Mountain-100", "predicate": "has_component",
                 "object": "HL Fork"},
            ]
        })])
        t = SimplePathExtractor(llm).extract("some chunk", {"id": "c1"})
        assert [(x.subject, x.object) for x in t] == [
            ("Mountain-100", "aluminum"), ("Mountain-100", "HL Fork")]
        assert t[0].subject_type == "product"
        assert all(x.source_id == "c1" for x in t)
        # the extraction prompt carries the path cap
        assert "10" in llm.calls[0][0]
        assert llm.calls[0][2] is TriplesResponse

    def test_llm_cap_applies(self):
        many = TriplesResponse.model_validate({"triples": [
            {"subject": f"S{i}", "predicate": "REL", "object": f"O{i}"}
            for i in range(25)
        ]})
        t = SimplePathExtractor(StubLLM([many]), max_paths_per_chunk=10).extract(
            "chunk", {})
        assert len(t) == 10

    def test_llm_failure_degrades_to_offline(self):
        llm = StubLLM([None])  # call 'fails' -> fallback None
        text = "Table: P. Name: Widget. Color: Red"
        t = SimplePathExtractor(llm).extract(text, {})
        # offline heuristic result, not empty
        assert any(x.predicate == "Color" and x.object == "Red" for x in t)


class TestDynamicLLMPath:
    def test_llm_schema_constrains_extraction(self):
        schema = SchemaResponse(entity_types=["product"],
                                relation_types=["made of", "HAS_PART"])
        triples = TriplesResponse.model_validate({"triples": [
            {"subject": "A", "predicate": "made of", "object": "B"},
            {"subject": "A", "predicate": "UNRELATED_REL", "object": "C"},
        ]})
        ex = DynamicPathExtractor(StubLLM([schema, triples]))
        got = ex.extract("chunk", {"id": "c2"})
        assert ex.schema == ["MADE_OF", "HAS_PART"]
        # the off-schema triple is dropped — dynamic mode's contract
        assert [(t.subject, t.object) for t in got] == [("A", "B")]

    def test_schema_failure_falls_back_to_frequency(self):
        llm = StubLLM([None])  # schema call fails
        ex = DynamicPathExtractor(llm)
        schema = ex.discover_schema(
            ["Table: P. Name: W. Color: Red. Color2: Blue"], [{}])
        assert schema  # frequency-derived from the offline extractor
