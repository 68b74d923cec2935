"""Path-extraction graph construction (reference graph_builder.py:419-451).

Offline-deterministic behavior of every extraction mode, property-graph store
semantics, and the CSR lowering that joins extracted graphs to the device
expansion stack.
"""

import numpy as np
import pytest

from hcrag_tpu.core.property_graph import PropertyGraphStore, Triple
from hcrag_tpu.ingest.path_extract import (
    DynamicPathExtractor,
    ImplicitPathExtractor,
    PropertyGraphBuilder,
    SimplePathExtractor,
    create_extractors,
)

ROW_TEXT = (
    "Table: Product. Name: Mountain-100 Silver, 38. "
    "Color: Silver. ListPrice: 3399.99"
)
ROW_META = {"id": "Product_row_0", "type": "database_table", "table_name": "Product",
            "row_index": 0, "entity_id": 771}

PROSE = (
    "The Mountain-100 frame is made of aluminum alloy. "
    "The bike includes a suspension fork. It supports disc brakes."
)


class TestModeSelection:
    """graph_builder.py:424-451: auto->simple+dynamic, implicit alone,
    unknown->simple."""

    def test_auto_gets_simple_and_dynamic(self):
        ex = create_extractors("auto")
        assert [type(e).__name__ for e in ex] == [
            "SimplePathExtractor",
            "DynamicPathExtractor",
        ]

    def test_single_modes(self):
        assert len(create_extractors("simple")) == 1
        assert isinstance(create_extractors("dynamic")[0], DynamicPathExtractor)
        assert isinstance(create_extractors("implicit")[0], ImplicitPathExtractor)

    def test_invalid_mode_defaults_to_simple(self):
        b = PropertyGraphBuilder("no_such_mode")
        assert b.extraction_mode == "simple"
        assert isinstance(b.extractors[0], SimplePathExtractor)


class TestSimpleExtractor:
    def test_structured_row_paths(self):
        triples = SimplePathExtractor().extract(ROW_TEXT, ROW_META)
        assert triples, "structured row must produce paths"
        subjects = {t.subject for t in triples}
        assert subjects == {"Mountain-100 Silver, 38"}
        rels = {t.predicate for t in triples}
        assert "Color" in rels and "ListPrice" in rels
        by_rel = {t.predicate: t.object for t in triples}
        assert by_rel["Color"] == "Silver"
        assert by_rel["ListPrice"] == "3399.99"
        assert all(t.source_id == "Product_row_0" for t in triples)

    def test_prose_svo_paths(self):
        triples = SimplePathExtractor().extract(PROSE, {"id": "c0"})
        rels = {t.predicate for t in triples}
        assert "MADE_OF" in rels
        assert "INCLUDES" in rels
        made = next(t for t in triples if t.predicate == "MADE_OF")
        assert "aluminum" in made.object.lower()

    def test_max_paths_cap(self):
        text = "Table: T. " + ". ".join(f"K{i}: v{i}" for i in range(30))
        triples = SimplePathExtractor(max_paths_per_chunk=10).extract(text, {})
        assert len(triples) <= 10  # config.MAX_PATHS_PER_CHUNK=10

    def test_deterministic(self):
        a = SimplePathExtractor().extract(ROW_TEXT, ROW_META)
        b = SimplePathExtractor().extract(ROW_TEXT, ROW_META)
        assert a == b


class TestDynamicExtractor:
    def test_schema_discovery_and_constraint(self):
        ex = DynamicPathExtractor(max_relation_types=2)
        corpus = [ROW_TEXT] * 3 + [PROSE]
        schema = ex.discover_schema(corpus, [ROW_META] * 3 + [{"id": "c0"}])
        assert len(schema) <= 2
        # Extraction is constrained to the discovered schema — the defining
        # difference from simple mode.
        triples = ex.extract(ROW_TEXT, ROW_META)
        assert triples
        assert all(t.predicate.upper() in set(schema) for t in triples)

    def test_self_bootstraps_schema(self):
        ex = DynamicPathExtractor()
        triples = ex.extract(ROW_TEXT, ROW_META)
        assert ex.schema is not None
        assert triples


class TestImplicitExtractor:
    def test_row_table_membership(self):
        t = ImplicitPathExtractor().extract(ROW_TEXT, ROW_META)
        assert ("771", "ROW_OF", "Product") in [
            (x.subject, x.predicate, x.object) for x in t
        ]

    def test_annotation_and_chunk_chain(self):
        ex = ImplicitPathExtractor()
        ann = ex.extract("json text", {
            "id": "j0", "type": "json_table", "filename": "Doc Table 1.json",
            "parent_document": "Doc"})
        assert (ann[0].predicate, ann[0].object) == ("ANNOTATES", "Doc")
        c0 = ex.extract("chunk0", {"id": "p0", "type": "pdf_document",
                                   "document_name": "Doc", "chunk_index": 0})
        c1 = ex.extract("chunk1", {"id": "p1", "type": "pdf_document",
                                   "document_name": "Doc", "chunk_index": 1})
        assert any(t.predicate == "PART_OF" for t in c0)
        nxt = [t for t in c1 if t.predicate == "NEXT"]
        assert nxt and nxt[0].subject == "Doc chunk 0" and nxt[0].object == "Doc chunk 1"


class TestPropertyGraphStore:
    def test_dedup_and_self_loops(self):
        s = PropertyGraphStore()
        assert s.upsert_triple(Triple("A", "REL", "B"))
        assert not s.upsert_triple(Triple("a", "rel", "b"))  # case-insensitive dup
        assert not s.upsert_triple(Triple("A", "REL", "A"))  # self loop
        assert not s.upsert_triple(Triple("", "REL", "B"))
        assert s.num_nodes == 2 and s.num_triples == 1

    def test_label_upgrade_and_properties(self):
        s = PropertyGraphStore()
        s.upsert_node("X")  # generic
        s.upsert_node("X", "product", {"price": 1})
        node = s.get_node("x")
        assert node.label == "product" and node.properties == {"price": 1}

    def test_statistics(self):
        s = PropertyGraphStore()
        s.upsert_triple(Triple("A", "R1", "B", subject_type="product"))
        s.upsert_triple(Triple("A", "R2", "C"))
        stats = s.statistics()
        assert stats["total_nodes"] == 3
        assert stats["relationships_by_type"] == {"R1": 1, "R2": 1}
        assert stats["nodes_by_label"]["product"] == 1

    def test_save_load_roundtrip(self, tmp_path):
        s = PropertyGraphStore()
        s.upsert_triple(Triple("A", "has part", "B", subject_type="product"))
        s.upsert_triple(Triple("B", "IS_A", "C", source_id="chunk7"))
        p = tmp_path / "graph.json"
        s.save(p)
        s2 = PropertyGraphStore.load(p)
        assert s2.triples() == s.triples()
        assert s2.get_node("A").label == "product"

    def test_to_csr_symmetrized(self):
        s = PropertyGraphStore()
        s.upsert_triple(Triple("A", "HAS", "B"))
        s.upsert_triple(Triple("B", "NEXT", "C"))
        csr, type_names = s.to_csr()
        assert csr.num_nodes == 3
        # from_edges symmetrizes: 2 directed triples -> 4 CSR edges
        assert csr.num_edges == 4
        assert set(type_names) == {"HAS", "NEXT"}
        assert csr.directed_counts == {"HAS": 1, "NEXT": 1}
        nbrs, types = csr.neighbors_of(0)  # A
        assert list(nbrs) == [1]

    def test_to_csr_empty_store_keeps_discovered_vocab(self):
        """Zero triples must still mark the lowered graph as discovered-vocab
        (catch-all relation), not silently fall back to the AdventureWorks
        EDGE_TYPES whitelist (which flips the engine's ELL path)."""
        from hcrag_tpu.core import property_graph as pg

        s = PropertyGraphStore()
        s.upsert_node("lonely")
        csr, type_names = s.to_csr()
        assert type_names == [pg.CATCHALL_RELATION]
        assert csr.edge_type_vocab == [pg.CATCHALL_RELATION]
        assert csr.num_edges == 0

    def test_relation_vocab_cap(self):
        from hcrag_tpu.core import property_graph as pg

        s = PropertyGraphStore()
        for i in range(pg.MAX_RELATION_TYPES + 5):
            s.upsert_triple(Triple(f"A{i}", f"REL_{i:03d}", f"B{i}"))
        csr, type_names = s.to_csr()
        assert len(type_names) <= pg.MAX_RELATION_TYPES + 1
        assert pg.CATCHALL_RELATION in type_names
        assert int(csr.edge_type.max()) < len(type_names) <= 127


class TestBuilderEndToEnd:
    def test_build_from_corpus_offline(self):
        texts = [ROW_TEXT, PROSE]
        metadata = [ROW_META, {"id": "c0", "type": "pdf_document",
                               "document_name": "Doc", "chunk_index": 0}]
        store = PropertyGraphBuilder("auto").build_from_corpus(texts, metadata)
        assert store.num_nodes > 3
        assert store.num_triples > 3
        # auto mode = simple + dynamic; dynamic adds no new predicates beyond
        # the discovered (simple-derived) schema, so predicates come from rows
        # and prose verbs.
        rels = set(store.relation_types())
        assert "COLOR" in {r.upper() for r in rels} or "Color" in rels

    def test_link_sources(self):
        store = PropertyGraphBuilder("simple", link_sources=True).build_from_corpus(
            [ROW_TEXT], [ROW_META]
        )
        assert any(p == "MENTIONED_IN" for _, p, _ in store.triples())

    def test_graph_index_integration(self):
        from hcrag_tpu.ingest.path_extract import build_graph_index

        store = PropertyGraphBuilder("simple").build_from_corpus(
            [ROW_TEXT, PROSE], [ROW_META, {"id": "c0"}]
        )
        index, csr, type_names = build_graph_index(store)
        assert index.n == store.num_nodes == csr.num_nodes
        assert np.array_equal(
            csr.node_to_row, np.arange(store.num_nodes, dtype=np.int32)
        )
        # Retrieval over the extracted graph: the product entity is findable.
        from hcrag_tpu.models.embedder import HashingEmbedder

        texts = [store.node_text(n) for n in store.nodes()]
        emb = HashingEmbedder().fit(texts)
        q = emb.encode(["Mountain-100 Silver"])[0]
        sims = index.emb @ (q / np.linalg.norm(q))
        top = int(np.argmax(sims))
        assert "Mountain-100" in store.nodes()[top].name
