"""Unit tests for DenseIndex, CsrGraph, and the AdventureWorks build."""

import numpy as np
import pytest

from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.core.graph import CsrGraph
from hcrag_tpu.core.types import EDGE_TYPES, edge_type_id
from hcrag_tpu.ingest.adventureworks import (
    analyze_ingested_documents,
    build_adventureworks,
    load_csv_data,
    process_corpus,
)
from hcrag_tpu.ingest.csv_ingest import analyze_data_patterns, process_csv_table
from hcrag_tpu.ingest.pdf_ingest import chunk_text

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def bundle(reference_pickle_path):
    return build_adventureworks(
        DATA_DIR, reference_pickle=reference_pickle_path
    )


class TestDenseIndex:
    def test_from_reference_pickle(self, reference_pickle_path):
        idx = DenseIndex.from_reference_pickle(reference_pickle_path)
        assert idx.n == 585 and idx.dim == 384
        norms = np.linalg.norm(np.asarray(idx.emb, np.float32), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_type_ids_derived_from_metadata(self, reference_pickle_path):
        idx = DenseIndex.from_reference_pickle(reference_pickle_path)
        from hcrag_tpu.core.types import NODE_TYPES

        # Product rows -> product; pdf rows -> document; json -> specification
        assert NODE_TYPES[idx.type_ids[0]] == "product"
        pdf_rows = [i for i, m in enumerate(idx.metadata) if m["type"] == "pdf_document"]
        assert all(NODE_TYPES[idx.type_ids[i]] == "document" for i in pdf_rows)
        json_rows = [i for i, m in enumerate(idx.metadata) if m["type"] == "json_table"]
        assert all(NODE_TYPES[idx.type_ids[i]] == "specification" for i in json_rows)

    def test_save_load_roundtrip(self, tmp_path, reference_pickle_path):
        idx = DenseIndex.from_reference_pickle(reference_pickle_path)
        idx.save(tmp_path)
        idx2 = DenseIndex.load(tmp_path)
        np.testing.assert_array_equal(
            np.asarray(idx.emb, np.float32), np.asarray(idx2.emb, np.float32)
        )
        np.testing.assert_array_equal(idx.entity_bits, idx2.entity_bits)
        assert idx.texts == idx2.texts
        assert idx.vocab.entity_to_id == idx2.vocab.entity_to_id

    def test_content_statistics(self, reference_pickle_path):
        idx = DenseIndex.from_reference_pickle(reference_pickle_path)
        stats = idx.content_statistics()
        assert stats["content_types"] == {
            "database_table": 573, "json_table": 6, "pdf_document": 6,
        }
        assert stats["database_tables"]["Product"] == 100


class TestCsrGraph:
    def test_symmetrization_and_dedup(self):
        # Two nodes, both ordered SAME_CATEGORY edges emitted (as the Cypher
        # pair-grid does): adjacency must contain each direction exactly once.
        g = CsrGraph.from_edges(
            2,
            np.array([0, 1]),
            np.array([1, 0]),
            np.array([edge_type_id("SAME_CATEGORY")] * 2),
            node_labels=["Product", "Product"],
            node_keys=[1, 2],
            node_texts=["a", "b"],
        )
        nbrs, types = g.neighbors_of(0)
        assert nbrs.tolist() == [1]
        nbrs, _ = g.neighbors_of(1)
        assert nbrs.tolist() == [0]
        assert g.statistics()["relationships"]["SAME_CATEGORY"] == 2

    def test_ell_whitelist_filtering(self):
        g = CsrGraph.from_edges(
            3,
            np.array([0, 0]),
            np.array([1, 2]),
            np.array(
                [edge_type_id("SAME_CATEGORY"), edge_type_id("DESCRIBED_BY")]
            ),
            node_labels=["Product", "Product", "Document"],
            node_keys=[1, 2, "d.pdf"],
            node_texts=["a", "b", "d"],
        )
        ell = g.to_ell(("ANNOTATION", "DESCRIBED_BY"))
        assert ell.neighbors[0].tolist()[0] == 2  # only the DESCRIBED_BY edge
        assert ell.degrees[0] == 1
        assert ell.degrees[1] == 0  # SAME_CATEGORY neighbor filtered out
        assert ell.degrees[2] == 1  # reverse DESCRIBED_BY

    def test_max_degree_cap_is_deterministic(self):
        src = np.zeros(5, dtype=int)
        dst = np.arange(1, 6)
        g = CsrGraph.from_edges(
            6, src, dst, np.full(5, edge_type_id("ANNOTATION")),
            node_labels=["Annotation"] * 6,
            node_keys=list(range(6)),
            node_texts=[""] * 6,
        )
        ell = g.to_ell(max_degree=3)
        assert ell.neighbors[0].tolist() == [1, 2, 3]  # first-created win
        assert ell.degrees[0] == 5  # true degree preserved


class TestAdventureWorksBuild:
    def test_node_counts(self, bundle):
        stats = bundle.graph.statistics()
        assert stats["nodes"] == {
            "Product": 100, "Category": 41, "Document": 4, "Annotation": 9,
        }

    def test_all_edge_types_present(self, bundle):
        rels = bundle.graph.statistics()["relationships"]
        for et in EDGE_TYPES:
            assert et in rels and rels[et] > 0, et

    def test_annotation_edges_match_side_files(self, bundle):
        # 9 side files (3 jpg + 6 json) -> 9 ANNOTATION edges.
        assert bundle.graph.statistics()["relationships"]["ANNOTATION"] == 9

    def test_similar_price_rule_spot_check(self, bundle):
        g = bundle.graph
        csv = load_csv_data(DATA_DIR)
        prods = csv["products"]
        prices = {}
        for _, row in prods.iterrows():
            p = row.get("ListPrice")
            prices[int(row["ProductID"])] = float(str(p).replace(",", "."))
        # pick a product node and verify each SIMILAR_PRICE neighbor satisfies
        # the rule in at least one direction (adjacency is undirected).
        et_sp = edge_type_id("SIMILAR_PRICE")
        checked = 0
        for node in range(g.num_nodes):
            if g.node_labels[node] != "Product":
                continue
            p1 = prices[int(g.node_keys[node])]
            nbrs, types = g.neighbors_of(node)
            for nb, t in zip(nbrs, types):
                if t != et_sp:
                    continue
                p2 = prices[int(g.node_keys[nb])]
                ok = (
                    p1 > 0 and p2 > 0
                    and (
                        abs(p1 - p2) / p1 <= 0.20 or abs(p1 - p2) / p2 <= 0.20
                    )
                )
                assert ok, (p1, p2)
                checked += 1
            if checked > 200:
                break
        assert checked > 0

    def test_row_node_crosslinks(self, bundle):
        idx, g = bundle.index, bundle.graph
        # 100 products + 41 categories + 6 json + 6 pdf = 153 linked rows
        assert int((idx.graph_ids >= 0).sum()) == 153
        # every linked row round-trips through node_to_row to a row of the
        # same entity (may be another chunk/annotation of the same document)
        for row in np.flatnonzero(idx.graph_ids >= 0)[:50]:
            node = idx.graph_ids[row]
            back = g.node_to_row[node]
            assert back >= 0

    def test_described_by_mountain_bridge(self, bundle):
        g = bundle.graph
        et_db = edge_type_id("DESCRIBED_BY")
        doc_node = next(
            i for i, lbl in enumerate(g.node_labels)
            if lbl == "Document" and "Mountain Bike Manual" in g.node_texts[i]
        )
        nbrs, types = g.neighbors_of(doc_node)
        mountain_products = [
            g.node_texts[nb] for nb, t in zip(nbrs, types) if t == et_db
        ]
        assert len(mountain_products) > 0
        assert all("Mountain" in t for t in mountain_products)


class TestIngestion:
    def test_csv_texts_byte_identical_to_reference(self, reference_pickle_path):
        import pickle

        ref = pickle.load(open(reference_pickle_path, "rb"))
        texts, metadata = process_corpus(DATA_DIR)
        assert len(texts) == len(ref["texts"]) == 585
        for i, (rt, rm) in enumerate(zip(ref["texts"], ref["metadata"])):
            if rm.get("type") == "database_table":
                assert texts[i] == rt, f"row {i} ({rm['id']}) text differs"
                assert metadata[i]["id"] == rm["id"]
                assert metadata[i].get("entity_id") == rm.get("entity_id")

    def test_json_texts_match_reference_set(self, reference_pickle_path):
        import pickle

        ref = pickle.load(open(reference_pickle_path, "rb"))
        texts, metadata = process_corpus(DATA_DIR)
        ref_json = {
            m["id"]: t
            for t, m in zip(ref["texts"], ref["metadata"])
            if m["type"] == "json_table"
        }
        our_json = {
            m["id"]: t
            for t, m in zip(texts, metadata)
            if m["type"] == "json_table"
        }
        assert our_json == ref_json  # same ids, byte-identical texts

    def test_pdf_texts_byte_identical_by_id(self, reference_pickle_path):
        """All six pdf_document chunk texts byte-equal the pickle's (the
        ligature expansion in minipdf closes the last 1-2 char gaps vs the
        reference's pdfplumber stack; round-4 VERDICT item 4)."""
        import pickle

        ref = pickle.load(open(reference_pickle_path, "rb"))
        texts, metadata = process_corpus(DATA_DIR)
        ref_pdf = {
            m["id"]: t
            for t, m in zip(ref["texts"], ref["metadata"])
            if m["type"] == "pdf_document"
        }
        our_pdf = {
            m["id"]: t
            for t, m in zip(texts, metadata)
            if m["type"] == "pdf_document"
        }
        assert set(our_pdf) == set(ref_pdf)
        for rid in ref_pdf:
            assert our_pdf[rid] == ref_pdf[rid], f"{rid} differs"

    def test_ligature_expansion_in_minipdf(self):
        from hcrag_tpu.ingest.minipdf import _LIGATURE_TRANS

        assert "ﬁt ﬂow oﬃce".translate(_LIGATURE_TRANS) == "fit flow office"

    def test_column_analysis_once_per_table(self):
        import pandas as pd

        df = pd.DataFrame(
            {
                "LongDescription": [f"a unique long description text {i}" for i in range(20)],
                "Code": [f"C{i}" for i in range(20)],
                "Flag": ["y"] * 20,
            }
        )
        fa = analyze_data_patterns(df)
        assert fa["LongDescription"]["importance"] == "high"
        assert fa["Code"]["importance"] == "medium"
        assert fa["Flag"]["importance"] == "low"

    def test_chunker_reference_semantics(self):
        text = "Sentence one. " * 200  # 2800 chars
        chunks = chunk_text(text, max_chunk_size=1000, overlap=100)
        assert all(len(c) <= 1000 for c in chunks)
        assert len(chunks) >= 3
        # short text -> single chunk untouched
        assert chunk_text("short", 1000, 100) == ["short"]

    def test_document_grouping(self):
        docs = analyze_ingested_documents(DATA_DIR)
        assert len(docs) == 4
        manual = docs["Mountain Bike Manual"]
        assert manual["pdf"] is not None
        assert len(manual["annotations"]) >= 1
