"""Path extraction over the real AdventureWorks corpus, end to end:
directory -> extracted property graph -> DenseIndex + CsrGraph -> device
expansion.  Mirrors the reference's generic build flow
(`python graph_builder.py`, graph_builder.py:453-513)."""

import numpy as np
import pytest

from hcrag_tpu.ingest.path_extract import PropertyGraphBuilder, build_graph_index

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def store():
    return PropertyGraphBuilder("auto").build(DATA_DIR)


class TestCorpusExtraction:
    def test_scale_and_shape(self, store):
        # 573 CSV rows + json/pdf chunks produce a real graph, not a toy.
        assert store.num_nodes > 300
        assert store.num_triples > 500
        stats = store.statistics()
        assert stats["total_nodes"] == store.num_nodes
        # Product rows carry Color/ListPrice attribute paths.
        rels = set(store.relation_types())
        assert {"Color", "ListPrice"} & rels or {"COLOR", "LISTPRICE"} & {
            r.upper() for r in rels
        }

    def test_known_product_present(self, store):
        node = store.get_node("Mountain-100 Silver, 38")
        assert node is not None

    def test_implicit_mode_document_structure(self):
        s = PropertyGraphBuilder("implicit").build(DATA_DIR)
        rels = set(s.relation_types())
        assert "ROW_OF" in rels
        assert "ANNOTATES" in rels  # json table -> parent pdf
        assert "PART_OF" in rels  # pdf chunk -> document

    def test_file_extension_filter(self):
        s = PropertyGraphBuilder("implicit").build(DATA_DIR, file_extensions=[".csv"])
        assert set(s.relation_types()) == {"ROW_OF"}

    def test_device_expansion_over_extracted_graph(self, store):
        """The extracted graph lowers to ELL and runs the same static-shape
        expansion kernel as the hand-built schema (ops/expand.py)."""
        import jax.numpy as jnp

        from hcrag_tpu.ops.expand import expand_k_hop

        index, csr, type_names = build_graph_index(store)
        assert csr.num_nodes == store.num_nodes
        ell = csr.to_ell()
        seed = next(
            i for i, n in enumerate(store.nodes()) if "Mountain-100" in n.name
        )
        connected, count = expand_k_hop(
            jnp.asarray(ell.neighbors),
            jnp.array([seed], dtype=jnp.int32),
            depth=1,
            max_nodes=20,
        )
        count = int(count)
        assert count > 0
        got = set(np.asarray(connected)[:count].tolist())
        want, _ = csr.neighbors_of(seed)
        assert got <= set(want.tolist()) | {seed}
