"""Generic-ingestion property-graph extraction, end to end.

The reference's LlamaIndex stack builds a property graph from any directory
via LLM path extractors (`python graph_builder.py`, graph_builder.py:419-513).
This demo runs the TPU-native equivalent offline — deterministic extraction,
device-ready CSR lowering, retrieval + expansion over the extracted graph:

    JAX_PLATFORMS=cpu python examples/path_extraction.py [data_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from hcrag_tpu.ingest.path_extract import (  # noqa: E402
    PropertyGraphBuilder,
    build_graph_index,
)
from hcrag_tpu.models.embedder import HashingEmbedder  # noqa: E402
from hcrag_tpu.query.engine import QueryEngine  # noqa: E402
from hcrag_tpu.query.graph_query import GraphQuery, execute_graph_query  # noqa: E402


def main():
    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data"

    for mode in ("auto", "implicit"):
        builder = PropertyGraphBuilder(mode)
        store = builder.build(data_dir)
        stats = store.statistics()
        print(f"[{mode}] {stats['total_nodes']} nodes, "
              f"{stats['total_relationships']} relationships, "
              f"types: {list(stats['relationships_by_type'])[:8]}")

    # Retrieval + expansion over the extracted graph (same kernels as the
    # hand-built AdventureWorks schema).
    store = PropertyGraphBuilder("auto").build(data_dir)
    index, csr, type_names = build_graph_index(store)
    texts = [store.node_text(n) for n in store.nodes()]
    embedder = HashingEmbedder().fit(texts)
    engine = QueryEngine(index, csr, embedder=embedder)

    out = engine.process_query("Mountain-100 Silver mountain bike",
                               top_k=5, similarity_threshold=0.0)
    print("\ntop entities for 'Mountain-100 Silver mountain bike':")
    for r in out["results"]:
        print(f"  [{r['similarity_score']:.3f}] {r['content'][:70]}")

    q = embedder.encode(["Mountain-100 Silver mountain bike"]).astype(np.float32)
    res = engine.query_batch(q, top_k=5, expansion_depth=1)
    print(f"expanded graph nodes: {int(np.asarray(res.expanded_counts)[0])}")

    # Graph-pattern query over the discovered relation vocabulary.
    hits = execute_graph_query(
        csr, GraphQuery(text_contains="mountain-100", edge_type="COLOR", limit=2)
    )
    for h in hits:
        rels = {n["relationship"] for n in h["neighbors"]}
        print(f"pattern hit: {h['text'][:50]} -> {len(h['neighbors'])} "
              f"neighbors via {sorted(rels)[:4]}")


if __name__ == "__main__":
    main()
