"""One-command behavioral parity verification against the reference.

Builds the index from the reference's shipped pickle, replays retrieval and
scoring through NumPy re-implementations of the reference algorithms, and
reports exact-match statistics.  Runs on CPU in ~1 minute:

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/verify_parity.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU for real: sitecustomize pre-imports jax, so the JAX_PLATFORMS
# env var alone is too late here (NOTES.md).  Without this the parity run
# silently executes on the tunneled TPU — and the seeded agent replay then
# differs from the CPU-generated fixture by backend numerics.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

PKL = "/root/reference/experiments/knowledge_graph_embeddings.pkl"


def check(name, ok, detail=""):
    print(f"  [{'PASS' if ok else 'FAIL'}] {name} {detail}")
    return bool(ok)


def main():
    import pickle

    from hcrag_tpu.core.types import (
        PRIORITY_MATRIX, CompositeWeights, QueryIntent, ScorerType,
        node_type_id,
    )
    from hcrag_tpu.ingest.adventureworks import build_adventureworks, process_corpus
    from hcrag_tpu.pipeline.isrelevant import (
        batch_isRelevant, overlap_fallback_scores,
    )
    from hcrag_tpu.query import QueryEngine
    from hcrag_tpu.testing import create_sample_nodes, create_sample_query

    ok = True
    with open(PKL, "rb") as f:
        ref = pickle.load(f)
    emb = np.asarray(ref["embeddings"], np.float32)

    print("== retrieval parity (vs reference brute-force cosine) ==")
    bundle = build_adventureworks("/root/reference/data", reference_pickle=PKL)
    engine = QueryEngine(bundle.index, bundle.graph)
    rng = np.random.default_rng(123)
    queries = np.concatenate(
        [emb[rng.integers(0, 585, 32)],
         rng.standard_normal((32, 384)).astype(np.float32)]
    )
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    exact = 0
    for q in queries:
        qn = q / np.linalg.norm(q)
        ref_top = set(np.argsort(-(en @ qn), kind="stable")[:10].tolist())
        got = set(
            engine.query_batch(q, top_k=10).top_indices[0].tolist()
        )
        exact += got == ref_top
    ok &= check("recall@10 exact-set match", exact == len(queries),
                f"({exact}/{len(queries)} queries)")

    print("== ingestion parity (text representations) ==")
    texts, metadata = process_corpus("/root/reference/data")
    same = sum(
        t == rt
        for t, rt, m in zip(texts, ref["texts"], ref["metadata"])
        if m.get("type") == "database_table"
    )
    total = sum(1 for m in ref["metadata"] if m.get("type") == "database_table")
    ok &= check("CSV row texts byte-identical", same == total, f"({same}/{total})")
    # json_table + pdf_document rows: the pickle's row ORDER for these types
    # follows the reference machine's directory listing (not reproducible),
    # so compare BY ID — ids are deterministic (file/chunk derived) and the
    # id->text mapping is what retrieval semantics depend on.
    ref_by_id = {m["id"]: t for t, m in zip(ref["texts"], ref["metadata"])}
    for typ in ("json_table", "pdf_document"):
        rows = [(m["id"], t) for t, m in zip(texts, metadata)
                if m.get("type") == typ]
        n_same = sum(ref_by_id.get(i) == t for i, t in rows)
        n_total = sum(1 for m in ref["metadata"] if m.get("type") == typ)
        ok &= check(f"{typ} texts byte-identical (by id)",
                    n_same == n_total == len(rows),
                    f"({n_same}/{n_total})")
    ok &= check("all 585 ids covered",
                {m["id"] for m in metadata} == set(ref_by_id),
                f"({len(metadata)} rows)")

    print("== graph schema ==")
    stats = bundle.graph.statistics()
    ok &= check("node counts", stats["nodes"] == {
        "Product": 100, "Category": 41, "Document": 4, "Annotation": 9})
    ok &= check("all 7 edge types present",
                len(stats["relationships"]) == 7, str(stats["relationships"]))

    print("== scoring parity (reference formulas re-derived in NumPy) ==")
    q = create_sample_query()
    nodes = create_sample_nodes()
    sem = []
    for n_ in nodes:
        a, b = q.embeddings, n_.embeddings
        sem.append(((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b)) + 1) / 2)
    ent = []
    qset = set(q.entities)
    for n_ in nodes:
        ns = set(n_.entities)
        ent.append(
            (0.5 if not ns else 0.1) if not qset
            else len(qset & ns) / len(qset)
        )
    typ = [
        PRIORITY_MATRIX[q.intent.index, node_type_id(n_.node_type)]
        for n_ in nodes
    ]
    llm = overlap_fallback_scores(q, nodes)
    w = CompositeWeights()
    expected = [
        w.semantic_similarity * s + w.llm_judge * l + w.entity_match * e
        + w.node_type_priority * t
        for s, l, e, t in zip(sem, llm, ent, typ)
    ]
    got = batch_isRelevant(q, nodes, ScorerType.COMPOSITE)
    ok &= check("COMPOSITE formula", np.allclose(got, expected, atol=1e-5))
    got_par = batch_isRelevant(q, nodes, ScorerType.PARALLEL)
    exp_par = [max(s, l, e, t) for s, l, e, t in zip(sem, llm, ent, typ)]
    ok &= check("PARALLEL formula", np.allclose(got_par, exp_par, atol=1e-5))

    print("== constants ==")
    from hcrag_tpu import config as cfg

    ok &= check("thresholds", (cfg.SEMANTIC_GATE, cfg.HIGH_RELEVANCE,
                               cfg.FINAL_TOP_K, cfg.SAMPLE_LIMIT,
                               cfg.MAX_CONNECTED_NODES)
                == (0.60, 0.7, 15, 20, 20))
    ok &= check("weights default",
                CompositeWeights().as_array().tolist()
                == [np.float32(0.3), np.float32(0.45), np.float32(0.15),
                    np.float32(0.1)])

    print("== agent (seeded trace vs committed fixture) ==")
    # Round-5 VERDICT next-8: the rebuilt evaluate/revise agent replayed on
    # the real 585-row index with the fixture's seed must be byte-identical
    # to the committed artifact AND satisfy the reference wiring/threshold
    # invariants (neo4j_rag_langgraph.py:801-838).
    import json as _json

    from tools import agent_trace_fixture as atf

    try:
        with open(atf.FIXTURE) as f:
            fixture = _json.load(f)
        traces = atf.run_traces()
        same = traces == fixture
        if not same:
            for q in fixture:
                if traces.get(q) != fixture[q]:
                    keys = [
                        k for k in fixture[q]
                        if traces.get(q, {}).get(k) != fixture[q][k]
                    ] if isinstance(fixture[q], dict) else ["<entry>"]
                    print(f"    differs: {q!r} keys={keys}")
        ok &= check("deterministic replay == fixture", same,
                    f"({len([k for k in fixture if not k.startswith('_')])} "
                    "seeded questions)")
        problems = atf.check_invariants(traces)
        ok &= check("reference wiring/threshold invariants", not problems,
                    "" if not problems else str(problems[:3]))
    except FileNotFoundError:
        ok &= check("agent fixture present", False, "(run tools/agent_trace_fixture.py)")

    print("\nOVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
