"""Tests for the serving executor, fixtures, hybrid search and text ingestion."""

import numpy as np
import pytest

from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.query.engine import QueryEngine

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def engine():
    b = build_adventureworks(DATA_DIR)
    return QueryEngine(b.index, b.graph)


class TestBatchedExecutor:
    def test_serves_all_requests(self, engine):
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=8, top_k=5, max_wait_ms=5)
        futs = [
            ex.submit(np.asarray(engine.index.emb[i], np.float32))
            for i in range(20)
        ]
        results = [f.result(timeout=120) for f in futs]
        ex.shutdown()
        assert len(results) == 20
        # each query is an index row: rank-0 hit must be itself
        for i, (scores, indices) in enumerate(results):
            assert indices[0] == i
            assert scores[0] == pytest.approx(1.0, abs=1e-4)
        assert ex.batches_dispatched >= 3  # 20 reqs / batch 8

    def test_full_mode_returns_complete_results(self, engine):
        """mode='full' futures carry everything the dispatched step computed
        (relevance, combined, expansion) — no device work is discarded."""
        from hcrag_tpu.query.executor import BatchedExecutor, ServedResult

        ex = BatchedExecutor(
            engine, batch_size=4, top_k=5, max_wait_ms=5, mode="full"
        )
        futs = [
            ex.submit(np.asarray(engine.index.emb[i], np.float32))
            for i in range(6)
        ]
        results = [f.result(timeout=120) for f in futs]
        ex.shutdown()
        for i, r in enumerate(results):
            assert isinstance(r, ServedResult)
            assert r.top_indices[0] == i
            assert r.relevance.shape == (5,)
            assert r.combined.shape == (5,)
            assert (r.relevance >= 0).all()
            assert r.expanded_count >= 0
            # combined = 0.7*rel + 0.3*sim must hold per served request
            np.testing.assert_allclose(
                r.combined, 0.7 * r.relevance + 0.3 * r.top_scores, atol=1e-5
            )

    def test_retrieval_mode_matches_engine(self, engine):
        """Retrieval-only serving must agree with the blocking engine API."""
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=4, top_k=5, max_wait_ms=5)
        q = np.asarray(engine.index.emb[3], np.float32)
        scores, indices = ex.submit(q).result(timeout=120)
        ex.shutdown()
        ref = engine.query_batch(q, top_k=5)
        np.testing.assert_array_equal(indices, ref.top_indices[0])
        np.testing.assert_allclose(scores, ref.top_scores[0], atol=1e-5)

    def test_shutdown_idempotent(self, engine):
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=4)
        ex.shutdown()
        ex.shutdown()


class TestSampleFixtures:
    def test_eighteen_typed_nodes(self):
        from hcrag_tpu.testing import create_sample_nodes

        nodes = create_sample_nodes()
        assert len(nodes) == 18
        types = {n.node_type for n in nodes}
        assert {"product", "document", "specification", "category"} <= types
        # deterministic embeddings
        again = create_sample_nodes()
        np.testing.assert_array_equal(nodes[0].embeddings, again[0].embeddings)

    def test_fixture_scoring_orders_relevance(self):
        from hcrag_tpu.core.types import ScorerType
        from hcrag_tpu.pipeline.isrelevant import batch_isRelevant
        from hcrag_tpu.testing import create_sample_nodes, create_sample_query

        query = create_sample_query()
        nodes = create_sample_nodes()
        scores = batch_isRelevant(query, nodes, ScorerType.COMPOSITE)
        ranked = [n.text for _, n in sorted(zip(scores, nodes), key=lambda x: -x[0])]
        # the red mountain bike product must beat the garden hose
        red_bike = next(i for i, t in enumerate(ranked) if "Trail Blazer" in t)
        hose = next(i for i, t in enumerate(ranked) if "Garden Hose" in t)
        assert red_bike < hose


class TestHybridAndSimilar:
    def test_hybrid_search_returns_products_with_relations(self, engine):
        items = engine.hybrid_search("mountain bike", limit=3)
        assert 0 < len(items) <= 3
        for item in items:
            assert "similarity_score" in item
            assert isinstance(item["related_products"], list)

    def test_hybrid_search_reference_dict_shape(self, engine):
        """Result fields match hybrid_search_example exactly
        (knowledge_graph.py:500-507): name/price/category come from the
        product's graph record, not the entity id."""
        items = engine.hybrid_search("mountain bike", limit=3)
        assert items, "expected at least one product hit"
        for item in items:
            assert set(item) == {
                "name", "price", "category", "similarity_score",
                "related_products", "embedding_text",
            }
            assert isinstance(item["name"], str) and item["name"]
            assert not item["name"].isdigit()  # a product NAME, not an id
            assert item["price"] is None or isinstance(item["price"], float)
            assert item["category"] is None or isinstance(item["category"], str)
            assert item["embedding_text"].endswith("...")
            assert len(item["related_products"]) <= 3

    def test_query_similar_products_sorted_by_price(self, engine):
        pid = engine.graph.node_keys[0]
        out = engine.query_similar_products(pid, limit=5)
        assert len(out) <= 5
        prices = [r["price"] for r in out]
        assert prices == sorted(prices)
        assert all(
            r["relationship_type"] in (
                "SAME_CATEGORY", "SAME_MODEL", "SIMILAR_PRICE",
                "COMPATIBLE_PRODUCT", "COMPLEMENTARY_PRODUCT", "DESCRIBED_BY",
            )
            for r in out
        )

    def test_query_similar_unknown_id(self, engine):
        assert engine.query_similar_products(999999) == []


class TestTextIngestion:
    def test_txt_files_chunked(self, tmp_path):
        from hcrag_tpu.ingest.adventureworks import process_corpus

        (tmp_path / "notes.txt").write_text("A sentence. " * 200)
        (tmp_path / "README.md").write_text("# Title\nSome content here.")
        texts, metadata = process_corpus(tmp_path)
        text_docs = [m for m in metadata if m["type"] == "text_document"]
        assert len(text_docs) >= 3  # notes chunks + readme
        names = {m["document_name"] for m in text_docs}
        assert names == {"notes", "README"}
        from hcrag_tpu.ingest.entities import metadata_node_type

        assert metadata_node_type(text_docs[0]) == "document"

    def test_native_embedder_available(self):
        # The C++ fasthash library must build in this environment.
        from hcrag_tpu import native

        assert native.available()
        out = native.embed_batch(["hello world"], 64)
        assert out.shape == (1, 64)
        np.testing.assert_allclose(np.linalg.norm(out[0]), 1.0, atol=1e-5)

    def test_native_python_parity(self):
        from hcrag_tpu import native
        from hcrag_tpu.models.embedder import HashingEmbedder

        if not native.available():
            pytest.skip("no native toolchain")
        texts = ["Red Mountain Bike 42", "completely different text!"]
        emb = HashingEmbedder(dim=128)
        emb.fit(texts)
        native_out = emb.encode(texts)
        py_out = np.stack([emb.encode_one(t) for t in texts])
        np.testing.assert_allclose(native_out, py_out, atol=1e-6)


class TestIncrementalUpdates:
    def test_append_and_refresh(self):
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(256, 64, seed=11)
        eng = QueryEngine(idx, None)
        rng = np.random.default_rng(0)
        new_emb = rng.standard_normal((4, 64)).astype(np.float32)
        new_emb /= np.linalg.norm(new_emb, axis=1, keepdims=True)
        idx.append(
            new_emb,
            [{"id": f"new_{i}", "type": "database_table",
              "table_name": "New"} for i in range(4)],
            [f"new row {i}" for i in range(4)],
        )
        assert idx.n == 260
        eng.refresh_index()
        # a new row must now be retrievable as its own top hit
        r = eng.query_batch(new_emb[2], top_k=1)
        assert r.top_indices[0][0] == 258
        # O(1) metadata lookup map was invalidated and rebuilt
        assert idx.row_of_metadata({"id": "new_0"}) == 256

    def test_delete_tombstones(self):
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(128, 64, seed=12)
        eng = QueryEngine(idx, None)
        mask = idx.delete_rows([5])
        # monkeypatch type_mask to inject the tombstone mask
        idx.type_mask = lambda t: mask
        r = eng.query_batch(
            np.asarray(idx.emb[5], np.float32), top_k=3,
            category_filter="tombstoned",
        )
        assert 5 not in r.top_indices[0].tolist()

    def test_mask_where_predicate(self):
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(64, 32, seed=13)
        mask = idx.mask_where(lambda m: m["row_index"] % 2 == 0)
        assert mask.sum() == 32


class TestNativeWordPiece:
    """Native (C++) WordPiece tokenizer — byte-exact vs the Python
    reference on corpus texts and adversarial strings."""

    @pytest.fixture(scope="class")
    def tok(self):
        import os

        from hcrag_tpu.models.minilm import WordPieceTokenizer

        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        vocab = os.path.join(repo, "tools", "minilm_distilled_vocab.txt")
        if not os.path.exists(vocab):
            pytest.skip("distilled vocab absent")
        return WordPieceTokenizer(vocab, max_len=192)

    def test_native_available_and_corpus_parity(self, tok):
        import pickle

        native = tok._native_tokenizer()
        if native is None:
            pytest.skip("native toolchain unavailable")
        with open(
            "/root/reference/experiments/knowledge_graph_embeddings.pkl", "rb"
        ) as f:
            texts = pickle.load(f)["texts"]
        ids_n, mask_n = native.encode_batch(
            texts, 192, lowercase=True, cls_id=tok.cls_id,
            sep_id=tok.sep_id, unk_id=tok.unk_id,
        )
        ids_p, mask_p = tok._encode_batch_py(texts, 192)
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(mask_n, mask_p)

    def test_adversarial_strings_parity(self, tok):
        native = tok._native_tokenizer()
        if native is None:
            pytest.skip("native toolchain unavailable")
        texts = [
            "",
            "   ",
            "a",
            "UPPER lower MiXeD 123",
            "punctuation!!! and, some; (brackets) [here] {too} <ok>",
            "hyphen-ated under_scored dot.sep slash/sep",
            "word " * 300,  # truncation at max_len-1
            "x" * 500,      # one giant word -> char pieces or [UNK]
            "tabs\tand\nnewlines\r\nmixed \x1c tokens",
            "unicode café — dash   nbsp 　 ideographic",
            "emoji \U0001F6B2 ride",
            "price: $1,234.56 (20% off!)",
        ]
        for ml in (16, 64, 192):
            ids_n, mask_n = native.encode_batch(
                texts, ml, lowercase=True, cls_id=tok.cls_id,
                sep_id=tok.sep_id, unk_id=tok.unk_id,
            )
            ids_p, mask_p = tok._encode_batch_py(texts, ml)
            np.testing.assert_array_equal(ids_n, ids_p, err_msg=f"max_len={ml}")
            np.testing.assert_array_equal(mask_n, mask_p)

    def test_python_fallback_when_native_absent(self, tok):
        """Forcing the native handle away must silently use the Python path
        with identical output (the graceful-degradation contract)."""
        texts = ["mountain bike", "price: $9.99"]
        want = tok._encode_batch_py(texts, 32)
        saved = (tok._native, tok._native_tried)
        try:
            tok._native, tok._native_tried = None, True
            got = tok.encode_batch(texts, max_len=32)
        finally:
            tok._native, tok._native_tried = saved
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


class TestNativeUnicodeGuards:
    """Round-4 ADVICE fix: the C++ tokenizer lowercases ASCII only, so the
    native path must be refused for non-ASCII vocabs and non-ASCII texts
    must route through the full-Unicode Python path."""

    def _write_vocab(self, tmp_path, words):
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(words) + "\n", encoding="utf-8")
        return str(p)

    def test_unicode_lowercase_text_hits_vocab(self, tmp_path):
        from hcrag_tpu.models.minilm import WordPieceTokenizer

        # The word splitter emits non-ASCII chars as standalone tokens, so
        # the divergence-prone vocab entries are single non-ASCII chars:
        # Python lowers 'É' -> 'é' (vocab hit), ASCII-only lowering misses.
        # The public encode_batch must take the Python path for such text
        # even when the native tokenizer is active.
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "é", "bike", "##s"]
        tok = WordPieceTokenizer(self._write_vocab(tmp_path, vocab))
        ids, _ = tok.encode_batch(["É"], max_len=8)
        assert ids[0, 1] == tok.vocab["é"]
        ids2, _ = tok.encode_batch(["bikes"], max_len=8)
        assert list(ids2[0, 1:3]) == [tok.vocab["bike"], tok.vocab["##s"]]

    def test_non_ascii_vocab_native_ok_without_lowercase(self, tmp_path):
        from hcrag_tpu.models.minilm import WordPieceTokenizer

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "café", "bike"]
        tok = WordPieceTokenizer(
            self._write_vocab(tmp_path, vocab), lowercase=False
        )
        native = tok._native_tokenizer()
        if native is None:
            pytest.skip("native toolchain unavailable")
        ids_n, mask_n = tok.encode_batch(["café bike"], max_len=8)
        ids_p, mask_p = tok._encode_batch_py(["café bike"], 8)
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(mask_n, mask_p)

    def test_mixed_batch_routes_non_ascii_rows_to_python(self, tmp_path):
        from hcrag_tpu.models.minilm import WordPieceTokenizer

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "bike", "ride", "##r"]
        tok = WordPieceTokenizer(self._write_vocab(tmp_path, vocab))
        if tok._native_tokenizer() is None:
            pytest.skip("native toolchain unavailable")
        texts = ["bike rider", "CAFÉ É ride", "ride", "É" * 40]
        got_ids, got_mask = tok.encode_batch(texts, max_len=16)
        want_ids, want_mask = tok._encode_batch_py(texts, 16)
        np.testing.assert_array_equal(got_ids, want_ids)
        np.testing.assert_array_equal(got_mask, want_mask)


class TestDispatcherDeadline:
    """Round-4 fix: _collect must hold a batch open at most ~max_wait_ms
    TOTAL from the first request, not max_wait_ms per empty slot (which
    made a trickling queue wait batch_size*max_wait before shipping)."""

    def test_partial_batch_ships_within_total_deadline(self, engine):
        import time

        from hcrag_tpu.query.executor import BatchedExecutor

        # Big batch + measurable wait: old behavior would hold the batch up
        # to 64 * 50 ms = 3.2 s; new behavior ships after ~50 ms.
        ex = BatchedExecutor(engine, batch_size=64, top_k=5, max_wait_ms=50)
        # warm the jitted path so compile time doesn't skew the measurement
        ex.submit(np.asarray(engine.index.emb[0], np.float32)).result(
            timeout=120
        )
        t0 = time.monotonic()
        f = ex.submit(np.asarray(engine.index.emb[1], np.float32))
        _scores, indices = f.result(timeout=120)
        latency = time.monotonic() - t0
        ex.shutdown()
        assert indices[0] == 1
        # generous bound: deadline 50 ms + device step + slack; the OLD
        # behavior would take > 3 s on an idle queue at this batch size
        assert latency < 1.5, f"partial batch held {latency:.2f}s"

    def test_bulk_drain_fills_batches(self, engine):
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=16, top_k=5, max_wait_ms=2)
        futs = [
            ex.submit(np.asarray(engine.index.emb[i % 100], np.float32))
            for i in range(64)
        ]
        for f in futs:
            f.result(timeout=120)
        ex.shutdown()
        # 64 pre-queued requests at batch 16 -> ~4-5 batches, not 64
        assert ex.batches_dispatched <= 8


class TestExecutorRound5:
    """Round-5 serving hot-path redesign (VERDICT next-1)."""

    def test_submit_many_matches_engine(self, engine):
        """The vectorized submission path serves every request correctly."""
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=8, top_k=5, max_wait_ms=5)
        embs = np.asarray(engine.index.emb[:20], np.float32)
        futs = ex.submit_many(embs)
        results = [f.result(timeout=120) for f in futs]
        ex.shutdown()
        assert len(results) == 20
        for i, (scores, indices) in enumerate(results):
            assert indices[0] == i
            assert scores[0] == pytest.approx(1.0, abs=1e-4)
        # resolve_time is stamped once per batch for open-loop latency
        assert all(f.resolve_time > 0 for f in futs)

    def test_adaptive_dispatch_sizes(self, engine):
        """A lone request ships in the SMALLEST configured size; a bulk
        backlog uses the large one (mean fill proves both paths ran)."""
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(
            engine, batch_size=32, top_k=5, max_wait_ms=2,
            batch_sizes=(4, 32),
        )
        s, i = ex.submit(np.asarray(engine.index.emb[0], np.float32)).result(
            timeout=120
        )
        assert i[0] == 0
        futs = ex.submit_many(np.asarray(engine.index.emb[:32], np.float32))
        for f in futs:
            f.result(timeout=120)
        ex.shutdown()
        assert ex.batches_dispatched == 2
        assert ex.requests_served == 33

    def test_shutdown_fails_pending_futures(self, engine):
        """Futures still queued at shutdown raise instead of hanging
        forever (round-4 ADVICE: the fill loop ignored _stop)."""
        import threading

        from hcrag_tpu.query import executor as exmod

        class _StallEngine:
            index = engine.index

            def retrieve_batch_device(self, batch, top_k):
                stall.wait(5)
                raise RuntimeError("stalled")

        stall = threading.Event()
        ex = exmod.BatchedExecutor(
            _StallEngine(), batch_size=4, top_k=5, max_wait_ms=1
        )
        futs = [
            ex.submit(np.zeros(engine.index.dim, np.float32))
            for _ in range(12)
        ]
        stall.set()
        ex.shutdown()
        n_failed = 0
        for f in futs:
            try:
                f.result(timeout=5)
            except (RuntimeError, TimeoutError):
                n_failed += 1
        assert n_failed == len(futs)

    def test_done_callback_after_resolution(self, engine):
        from hcrag_tpu.query.executor import BatchedExecutor

        ex = BatchedExecutor(engine, batch_size=4, top_k=5, max_wait_ms=2)
        fired = []
        f = ex.submit(np.asarray(engine.index.emb[2], np.float32))
        f.add_done_callback(lambda fut: fired.append(fut.resolve_time))
        f.result(timeout=120)
        ex.shutdown()
        # callback registered late still fires exactly once
        f.add_done_callback(lambda fut: fired.append("late"))
        assert len(fired) == 2 and fired[1] == "late"
