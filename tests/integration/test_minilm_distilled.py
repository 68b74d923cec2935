"""Distilled-to-golden MiniLM encoder (tools/distill_minilm.py).

The reference pickle stores 585 (text, real all-MiniLM-L6-v2 vector) pairs;
the distilled encoder is the in-repo MiniLM architecture trained to
reproduce them with a corpus-built WordPiece vocab.  These tests activate
when the distilled artifacts exist (they are produced on TPU and committed);
they are SEPARATE from test_minilm_golden.py, which is reserved for
HF-converted weights and keeps its skip until real MiniLM weights land.
"""

import pickle

import numpy as np
import pytest

from hcrag_tpu.models.minilm import load_distilled_embedder

emb = load_distilled_embedder()

pytestmark = pytest.mark.skipif(
    emb is None,
    reason="distilled MiniLM artifacts absent (run tools/distill_minilm.py on TPU)",
)


@pytest.fixture(scope="module")
def golden(reference_pickle_path):
    with open(reference_pickle_path, "rb") as f:
        data = pickle.load(f)
    ref = np.asarray(data["embeddings"], dtype=np.float32)
    ref /= np.maximum(np.linalg.norm(ref, axis=1, keepdims=True), 1e-12)
    return data["texts"], ref


class TestDistilledEncoder:
    def test_corpus_cosine_floor(self, golden):
        """The distillation target: >=0.99 cosine vs the real MiniLM vectors
        across a spread of all three metadata regions (rows 0-572 tables /
        573-578 json / 579-584 pdf)."""
        texts, ref = golden
        sample = list(range(0, 573, 40)) + [573, 575, 579, 582, 584]
        got = emb.encode([texts[i] for i in sample])
        cos = np.sum(got * ref[sample], axis=1)
        assert cos.min() >= 0.99, f"min cosine {cos.min():.4f} at {sample[int(cos.argmin())]}"
        assert cos.mean() >= 0.995

    def test_retrieval_set_agreement(self, golden):
        """Query the reference index with DISTILLED query embeddings of the
        corpus texts: top-10 retrieved sets must overlap the true-MiniLM
        retrieval >= 9/10 on average — the actual bar that matters for
        reference-comparable novel-text querying."""
        texts, ref = golden
        sample = list(range(0, 585, 30))
        q = emb.encode([texts[i] for i in sample])
        overlaps = []
        for row, qv in zip(sample, q):
            got_ids = np.argsort(ref @ qv)[::-1][:10]
            want_ids = np.argsort(ref @ ref[row])[::-1][:10]
            overlaps.append(len(set(got_ids) & set(want_ids)) / 10)
        assert np.mean(overlaps) >= 0.9, f"mean top-10 overlap {np.mean(overlaps):.3f}"

    def test_novel_text_lands_in_domain(self, golden):
        """A paraphrased query (not a corpus string) must retrieve
        semantically matching rows in the reference embedding space."""
        texts, ref = golden
        qv = emb.encode(["mountain bike with silver frame"])[0]
        top = np.argsort(ref @ qv)[::-1][:10]
        hits = [texts[i].lower() for i in top]
        assert any("mountain" in h for h in hits)

    def test_deterministic(self):
        a = emb.encode(["HL Road Frame, 58"])
        b = emb.encode(["HL Road Frame, 58"])
        np.testing.assert_array_equal(a, b)

    def test_normalized_output(self):
        out = emb.encode(["Touring-1000 Blue, 50", "chain stay"])
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

    def test_short_max_len_is_invariant(self):
        """Query-batch fast path: max_len=64 must produce the SAME embedding
        as the full 192-token setting for texts that fit (attention and mean
        pooling both mask padding) — the bench's text->results row relies on
        this."""
        texts = ["mountain bike with silver frame", "HL Road Frame, 58"]
        full = emb.encode(texts)
        short = emb.encode(texts, max_len=64)
        np.testing.assert_allclose(short, full, atol=1e-5)
