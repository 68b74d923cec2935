"""Encoder in-domain confidence (models/confidence.py, round-4 VERDICT #5).

The calibrated signal itself is validated offline against holdout-encoder
labels (tools/encoder_confidence.py); these tests pin the query-time
machinery: feature math, determinism, the logistic/AUC utilities, and the
process_query surface."""

import numpy as np
import pytest

from hcrag_tpu.models.confidence import (
    auc_score,
    confidence_features,
    confidence_scores,
    confidence_variants,
    encoder_confidence,
    fit_logistic,
)


class _StubEmbedder:
    """Deterministic 'encoder': hash words into a small dense space so
    related phrasings land near each other and unrelated text far away."""

    def __init__(self, dim=32):
        self.dim = dim

    def load_params(self, *_a):  # marks it 'trainable' for the engine gate
        pass

    def encode(self, texts):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for w in t.lower().split():
                rng = np.random.default_rng(abs(hash(w)) % (2**32))
                out[i] += rng.standard_normal(self.dim).astype(np.float32)
        n = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(n, 1e-12)


def _bank(n=50, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((n, dim)).astype(np.float32)
    return b / np.linalg.norm(b, axis=1, keepdims=True)


class TestVariants:
    def test_deterministic_and_distinct(self):
        t = "Product: HL Road Frame. Color: Red. Size: 58"
        v1, v2 = confidence_variants(t), confidence_variants(t)
        assert v1 == v2
        assert len(set(v1)) == 3
        assert t not in v1

    def test_differs_from_eval_templates(self):
        """Query-time templates must not coincide with the calibration
        eval's paraphrase templates (honesty of the offline labels)."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "..", "tools"))
        from encoder_confidence import eval_paraphrase

        t = "Product: HL Road Frame. Color: Red. Size: 58"
        qt = set(confidence_variants(t))
        ev = {eval_paraphrase(t, m) for m in range(3)}
        assert qt.isdisjoint(ev)

    def test_single_segment_text(self):
        v = confidence_variants("mountain bike")
        assert len(v) == 3 and all(isinstance(s, str) and s for s in v)


class TestFeatures:
    def test_in_bank_text_scores_high_sim(self):
        emb = _StubEmbedder()
        bank_texts = [f"item number {i} widget" for i in range(40)]
        bank = emb.encode(bank_texts)
        f = confidence_features(emb, bank, [bank_texts[7]], top_k=5)
        assert f["max_sim"][0] > 0.99
        assert 0.0 <= f["ensemble_agreement"][0] <= 1.0

    def test_off_manifold_text_scores_lower_sim(self):
        emb = _StubEmbedder()
        bank = emb.encode([f"item number {i} widget" for i in range(40)])
        f_in = confidence_features(emb, bank, ["item number 3 widget"])
        f_out = confidence_features(
            emb, bank, ["quantum volcano jurisprudence"]
        )
        assert f_out["max_sim"][0] < f_in["max_sim"][0]

    def test_query_emb_shortcut_matches_full(self):
        emb = _StubEmbedder()
        bank = _bank()
        texts = ["alpha beta gamma", "delta epsilon"]
        full = confidence_features(emb, bank, texts)
        q = emb.encode(texts)
        short = confidence_features(emb, bank, texts, query_emb=q)
        np.testing.assert_allclose(full["max_sim"], short["max_sim"],
                                   atol=1e-6)
        np.testing.assert_allclose(
            full["ensemble_agreement"], short["ensemble_agreement"]
        )

    def test_scores_monotone_in_features(self):
        cal = {"bias": -6.0, "w_max_sim": 4.0, "w_agreement": 4.0}
        lo = confidence_scores(
            {"max_sim": np.array([0.2]), "ensemble_agreement": np.array([0.2])},
            cal,
        )
        hi = confidence_scores(
            {"max_sim": np.array([0.99]),
             "ensemble_agreement": np.array([1.0])},
            cal,
        )
        assert 0 < lo[0] < hi[0] < 1


class TestFitAndAuc:
    def test_logistic_separates_separable_data(self):
        rng = np.random.default_rng(0)
        x = np.concatenate([
            rng.normal(0.9, 0.05, size=(100, 2)),
            rng.normal(0.3, 0.05, size=(100, 2)),
        ])
        y = np.concatenate([np.ones(100), np.zeros(100)])
        w = fit_logistic(x, y)
        p = 1 / (1 + np.exp(-(w[0] + x @ w[1:])))
        assert ((p > 0.5) == y).mean() > 0.97

    def test_auc_known_values(self):
        assert auc_score(np.array([0.9, 0.8, 0.2, 0.1]),
                         np.array([1, 1, 0, 0])) == 1.0
        assert auc_score(np.array([0.1, 0.2, 0.8, 0.9]),
                         np.array([1, 1, 0, 0])) == 0.0
        # ties get half credit
        assert auc_score(np.array([0.5, 0.5]),
                         np.array([1, 0])) == pytest.approx(0.5)


class TestEngineSurface:
    def test_process_query_carries_confidence(self):
        from hcrag_tpu.core.dense_index import DenseIndex
        from hcrag_tpu.query.engine import QueryEngine

        emb = _StubEmbedder()
        texts = [f"product item {i} mountain widget" for i in range(32)]
        vecs = emb.encode(texts)
        index = DenseIndex.build(
            vecs, [{"id": f"r{i}", "type": "database_table"}
                   for i in range(32)], texts,
        )
        eng = QueryEngine(index, None, embedder=emb)
        out = eng.process_query("product item 3 mountain widget",
                                with_confidence=True)
        conf = out["encoder_confidence"]
        assert set(conf) == {"score", "max_sim", "ensemble_agreement"}
        assert 0.0 <= conf["score"] <= 1.0
        assert conf["max_sim"] > 0.9  # in-corpus query
        # auto mode: trainable embedder + small bank -> on by default
        out2 = eng.process_query("product item 3 mountain widget")
        assert "encoder_confidence" in out2
        # explicit off
        out3 = eng.process_query("product item 3", with_confidence=False)
        assert "encoder_confidence" not in out3
