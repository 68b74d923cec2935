"""Calibrate the encoder's in-domain confidence signal (round-4 VERDICT #5).

The distilled encoder (tools/distill_minilm.py) reproduces the reference's
MiniLM space on corpus text but only interpolates off-domain; the framework
must not silently serve off-domain queries as if fidelity were uniform.
This tool calibrates `hcrag_tpu.models.confidence` against HONEST labels:

  1. loads the HOLDOUT-trained encoder (same recipe, 20% of the 585 pairs
     excluded — `distill_minilm.py --holdout-frac 0.2 --augment K` saves it
     to tools/minilm_distilled_holdout.npz), so no eval text was seen;
  2. builds an eval set of the held-out originals plus three unseen
     paraphrase templates each (the templates from the holdout report —
     DIFFERENT strings from confidence.py's query-time ensemble templates);
  3. labels each query by its actual top-10 retrieval agreement against the
     golden index (>= 0.5 agreement = the encoder serves this query
     faithfully);
  4. computes the query-time confidence features for every eval query,
     fits the shipped logistic, and reports ROC AUC on a disjoint split;
  5. writes tools/encoder_confidence_calibration.json (consumed by
     `confidence.load_calibration`) + a full report.

Also measures the BONUS from VERDICT #5: paraphrase-ensemble ENCODING
(query vector = normalized mean over the query + its ensemble variants) vs
single-vector encoding, on the same held-out agreement metric.

Run on the default (TPU) backend:  python tools/encoder_confidence.py
CPU (slower):  JAX_PLATFORMS=cpu python tools/encoder_confidence.py
"""

from __future__ import annotations

import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PICKLE = "/root/reference/experiments/knowledge_graph_embeddings.pkl"
BASE = os.path.join(REPO, "tools/minilm_distilled")
CALIB_PATH = os.path.join(REPO, "tools/encoder_confidence_calibration.json")
REPORT_PATH = os.path.join(REPO, "tools/encoder_confidence_report.json")


def load_holdout_embedder():
    from hcrag_tpu.models.minilm import (
        FlaxMiniLMEmbedder, MiniLMConfig, WordPieceTokenizer,
    )

    npz = BASE + "_holdout.npz"
    vocab = BASE + "_holdout_vocab.txt"
    meta_p = BASE + "_holdout_meta.json"
    for p in (npz, vocab, meta_p):
        if not os.path.exists(p):
            raise SystemExit(
                f"missing {p} — run tools/distill_minilm.py "
                "--holdout-frac 0.2 --augment 2 first"
            )
    meta = json.load(open(meta_p))
    cfg = MiniLMConfig(**meta["config"])
    tok = WordPieceTokenizer(vocab, max_len=meta["max_len"])
    emb = FlaxMiniLMEmbedder(cfg, tokenizer=tok, max_len=meta["max_len"])
    emb.load_params(npz)
    return emb, [int(i) for i in meta["holdout_idx"]]


def eval_paraphrase(t: str, mode: int) -> str:
    """The holdout report's templates (distill_minilm.py eval) — kept
    identical so labels here mean the same thing as that report."""
    segs = [s for s in t.split(". ") if s]
    if mode == 0:
        return ". ".join(reversed(segs))
    if mode == 1:
        return "tell me about " + t.lower()
    return "information on " + ". ".join(segs[1:] + segs[:1]).lower()


def main() -> None:
    from hcrag_tpu.models.confidence import (
        auc_score, confidence_features, confidence_scores, fit_logistic,
    )

    emb, holdout_idx = load_holdout_embedder()
    ref = pickle.load(open(PICKLE, "rb"))
    all_texts = list(ref["texts"])
    golden = np.asarray(ref["embeddings"], np.float32)
    golden_n = golden / np.maximum(
        np.linalg.norm(golden, axis=1, keepdims=True), 1e-12
    )
    hold_texts = [all_texts[i] for i in holdout_idx]
    gold_hold = golden_n[holdout_idx]

    def top10(v):
        v = np.asarray(v, np.float32)
        v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return np.argsort(-(v @ golden_n.T), axis=1, kind="stable")[:, :10]

    t_gold = top10(gold_hold)  # golden-vector ground-truth retrieval sets

    # ---- eval queries: originals + 3 unseen paraphrases each -------------
    queries, gold_of = list(hold_texts), list(range(len(hold_texts)))
    for mode in range(3):
        for i, t in enumerate(hold_texts):
            queries.append(eval_paraphrase(t, mode))
            gold_of.append(i)
    print(f"eval set: {len(queries)} queries "
          f"({len(hold_texts)} originals + {3 * len(hold_texts)} paraphrases)")

    q_emb = np.asarray(emb.encode(queries))
    t_model = top10(q_emb)
    agreement = np.array([
        len(set(t_model[j]) & set(t_gold[gold_of[j]])) / 10.0
        for j in range(len(queries))
    ])
    labels = (agreement >= 0.5).astype(np.float64)
    print(f"label balance: {labels.mean():.3f} positive "
          f"(agreement mean {agreement.mean():.3f})")

    # ---- query-time features (query_emb passed: no re-encode of originals)
    feats = confidence_features(emb, golden_n, queries, query_emb=q_emb)
    x = np.stack([feats["max_sim"], feats["ensemble_agreement"]], axis=1)

    # ---- honest AUC: fit on half, score the other half (split by SOURCE
    # text so a query and its paraphrases never straddle the split) --------
    rng = np.random.default_rng(7)
    src_perm = rng.permutation(len(hold_texts))
    half = set(src_perm[: len(hold_texts) // 2].tolist())
    tr = np.array([g in half for g in gold_of])
    te = ~tr
    w = fit_logistic(x[tr], labels[tr])
    cal = {"bias": float(w[0]), "w_max_sim": float(w[1]),
           "w_agreement": float(w[2])}
    s_te = confidence_scores(
        {"max_sim": x[te, 0], "ensemble_agreement": x[te, 1]}, cal
    )
    auc_te = auc_score(s_te, labels[te])
    auc_ms = auc_score(x[te, 0], labels[te])
    auc_ag = auc_score(x[te, 1], labels[te])
    print(f"held-out-split AUC: combined {auc_te:.4f} "
          f"(max_sim alone {auc_ms:.4f}, agreement alone {auc_ag:.4f})")

    # ---- shipped calibration: fit on ALL eval data -----------------------
    w_all = fit_logistic(x, labels)
    cal_all = {
        "bias": float(w_all[0]),
        "w_max_sim": float(w_all[1]),
        "w_agreement": float(w_all[2]),
        "auc": float(auc_te),
        "auc_split": "fit on half the source texts, scored on the rest",
        "n_eval_queries": int(len(queries)),
        "label": "top-10 retrieval agreement vs golden index >= 0.5",
        "encoder": "holdout-trained (never saw eval texts)",
    }
    json.dump(cal_all, open(CALIB_PATH, "w"), indent=1)
    print("wrote", CALIB_PATH)

    # ---- bonus: paraphrase-ensemble ENCODING lift ------------------------
    from hcrag_tpu.models.confidence import confidence_variants

    ens_texts = []
    for t in hold_texts:
        ens_texts.extend([t] + confidence_variants(t))
    k = 1 + len(confidence_variants(hold_texts[0]))
    e = np.asarray(emb.encode(ens_texts)).reshape(len(hold_texts), k, -1)
    e = e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    ens_vec = e.mean(axis=1)
    t_single = top10(e[:, 0])
    t_ens = top10(ens_vec)
    a_single = np.array([
        len(set(t_single[i]) & set(t_gold[i])) / 10.0
        for i in range(len(hold_texts))
    ])
    a_ens = np.array([
        len(set(t_ens[i]) & set(t_gold[i])) / 10.0
        for i in range(len(hold_texts))
    ])
    print(f"holdout top-10 agreement: single {a_single.mean():.4f} "
          f"-> ensemble {a_ens.mean():.4f}")

    report = {
        "n_holdout": len(hold_texts),
        "n_eval_queries": len(queries),
        "label_positive_frac": float(labels.mean()),
        "auc_combined_heldout_split": float(auc_te),
        "auc_max_sim_only": float(auc_ms),
        "auc_agreement_only": float(auc_ag),
        "calibration": cal_all,
        "ensemble_encoding": {
            "holdout_agreement_single": float(a_single.mean()),
            "holdout_agreement_ensemble": float(a_ens.mean()),
        },
        "note": (
            "labels + features from the HOLDOUT-trained encoder; "
            "confidence.py's query-time templates differ from the eval "
            "paraphrase templates by construction"
        ),
    }
    json.dump(report, open(REPORT_PATH, "w"), indent=1)
    print("wrote", REPORT_PATH)
    print(json.dumps({"auc": round(float(auc_te), 4),
                      "target": 0.8, "pass": bool(auc_te >= 0.8)}))


if __name__ == "__main__":
    main()
