"""Learned re-ranker + distributed training step.

The reference's final ranking is a fixed linear blend of hand-tuned weights
(`combined = 0.7*relevance + 0.3*similarity`, enhanced_rag_system.py:148, on
top of the CompositeWeights blend).  This module makes that fusion learnable:
a small MLP over the per-candidate metric vector

    [semantic, llm, entity, type, raw_cosine]

produces a relevance logit; training distills brute-force cosine ranking (or
any teacher labels, e.g. click data) via listwise softmax cross-entropy.

The training step is the framework's multi-chip reference workload: query
batches shard over the `batch` mesh axis (data parallel), the index rows
shard over `rows` (the retrieval "tensor parallel" analogue), parameters are
replicated, and XLA inserts the gradient all-reduce over ICI from the
sharding annotations alone.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

NUM_FEATURES = 5  # sem, llm, ent, typ, raw cosine


class RerankerMLP(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, feats):
        # feats [..., NUM_FEATURES] -> logits [...]
        x = nn.Dense(self.hidden)(feats)
        x = nn.relu(x)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)[..., 0]


@dataclasses.dataclass
class RerankerTrainState:
    params: dict
    opt_state: optax.OptState


class Reranker:
    """Trainable candidate re-ranker over fused metric features."""

    def __init__(self, hidden: int = 64, learning_rate: float = 1e-3, seed: int = 0):
        self.model = RerankerMLP(hidden=hidden)
        self.tx = optax.adamw(learning_rate)
        params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, NUM_FEATURES))
        )
        self.state = RerankerTrainState(
            params=params, opt_state=self.tx.init(params)
        )
        self._score = jax.jit(self.model.apply)
        self._train_step = jax.jit(self._make_train_step())

    def _make_train_step(self):
        model, tx = self.model, self.tx

        def loss_fn(params, feats, labels, mask):
            # feats [B, K, F]; labels [B, K] teacher relevance; mask [B, K]
            logits = model.apply(params, feats)
            logits = jnp.where(mask, logits, -1e9)
            target = jnp.where(mask, labels, -1e9)
            # Listwise distillation: softmax CE against teacher distribution.
            log_p = jax.nn.log_softmax(logits, axis=-1)
            teacher = jax.nn.softmax(target, axis=-1)
            loss = -jnp.sum(teacher * log_p, axis=-1)
            return jnp.mean(loss)

        def train_step(params, opt_state, feats, labels, mask):
            loss, grads = jax.value_and_grad(loss_fn)(params, feats, labels, mask)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step

    # ------------------------------------------------------------------
    def save(self, path, step: int = 0) -> None:
        """Checkpoint params + optimizer state (resume-exact training)."""
        from hcrag_tpu.utils.train_checkpoint import save_train_state

        save_train_state(path, self.state.params, self.state.opt_state, step)

    def restore(self, path) -> int:
        """Restore a checkpoint written by `save`; returns the saved step."""
        from hcrag_tpu.utils.train_checkpoint import restore_train_state

        params, opt_state, step = restore_train_state(
            path, self.state.params, self.state.opt_state
        )
        self.state = RerankerTrainState(params=params, opt_state=opt_state)
        return step

    def score(self, feats: np.ndarray) -> np.ndarray:
        """feats [..., NUM_FEATURES] -> learned relevance scores."""
        return np.asarray(self._score(self.state.params, jnp.asarray(feats)))

    def train_step(
        self, feats: np.ndarray, labels: np.ndarray, mask: Optional[np.ndarray] = None
    ) -> float:
        if mask is None:
            mask = np.ones(labels.shape, dtype=bool)
        params, opt_state, loss = self._train_step(
            self.state.params,
            self.state.opt_state,
            jnp.asarray(feats),
            jnp.asarray(labels),
            jnp.asarray(mask),
        )
        self.state = RerankerTrainState(params=params, opt_state=opt_state)
        return float(loss)

    def fit_distill(
        self,
        feats: np.ndarray,
        labels: np.ndarray,
        *,
        epochs: int = 10,
        batch_size: int = 32,
        seed: int = 0,
    ) -> list:
        """Minibatch distillation loop; returns per-epoch losses."""
        rng = np.random.default_rng(seed)
        n = feats.shape[0]
        losses = []
        for _ in range(epochs):
            order = rng.permutation(n)
            epoch_loss = 0.0
            steps = 0
            for start in range(0, n, batch_size):
                sel = order[start : start + batch_size]
                epoch_loss += self.train_step(feats[sel], labels[sel])
                steps += 1
            losses.append(epoch_loss / max(steps, 1))
        return losses


def build_candidate_features(
    top_scores: np.ndarray,
    relevance_metrics: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
) -> np.ndarray:
    """Stack (sem, llm, ent, typ) metric arrays + raw cosine into the
    reranker feature tensor [..., NUM_FEATURES]."""
    sem, llm, ent, typ = relevance_metrics
    return np.stack([sem, llm, ent, typ, top_scores], axis=-1).astype(np.float32)


def _popcount_rows(bits: np.ndarray) -> np.ndarray:
    """Popcount over the last (uint32-words) axis of a host bitset array."""
    return np.unpackbits(
        bits.view(np.uint8).reshape(bits.shape[:-1] + (-1,)), axis=-1
    ).sum(axis=-1).astype(np.int32)


def engine_candidate_features(
    engine,
    res,
    intents=None,
    entity_lists=None,
) -> np.ndarray:
    """Host-side feature stack [B, k, NUM_FEATURES] for a QueryBatchResult's
    retrieved candidates: the SAME metric formulas the device step fuses
    (semantic (cos+1)/2, entity bitset match incl. the 0.5/0.1 empty-set
    rules, priority-matrix gather) — with the llm column ZERO, because the
    judge score is unknown at query time.  This is the inference-side input
    of the judge-aware distillation: the reranker was trained on the same
    zeroed column to predict judge-INCLUSIVE ordering from the cheap
    metrics."""
    from hcrag_tpu.core.types import PRIORITY_MATRIX

    idx = np.asarray(res.top_indices)
    cos = np.asarray(res.top_scores, dtype=np.float32)
    b, k = idx.shape
    safe = np.clip(idx, 0, len(engine.index.type_ids) - 1)

    sem = (cos + 1.0) * 0.5
    llm = np.zeros_like(sem)

    if intents is None:
        intent_ids = np.zeros(b, np.int32)
    else:
        intent_ids = np.array([i.index for i in intents], np.int32)
    typ = np.asarray(PRIORITY_MATRIX, np.float32)[
        intent_ids[:, None], engine.index.type_ids[safe]
    ]

    vocab = engine.index.vocab
    q_bits = np.zeros((b, vocab.num_words), np.uint32)
    q_oov = np.zeros(b, np.int32)
    if entity_lists is not None:
        for i, ents in enumerate(entity_lists):
            q_bits[i], q_oov[i] = vocab.encode(ents)
    row_bits = engine.index.entity_bits[safe]  # [B, k, W]
    row_counts = engine.index.entity_counts[safe]
    q_count = _popcount_rows(q_bits) + q_oov  # [B]
    inter = _popcount_rows(q_bits[:, None, :] & row_bits)  # [B, k]
    ratio = inter.astype(np.float32) / np.maximum(
        q_count[:, None].astype(np.float32), 1.0
    )
    ent = np.where(
        (q_count == 0)[:, None],
        np.where(row_counts == 0, 0.5, 0.1),
        ratio,
    ).astype(np.float32)

    return build_candidate_features(cos, (sem, llm, ent, typ))


def distill_judge_aware(
    engine,
    reranker: Reranker,
    query_texts,
    query_embs: np.ndarray,
    *,
    intents=None,
    entity_lists=None,
    judge_fn=None,
    weights=None,
    top_m: int = 20,
    epochs: int = 30,
    seed: int = 0,
    label_temp: float = 10.0,
) -> dict:
    """Train the reranker to produce judge-AWARE ordering without query-time
    LLM calls.

    Teacher: the reference's full combined score over each query's top-m
    candidates — `0.7 * composite(sem, JUDGE, ent, typ) + 0.3 * cosine`
    (enhanced_rag_system.py:148, isRelevant.py:479-482) with the judge
    column REAL (an LLM endpoint, or the reference's deterministic
    word-overlap heuristic, isRelevant.py:288-297).
    Student: the same candidates' features with the judge column ZERO —
    what's available at query time.  The MLP learns the judge's
    text-relevance signal from its correlation with the cheap metrics.

    Returns {"losses": per-epoch losses, "features", "labels"}.
    """
    from hcrag_tpu.core.types import CompositeWeights

    w = weights or CompositeWeights()
    if judge_fn is None:
        from hcrag_tpu.core.types import NodeInput, QueryInput
        from hcrag_tpu.pipeline.isrelevant import overlap_fallback_scores

        def judge_fn(q_text, cand_texts):
            q = QueryInput(
                text=q_text, embeddings=None, entities=[], intent=None
            )
            nodes = [
                NodeInput(
                    text=t, embeddings=None, graph_relations={},
                    node_type="unknown", entities=[],
                )
                for t in cand_texts
            ]
            return np.asarray(overlap_fallback_scores(q, nodes), np.float32)

    res = engine.query_batch(
        query_embs, top_k=top_m, intents=intents, entity_lists=entity_lists
    )
    feats = engine_candidate_features(
        engine, res, intents=intents, entity_lists=entity_lists
    )  # [B, m, F] — llm column zero (student input)

    judge = np.stack(
        [
            judge_fn(
                query_texts[i],
                [engine.index.texts[int(j)] for j in res.top_indices[i]],
            )
            for i in range(len(query_texts))
        ]
    ).astype(np.float32)  # [B, m] — teacher-only signal

    sem, _, ent, typ, cos = np.moveaxis(feats, -1, 0)
    teacher_rel = (
        w.semantic_similarity * sem
        + w.llm_judge * judge
        + w.entity_match * ent
        + w.node_type_priority * typ
    )
    labels = 0.7 * teacher_rel + 0.3 * cos  # the reference's combined blend

    # Teacher scores live in ~[0, 1]; a raw softmax over them is near
    # uniform (entropy ~ln m), drowning the ordering signal.  Temperature
    # scaling peaks the target distribution on the actual ranking.
    losses = reranker.fit_distill(
        feats, labels * label_temp, epochs=epochs, seed=seed
    )
    return {"losses": losses, "features": feats, "labels": labels}


def ndcg_at_k(pred_order: np.ndarray, true_scores: np.ndarray, k: int) -> float:
    """Mean NDCG@k of a predicted ordering against teacher scores.

    pred_order [B, M]: candidate positions sorted by the predicted score;
    true_scores [B, M]: the teacher's relevance per original position."""
    b, m = pred_order.shape
    k = min(k, m)
    discounts = 1.0 / np.log2(np.arange(2, k + 2))
    gains = np.take_along_axis(true_scores, pred_order[:, :k], axis=1)
    dcg = (gains * discounts).sum(axis=1)
    ideal = np.sort(true_scores, axis=1)[:, ::-1][:, :k]
    idcg = (ideal * discounts).sum(axis=1)
    return float(np.mean(dcg / np.maximum(idcg, 1e-9)))
