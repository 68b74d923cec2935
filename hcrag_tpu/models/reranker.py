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
