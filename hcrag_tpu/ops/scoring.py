"""Batched relevance-scoring ops — the device-side `isRelevant` engine.

TPU-native rebuild of `/root/reference/experiments/isRelevant.py`.  The
reference computes four metrics per (query, node) pair in Python loops; here
every metric is a vectorized array op over a node batch, and all ten scoring
strategies collapse into one fused weighted-reduction (see
`hcrag_tpu.core.types.scorer_spec`).

Metric semantics preserved exactly:
  * semantic similarity  -> (cosine + 1) / 2                (isRelevant.py:197-210)
  * entity match         -> |q ∩ n| / |q| with empty-set
                            special cases 0.5 / 0.1          (isRelevant.py:300-324)
  * node-type priority   -> PRIORITY_MATRIX[intent, type]    (isRelevant.py:327-346)
  * llm judge            -> host-supplied score column; 0.0 when the strategy
                            doesn't need it                   (isRelevant.py:465-469)

Entity sets are encoded as multi-hot bitsets over a build-time vocabulary
(uint32 words); intersection/size become popcounts, i.e. pure VPU work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from hcrag_tpu.core.types import (
    NUM_METRICS,
    PRIORITY_MATRIX,
    REDUCE_MAX,
    REDUCE_WEIGHTED_SUM,
    CompositeWeights,
    ScorerType,
    scorer_needs_llm,
    scorer_spec,
)


def semantic_similarity_scores(
    query_emb: jnp.ndarray, node_emb: jnp.ndarray
) -> jnp.ndarray:
    """Normalized cosine similarity in [0, 1].

    Args:
      query_emb: [B, D] or [D].
      node_emb: [N, D] raw (unnormalized) node embeddings.

    Returns: [B, N] (or [N] for a single query).
    """
    single = query_emb.ndim == 1
    q = jnp.atleast_2d(query_emb).astype(jnp.float32)
    e = node_emb.astype(jnp.float32)
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    en = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
    cos = jnp.dot(qn, en.T, preferred_element_type=jnp.float32)
    out = (cos + 1.0) * 0.5
    return out[0] if single else out


def popcount_words(bits: jnp.ndarray) -> jnp.ndarray:
    """Total set-bit count along the trailing word axis ([..., W] uint32)."""
    return jnp.sum(jax.lax.population_count(bits), axis=-1).astype(jnp.int32)


def entity_match_scores(
    query_bits: jnp.ndarray,
    node_bits: jnp.ndarray,
    node_counts: Optional[jnp.ndarray] = None,
    query_oov: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Entity-match metric over bitset-encoded entity sets.

    Replicates `batch_entity_match` (isRelevant.py:300-324):
      |q| > 0            -> |q ∩ n| / |q|
      |q| == 0, |n| == 0 -> 0.5
      |q| == 0, |n| > 0  -> 0.1

    Query entities outside the build-time vocabulary cannot match any node
    entity but still count toward |q|; callers pass their number via
    `query_oov` (see `EntityVocab.encode`).

    Args:
      query_bits: [B, W] or [W] uint32 multi-hot bitset of query entities.
      node_bits:  [N, W] uint32 bitsets of node entities.
      node_counts: optional precomputed [N] popcounts of node_bits.
      query_oov: optional [B] (or scalar) count of out-of-vocab query entities.

    Returns: [B, N] (or [N]) float32 scores.
    """
    single = query_bits.ndim == 1
    qb = jnp.atleast_2d(query_bits)
    q_count = popcount_words(qb)  # [B] in-vocab entities
    if query_oov is not None:
        q_count = q_count + jnp.atleast_1d(
            jnp.asarray(query_oov, dtype=jnp.int32)
        )
    if node_counts is None:
        node_counts = popcount_words(node_bits)  # [N]
    inter = popcount_words(qb[:, None, :] & node_bits[None, :, :])  # [B, N]
    ratio = inter.astype(jnp.float32) / jnp.maximum(
        q_count[:, None].astype(jnp.float32), 1.0
    )
    empty_q = (q_count == 0)[:, None]  # [B, 1]
    empty_n = (node_counts == 0)[None, :]  # [1, N]
    out = jnp.where(empty_q, jnp.where(empty_n, 0.5, 0.1), ratio)
    return out[0] if single else out


@functools.partial(jax.jit, static_argnames=())
def node_type_priority_scores(
    intent_id: jnp.ndarray, type_ids: jnp.ndarray
) -> jnp.ndarray:
    """Gather from the 5x6 priority matrix (isRelevant.py:128-169, 327-346).

    Args:
      intent_id: scalar or [B] int32 intent indices (INTENT_ORDER).
      type_ids: [N] int32 node-type indices (NODE_TYPES; unknown == 5).

    Returns: [B, N] (or [N] for scalar intent) float32 priorities.
    """
    table = jnp.asarray(PRIORITY_MATRIX)
    single = jnp.ndim(intent_id) == 0
    ii = jnp.atleast_1d(jnp.asarray(intent_id, dtype=jnp.int32))
    out = table[ii[:, None], type_ids[None, :]]
    return out[0] if single else out


def graph_centrality_scores(
    degrees: jnp.ndarray, *, scale: float = 50.0
) -> jnp.ndarray:
    """Degree-centrality metric from the v1 scorer design
    (`relevance_scorer.py:241-269`, GraphCentralityMetric — dropped from the
    canonical isRelevant but kept here as an optional fifth metric):
    min(degree / 50, 1.0)."""
    return jnp.minimum(degrees.astype(jnp.float32) / scale, 1.0)


def combine_metrics(
    metrics: jnp.ndarray,
    weights: jnp.ndarray,
    reduction: int,
) -> jnp.ndarray:
    """Fuse the [..., 4] metric stack into final scores.

    reduction == REDUCE_WEIGHTED_SUM -> metrics @ weights
    reduction == REDUCE_MAX          -> max over the metric axis (PARALLEL,
                                        isRelevant.py:483-484)
    """
    if reduction == REDUCE_MAX:
        return jnp.max(metrics, axis=-1)
    return jnp.einsum(
        "...m,m->...", metrics, weights.astype(metrics.dtype)
    )


def combine_metrics_dynamic(
    metrics: jnp.ndarray,
    weight_tensor: jnp.ndarray,
    intent_ids: jnp.ndarray,
    type_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Fuse metrics with per-(intent, node-type) DYNAMIC weights.

    TPU-native port of the v0 scorer design's `get_weight` dispatch
    (relevance_scorer_design.py:104-111,151-168 and
    :546-580 `_score_single_node`): instead of per-node Python calls into
    each component's `get_weight`, the rules are materialized once as a
    weight tensor and gathered per node — one extra gather + normalize on
    top of the fused reduction.

    The v0 combiner is a weighted AVERAGE (total_weighted_score /
    total_weights, relevance_scorer_design.py:577-580), not the canonical
    weighted sum — normalization happens here.

    Args:
      metrics: [..., M] metric stack (e.g. [B, k, M]).
      weight_tensor: [M, I, T] weights per (component, intent, node type).
      intent_ids: int32, broadcastable against type_ids (e.g. [B] vs [B, k]
        after intent_ids[:, None], or a scalar).
      type_ids: int32 node-type ids, shape == metrics.shape[:-1].

    Returns: metrics.shape[:-1] float32 combined scores.
    """
    w_t = weight_tensor.astype(jnp.float32)
    ii = jnp.asarray(intent_ids, dtype=jnp.int32)
    tt = jnp.asarray(type_ids, dtype=jnp.int32)
    ii = jnp.broadcast_to(ii, tt.shape)
    w = w_t[:, ii, tt]  # [M, ...]
    w = jnp.moveaxis(w, 0, -1)  # [..., M]
    num = jnp.sum(w * metrics.astype(jnp.float32), axis=-1)
    den = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
    return num / den


def batch_relevance(
    *,
    query_emb: jnp.ndarray,
    query_bits: jnp.ndarray,
    intent_id,
    node_emb: jnp.ndarray,
    node_bits: jnp.ndarray,
    node_type_ids: jnp.ndarray,
    scorer_type: ScorerType,
    weights: Optional[CompositeWeights] = None,
    llm_scores: Optional[jnp.ndarray] = None,
    node_entity_counts: Optional[jnp.ndarray] = None,
    query_oov=None,
) -> jnp.ndarray:
    """Full `batch_isRelevant` (isRelevant.py:425-501) for one query.

    All cheap metrics are computed vectorized on device; the LLM-judge column
    is a host-supplied optional input (None -> zeros, matching the reference's
    substitution when a strategy doesn't request LLM scores, and matching its
    "judge stays on the host" process split).

    Args:
      query_emb: [D] query embedding.
      query_bits: [W] uint32 query entity bitset.
      intent_id: int intent index.
      node_emb: [N, D] node embeddings.
      node_bits: [N, W] node entity bitsets.
      node_type_ids: [N] int32.
      llm_scores: optional [N] float32 LLM-judge scores.

    Returns: [N] float32 relevance scores.
    """
    n = node_emb.shape[0]
    sem = semantic_similarity_scores(query_emb, node_emb)  # [N]
    ent = entity_match_scores(
        query_bits, node_bits, node_entity_counts, query_oov
    )  # [N]
    typ = node_type_priority_scores(
        jnp.asarray(intent_id, dtype=jnp.int32), node_type_ids
    )  # [N]
    if llm_scores is None or not scorer_needs_llm(scorer_type):
        llm = jnp.zeros((n,), jnp.float32)
    else:
        llm = llm_scores.astype(jnp.float32)
    metrics = jnp.stack([sem, llm, ent, typ], axis=-1)  # [N, 4]
    w, reduction = scorer_spec(scorer_type, weights)
    return combine_metrics(metrics, jnp.asarray(w), reduction)
