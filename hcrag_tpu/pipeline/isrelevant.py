"""Host-facing `isRelevant` API — reference-compatible surface.

Drop-in equivalents of `isRelevant` / `batch_isRelevant`
(isRelevant.py:406-528) operating on `QueryInput` / `NodeInput` lists.  The
cheap metrics run through the vectorized device ops; the LLM-judge metric is
computed host-side in `batch_size` chunks, with the reference's exact
word-overlap fallback when the endpoint is absent or fails:

    score = min(overlap / max(|query words|, 1) * 0.8 + 0.1, 0.9)
    (isRelevant.py:288-297)
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from hcrag_tpu.core.types import (
    DEFAULT_COMPOSITE_WEIGHTS,
    CompositeWeights,
    NodeInput,
    QueryInput,
    ScorerType,
    node_type_id,
    scorer_needs_llm,
    scorer_spec,
)
from hcrag_tpu.core.vocab import EntityVocab
from hcrag_tpu.ops.scoring import (
    combine_metrics,
    entity_match_scores,
    node_type_priority_scores,
    semantic_similarity_scores,
)
from hcrag_tpu.pipeline.llm import BatchRelevanceScore, LLMClient

_judge_prompt_header = """You are an expert relevance evaluator for a knowledge graph system. Your task is to assess how relevant each piece of content is to a user's query."""


def overlap_fallback_scores(query: QueryInput, nodes: List[NodeInput]) -> List[float]:
    """The reference's LLM-judge failure heuristic (isRelevant.py:288-297)."""
    query_words = set(query.text.lower().split())
    out = []
    for node in nodes:
        node_words = set(node.text.lower().split())
        overlap = len(query_words & node_words)
        out.append(min(overlap / max(len(query_words), 1) * 0.8 + 0.1, 0.9))
    return out


def batch_llm_judge(
    query: QueryInput,
    nodes: List[NodeInput],
    client: Optional[LLMClient] = None,
) -> List[float]:
    """One structured LLM call scoring every node 0-1 (isRelevant.py:213-297),
    padding/truncating malformed score lists and falling back to word overlap."""
    if not nodes:
        return []
    client = client or LLMClient()
    if client.offline:
        return overlap_fallback_scores(query, nodes)

    nodes_text = "\n\n".join(
        f"Content {i}: {node.text}" for i, node in enumerate(nodes, 1)
    )
    prompt = f"""
            User Query: {query.text}

            Multiple Contents to Evaluate:
            {nodes_text}

            """
    system_prompt = f"""{_judge_prompt_header}

You will receive {len(nodes)} pieces of content to evaluate. For each content, provide a relevance score between 0.0 and 1.0.

Scoring Guidelines:
- 0.9-1.0: Perfect match - directly answers the query or provides exactly what's requested
- 0.8-0.9: Highly relevant - very useful for answering the query, contains key information
- 0.6-0.7: Moderately relevant - somewhat useful, related but not central to the query
- 0.4-0.5: Marginally relevant - tangentially related, might provide context
- 0.2-0.3: Low relevance - weakly related, unlikely to be useful
- 0.0-0.1: Not relevant - completely unrelated to the query

Consider these factors:
1. Direct topic alignment (does the content address the query topic?)
2. Specificity match (does it match specific criteria like price, color, features?)
3. Content type appropriateness (product info for product queries, docs for technical questions)
4. Completeness (does it provide comprehensive information?)

Return exactly {len(nodes)} scores as a list, one for each content in order."""

    result = client.call(
        system_prompt, prompt, BatchRelevanceScore, timeout=15, fallback=False
    )
    if not isinstance(result, BatchRelevanceScore):
        return overlap_fallback_scores(query, nodes)
    scores = list(result.scores)
    # Pad with 0.5 / truncate, as the reference does (isRelevant.py:280-284).
    while len(scores) < len(nodes):
        scores.append(0.5)
    return scores[: len(nodes)]


def _batch_process_with_llm(
    query: QueryInput,
    nodes: List[NodeInput],
    batch_size: int,
    client: Optional[LLMClient],
) -> List[float]:
    out: List[float] = []
    for i in range(0, len(nodes), batch_size):
        out.extend(batch_llm_judge(query, nodes[i : i + batch_size], client))
    return out


def batch_semantic_similarity(query: QueryInput, nodes: List[NodeInput]) -> List[float]:
    """Reference API (isRelevant.py:197-210) over the device op."""
    if not nodes:
        return []
    node_embs = np.stack([np.asarray(n.embeddings, np.float32) for n in nodes])
    out = semantic_similarity_scores(
        np.asarray(query.embeddings, np.float32), node_embs
    )
    return [float(x) for x in np.asarray(out)]


def batch_entity_match(query: QueryInput, nodes: List[NodeInput]) -> List[float]:
    """Reference API (isRelevant.py:300-324) over the bitset op."""
    if not nodes:
        return []
    vocab = EntityVocab.build([n.entities for n in nodes] + [query.entities])
    node_bits, _ = vocab.encode_batch([n.entities for n in nodes])
    q_bits, q_oov = vocab.encode(query.entities)
    out = entity_match_scores(
        jnp.asarray(q_bits), jnp.asarray(node_bits), query_oov=np.int32(q_oov)
    )
    return [float(x) for x in np.asarray(out)]


def batch_node_type_priority(query: QueryInput, nodes: List[NodeInput]) -> List[float]:
    """Reference API (isRelevant.py:327-346)."""
    if not nodes:
        return []
    type_ids = np.array([node_type_id(n.node_type) for n in nodes], np.int32)
    out = node_type_priority_scores(np.int32(query.intent.index), type_ids)
    return [float(x) for x in np.asarray(out)]


#: Node count from which the fused Pallas scoring kernel beats the XLA
#: metric stack (measured 2.7x at 8192 nodes, parity at 128 —
#: benchmarks/scoring_ablation.py / results.json:fused_scoring_ablation).
PALLAS_SCORING_MIN_NODES = 2048


def _fused_device_scores(
    query: QueryInput,
    nodes: List[NodeInput],
    scorer_type: ScorerType,
    weights: CompositeWeights,
    llm: Optional[List[float]] = None,
    interpret: bool = False,
) -> List[float]:
    """Large-bank fast path: ONE fused Pallas kernel computes the whole
    metric stack (sem/ent/type + reduction) in VMEM
    (`ops/scoring_pallas.pallas_batch_relevance`).  The judge column stays
    a host concern (endpoint calls / word-overlap fallback) and rides in as
    `llm` when the strategy weights it."""
    from hcrag_tpu.ops.scoring_pallas import pallas_batch_relevance

    vocab = EntityVocab.build([n.entities for n in nodes] + [query.entities])
    node_bits, node_counts = vocab.encode_batch([n.entities for n in nodes])
    q_bits, q_oov = vocab.encode(query.entities)
    # The kernel scores raw dots; the reference metric is cosine
    # (isRelevant.py:197-210), so normalize both sides here exactly as
    # `semantic_similarity_scores` does internally.
    q_emb = np.asarray(query.embeddings, np.float32).reshape(1, -1)
    q_emb = q_emb / max(float(np.linalg.norm(q_emb)), 1e-12)
    node_embs = np.stack(
        [np.asarray(n.embeddings, np.float32) for n in nodes]
    )
    node_embs = node_embs / np.maximum(
        np.linalg.norm(node_embs, axis=1, keepdims=True), 1e-12
    )
    type_ids = np.array([node_type_id(n.node_type) for n in nodes], np.int32)
    q_count = np.asarray(
        [int(np.unpackbits(q_bits.view(np.uint8)).sum()) + int(q_oov)],
        np.int32,
    )
    w, reduction = scorer_spec(scorer_type, weights)
    # Mosaic wants >=8 sublanes on the query-side blocks: replicate the
    # single query to 8 rows and keep row 0.
    b_pad = 8
    llm_rows = None
    if llm is not None:
        llm_rows = jnp.asarray(np.tile(
            np.asarray(llm, np.float32).reshape(1, -1), (b_pad, 1)
        ))
    out = pallas_batch_relevance(
        jnp.asarray(np.repeat(q_emb, b_pad, axis=0)),
        jnp.asarray(np.repeat(q_bits.reshape(1, -1), b_pad, axis=0)),
        jnp.asarray(np.repeat(q_count, b_pad)),
        jnp.full((b_pad,), query.intent.index, jnp.int32),
        jnp.asarray(node_embs),
        jnp.asarray(node_bits),
        jnp.asarray(node_counts.astype(np.int32)),
        jnp.asarray(type_ids),
        jnp.asarray(np.asarray(w, np.float32)),
        llm_rows,
        reduction=reduction,
        interpret=interpret,
    )
    return [float(x) for x in np.asarray(out)[0]]


def batch_isRelevant(
    query: QueryInput,
    nodes: List[NodeInput],
    scorer_type: ScorerType,
    batch_size: int = 10,
    weights: CompositeWeights = DEFAULT_COMPOSITE_WEIGHTS,
    client: Optional[LLMClient] = None,
) -> List[float]:
    """Reference-parity batch scorer (isRelevant.py:425-501)."""
    if not nodes:
        return []

    # Single-metric fast paths (isRelevant.py:449-457).
    if scorer_type == ScorerType.ROUTER_SINGLE_SEM:
        return batch_semantic_similarity(query, nodes)
    if scorer_type == ScorerType.ROUTER_SINGLE_ENT:
        return batch_entity_match(query, nodes)
    if scorer_type == ScorerType.ROUTER_SINGLE_TYPE:
        return batch_node_type_priority(query, nodes)
    if scorer_type == ScorerType.ROUTER_SINGLE_LLM:
        return _batch_process_with_llm(query, nodes, batch_size, client)

    # Large banks: the fused Pallas kernel for sem/ent/type + reduction
    # (2.7x over the XLA stack at 8k nodes); the LLM-judge column is still
    # produced host-side exactly as below and rides in as an input.
    if len(nodes) >= PALLAS_SCORING_MIN_NODES:
        import jax

        if jax.default_backend() == "tpu":
            llm_col = (
                _batch_process_with_llm(query, nodes, batch_size, client)
                if scorer_needs_llm(scorer_type)
                else None
            )
            return _fused_device_scores(
                query, nodes, scorer_type, weights, llm=llm_col
            )

    sem = batch_semantic_similarity(query, nodes)
    ent = batch_entity_match(query, nodes)
    typ = batch_node_type_priority(query, nodes)
    llm = (
        _batch_process_with_llm(query, nodes, batch_size, client)
        if scorer_needs_llm(scorer_type)
        else [0.0] * len(nodes)
    )

    metrics = jnp.asarray(
        np.stack([sem, llm, ent, typ], axis=-1), dtype=jnp.float32
    )
    w, reduction = scorer_spec(scorer_type, weights)
    out = combine_metrics(metrics, jnp.asarray(w), reduction)
    return [float(x) for x in np.asarray(out)]


def isRelevant(
    query: QueryInput,
    node: NodeInput,
    scorer_type: ScorerType,
    weights: CompositeWeights = DEFAULT_COMPOSITE_WEIGHTS,
    client: Optional[LLMClient] = None,
) -> float:
    """Single-node scorer delegating to batch (isRelevant.py:406-422)."""
    return batch_isRelevant(
        query, [node], scorer_type, batch_size=1, weights=weights, client=client
    )[0]
