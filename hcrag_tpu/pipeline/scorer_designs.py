"""Extensible class-based scorer framework — the v1 design, kept current.

The reference's first scorer iteration (`experiments/relevance_scorer.py`)
used an ABC `RelevanceMetric` with five pluggable metric classes (including
`GraphCentralityMetric`, later dropped) and a 5-weight composite
(.3/.25/.2/.15/.1) plus intent/node-type router rules.  The canonical
`isRelevant` kept only four metrics; this module preserves the extensible
design for users who need custom metrics, implemented over the vectorized
ops so plugging in a metric doesn't reintroduce per-node Python loops.
"""

from __future__ import annotations

import abc
import enum
from typing import Dict, List, Optional, Sequence

import numpy as np

from hcrag_tpu.core.types import NodeInput, QueryInput, QueryIntent
from hcrag_tpu.pipeline.isrelevant import (
    batch_entity_match,
    batch_llm_judge,
    batch_node_type_priority,
    batch_semantic_similarity,
)


class RelevanceMetric(abc.ABC):
    """One scoring dimension over a (query, node batch)."""

    name: str = "metric"

    @abc.abstractmethod
    def score_batch(
        self, query: QueryInput, nodes: Sequence[NodeInput]
    ) -> List[float]:
        ...


class SemanticSimilarityMetric(RelevanceMetric):
    name = "semantic_similarity"

    def score_batch(self, query, nodes):
        return batch_semantic_similarity(query, list(nodes))


class LLMJudgeMetric(RelevanceMetric):
    name = "llm_judge"

    def __init__(self, client=None):
        self.client = client

    def score_batch(self, query, nodes):
        return batch_llm_judge(query, list(nodes), self.client)


class EntityMatchMetric(RelevanceMetric):
    name = "entity_match"

    def score_batch(self, query, nodes):
        return batch_entity_match(query, list(nodes))


class NodeTypePriorityMetric(RelevanceMetric):
    name = "node_type_priority"

    def score_batch(self, query, nodes):
        return batch_node_type_priority(query, list(nodes))


class GraphCentralityMetric(RelevanceMetric):
    """Degree centrality min(degree/50, 1), optionally blended with
    relationship weights (relevance_scorer.py:241-269)."""

    name = "graph_centrality"

    def __init__(self, scale: float = 50.0):
        self.scale = scale

    def score_batch(self, query, nodes):
        out = []
        for node in nodes:
            degree = node.graph_relations.get("degree")
            if degree is None:
                degree = len(node.graph_relations.get("neighbors", []))
            out.append(min(float(degree) / self.scale, 1.0))
        return out


#: v1 default weights (relevance_scorer.py:338-344).
V1_COMPOSITE_WEIGHTS: Dict[str, float] = {
    "semantic_similarity": 0.3,
    "llm_judge": 0.25,
    "entity_match": 0.2,
    "node_type_priority": 0.15,
    "graph_centrality": 0.1,
}


class CompositeScorer:
    """Weighted combination of arbitrary metrics."""

    def __init__(
        self,
        metrics: Optional[Sequence[RelevanceMetric]] = None,
        weights: Optional[Dict[str, float]] = None,
    ):
        self.metrics = list(metrics) if metrics is not None else [
            SemanticSimilarityMetric(),
            LLMJudgeMetric(),
            EntityMatchMetric(),
            NodeTypePriorityMetric(),
            GraphCentralityMetric(),
        ]
        self.weights = dict(weights or V1_COMPOSITE_WEIGHTS)
        total = sum(self.weights.get(m.name, 0.0) for m in self.metrics)
        if abs(total - 1.0) > 0.001:
            raise ValueError(f"Metric weights must sum to 1.0, got {total}")

    def score_batch(
        self, query: QueryInput, nodes: Sequence[NodeInput]
    ) -> List[float]:
        if not nodes:
            return []
        acc = np.zeros(len(nodes), dtype=np.float64)
        for metric in self.metrics:
            w = self.weights.get(metric.name, 0.0)
            if w == 0.0:
                continue
            acc += w * np.asarray(metric.score_batch(query, nodes))
        return [float(x) for x in acc]

    def explain(
        self, query: QueryInput, nodes: Sequence[NodeInput]
    ) -> List[Dict[str, float]]:
        """Per-node metric breakdown (the v0 design's reasoning traces,
        relevance_scorer_design.py)."""
        per_metric = {
            m.name: m.score_batch(query, list(nodes)) for m in self.metrics
        }
        out = []
        for i in range(len(nodes)):
            row = {name: scores[i] for name, scores in per_metric.items()}
            row["composite"] = sum(
                self.weights.get(name, 0.0) * row[name] for name in per_metric
            )
            out.append(row)
        return out
