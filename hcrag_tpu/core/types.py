"""Core type system for the TPU-native HC-RAG engine.

Mirrors the behavioral surface of the reference's scoring configuration
(`/root/reference/experiments/isRelevant.py:12-169`) while encoding everything
as static, device-friendly tables:

* ``QueryIntent``        — 5 intents (isRelevant.py:12-17)
* ``ScorerType``         — 10 scoring strategies (isRelevant.py:105-115)
* ``CompositeWeights``   — validated weight config (isRelevant.py:37-102)
* ``NODE_TYPES``         — canonical node-type order used for the device-side
                           priority matrix (isRelevant.py:128-169)
* ``PRIORITY_MATRIX``    — the full 5x6 intent x node-type priority table,
                           value-for-value identical to the reference.

Unlike the reference (per-node Python dict lookups), everything here compiles
to gathers from constant arrays under ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Dict, List, Optional, Sequence

import numpy as np


class QueryIntent(enum.Enum):
    """User query intent classes (reference isRelevant.py:12-17)."""

    PRODUCT_SEARCH = "product_search"
    DOCUMENT_REQUEST = "document_request"
    TECHNICAL_SUPPORT = "technical_support"
    COMPARISON_REQUEST = "comparison_request"
    SPECIFICATION_INQUIRY = "specification_inquiry"

    @property
    def index(self) -> int:
        return INTENT_ORDER.index(self)

    @classmethod
    def from_string(cls, s: str) -> "QueryIntent":
        s = s.strip().lower()
        for intent in cls:
            if intent.value == s:
                return intent
        # Reference falls back to PRODUCT_SEARCH on unknown intent strings
        # (neo4j_rag_langgraph.py:227).
        return cls.PRODUCT_SEARCH


INTENT_ORDER: List[QueryIntent] = [
    QueryIntent.PRODUCT_SEARCH,
    QueryIntent.DOCUMENT_REQUEST,
    QueryIntent.TECHNICAL_SUPPORT,
    QueryIntent.COMPARISON_REQUEST,
    QueryIntent.SPECIFICATION_INQUIRY,
]

NUM_INTENTS = len(INTENT_ORDER)


class ScorerType(enum.Enum):
    """Relevance scoring strategy (reference isRelevant.py:105-115)."""

    COMPOSITE = "composite"
    PARALLEL = "parallel"
    ROUTER = "router"
    ROUTER_ALL = "router_all"
    ROUTER_TWO_SEM_LLM = "router_two_sem_llm"
    ROUTER_TWO_ENT_TYPE = "router_two_ent_type"
    ROUTER_SINGLE_SEM = "router_single_sem"
    ROUTER_SINGLE_LLM = "router_single_llm"
    ROUTER_SINGLE_ENT = "router_single_ent"
    ROUTER_SINGLE_TYPE = "router_single_type"


#: Canonical node-type ordering for all device-side tables.  The first five
#: entries mirror the keys of the reference priority matrix; ``unknown`` is the
#: catch-all bucket (isRelevant.py:339-341 maps unlisted types to "unknown").
NODE_TYPES: List[str] = [
    "product",
    "category",
    "specification",
    "document",
    "annotation",
    "unknown",
]

NUM_NODE_TYPES = len(NODE_TYPES)
UNKNOWN_TYPE_ID = NODE_TYPES.index("unknown")

_NODE_TYPE_TO_ID: Dict[str, int] = {t: i for i, t in enumerate(NODE_TYPES)}


def node_type_id(node_type: str) -> int:
    """Map a free-form node-type string onto the canonical table index.

    Unlisted types collapse to ``unknown`` exactly as the reference does for
    priority lookups (isRelevant.py:339-341).
    """
    return _NODE_TYPE_TO_ID.get(node_type.strip().lower(), UNKNOWN_TYPE_ID)


#: The intent x node-type priority matrix, row order = ``INTENT_ORDER``,
#: column order = ``NODE_TYPES``.  Values copied number-for-number from the
#: reference (isRelevant.py:128-169).
PRIORITY_MATRIX: np.ndarray = np.array(
    [
        #  product category spec  document annotation unknown
        [1.0, 0.8, 0.6, 0.3, 0.2, 0.1],  # PRODUCT_SEARCH
        [0.4, 0.2, 0.7, 1.0, 0.6, 0.1],  # DOCUMENT_REQUEST
        [0.6, 0.3, 0.9, 1.0, 0.7, 0.1],  # TECHNICAL_SUPPORT
        [1.0, 0.6, 0.8, 0.4, 0.3, 0.1],  # COMPARISON_REQUEST
        [0.7, 0.3, 1.0, 0.5, 0.6, 0.1],  # SPECIFICATION_INQUIRY
    ],
    dtype=np.float32,
)


@dataclasses.dataclass
class CompositeWeights:
    """Configurable weights for the COMPOSITE scorer.

    Defaults, validation rules (sum == 1 +-0.001, non-negative), presets and
    dict round-trip replicate the reference exactly (isRelevant.py:37-102).
    """

    semantic_similarity: float = 0.3
    llm_judge: float = 0.45
    entity_match: float = 0.15
    node_type_priority: float = 0.10

    def __post_init__(self) -> None:
        total = (
            self.semantic_similarity
            + self.llm_judge
            + self.entity_match
            + self.node_type_priority
        )
        if abs(total - 1.0) > 0.001:
            raise ValueError(f"Weights must sum to 1.0, got {total}")
        for field_name in (
            "semantic_similarity",
            "llm_judge",
            "entity_match",
            "node_type_priority",
        ):
            weight = getattr(self, field_name)
            if weight < 0:
                raise ValueError(
                    f"Weight {field_name} must be non-negative, got {weight}"
                )

    # --- presets (isRelevant.py:61-79) -------------------------------------
    @classmethod
    def create_balanced(cls) -> "CompositeWeights":
        return cls(0.25, 0.25, 0.25, 0.25)

    @classmethod
    def create_semantic_focused(cls) -> "CompositeWeights":
        return cls(0.6, 0.2, 0.1, 0.1)

    @classmethod
    def create_llm_focused(cls) -> "CompositeWeights":
        return cls(0.2, 0.6, 0.1, 0.1)

    @classmethod
    def create_entity_focused(cls) -> "CompositeWeights":
        return cls(0.2, 0.2, 0.4, 0.2)

    @classmethod
    def from_dict(cls, weights: Dict[str, float]) -> "CompositeWeights":
        return cls(
            semantic_similarity=weights.get("semantic_similarity", 0.3),
            llm_judge=weights.get("llm_judge", 0.45),
            entity_match=weights.get("entity_match", 0.15),
            node_type_priority=weights.get("node_type_priority", 0.10),
        )

    def to_dict(self) -> Dict[str, float]:
        return {
            "semantic_similarity": self.semantic_similarity,
            "llm_judge": self.llm_judge,
            "entity_match": self.entity_match,
            "node_type_priority": self.node_type_priority,
        }

    def as_array(self) -> np.ndarray:
        """Metric order: [semantic, llm, entity, type] — the METRIC_ORDER."""
        return np.array(
            [
                self.semantic_similarity,
                self.llm_judge,
                self.entity_match,
                self.node_type_priority,
            ],
            dtype=np.float32,
        )


DEFAULT_COMPOSITE_WEIGHTS = CompositeWeights()

#: Metric column order used in every fused-scoring array: semantic similarity,
#: llm judge, entity match, node-type priority.
METRIC_ORDER = ("semantic", "llm", "entity", "type")
NUM_METRICS = len(METRIC_ORDER)

# Reduction modes for the fused scorer kernel.
REDUCE_WEIGHTED_SUM = 0
REDUCE_MAX = 1


def scorer_spec(
    scorer_type: ScorerType,
    weights: Optional[CompositeWeights] = None,
) -> tuple[np.ndarray, int]:
    """Reduce every scorer strategy to a (weight-vector, reduction) pair.

    All ten reference strategies (isRelevant.py:449-501) are expressible as
    either a weighted sum over the 4-metric vector or an elementwise max:

    * COMPOSITE            -> weighted sum with user weights
    * PARALLEL             -> max over all four metrics
    * ROUTER               -> mean of (sem, llm, type)
    * ROUTER_ALL           -> mean of all four
    * ROUTER_TWO_SEM_LLM   -> mean of (sem, llm)
    * ROUTER_TWO_ENT_TYPE  -> mean of (ent, type)
    * ROUTER_SINGLE_*      -> indicator weight on one metric

    Returns (weights[4] float32, reduction_mode).
    """
    w = (weights or DEFAULT_COMPOSITE_WEIGHTS).as_array()
    if scorer_type == ScorerType.COMPOSITE:
        return w, REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.PARALLEL:
        return np.ones(4, np.float32), REDUCE_MAX
    if scorer_type == ScorerType.ROUTER:
        return np.array([1, 1, 0, 1], np.float32) / 3.0, REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_ALL:
        return np.full(4, 0.25, np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_TWO_SEM_LLM:
        return np.array([0.5, 0.5, 0, 0], np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_TWO_ENT_TYPE:
        return np.array([0, 0, 0.5, 0.5], np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_SINGLE_SEM:
        return np.array([1, 0, 0, 0], np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_SINGLE_LLM:
        return np.array([0, 1, 0, 0], np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_SINGLE_ENT:
        return np.array([0, 0, 1, 0], np.float32), REDUCE_WEIGHTED_SUM
    if scorer_type == ScorerType.ROUTER_SINGLE_TYPE:
        return np.array([0, 0, 0, 1], np.float32), REDUCE_WEIGHTED_SUM
    # Unknown scorer falls back to composite, as in the reference
    # (isRelevant.py:493-497).
    return w, REDUCE_WEIGHTED_SUM


def scorer_needs_llm(scorer_type: ScorerType) -> bool:
    """Whether a strategy consumes the (host-computed) LLM-judge column.

    Mirrors `_needs_llm_scores` (isRelevant.py:504-514).  When False, the
    reference substitutes 0.0 for the LLM column — we do the same.
    """
    return scorer_type in {
        ScorerType.COMPOSITE,
        ScorerType.PARALLEL,
        ScorerType.ROUTER,
        ScorerType.ROUTER_ALL,
        ScorerType.ROUTER_TWO_SEM_LLM,
        ScorerType.ROUTER_SINGLE_LLM,
    }


# --- Host-side convenience structs (pipeline layer) -------------------------


@dataclasses.dataclass
class QueryInput:
    """Structured query (reference isRelevant.py:20-26)."""

    text: str
    embeddings: np.ndarray
    entities: List[str]
    intent: QueryIntent


@dataclasses.dataclass
class NodeInput:
    """Structured node (reference isRelevant.py:28-35)."""

    text: str
    embeddings: np.ndarray
    graph_relations: Dict
    node_type: str
    entities: List[str]
    score: float = 0.0


#: Edge-type vocabulary of the AdventureWorks property graph, matching the
#: relationship types created by the reference graph builder
#: (knowledge_graph.py:347-421 and :235-245).
EDGE_TYPES: List[str] = [
    "SAME_CATEGORY",
    "SAME_MODEL",
    "SIMILAR_PRICE",
    "COMPATIBLE_PRODUCT",
    "COMPLEMENTARY_PRODUCT",
    "DESCRIBED_BY",
    "ANNOTATION",
]

NUM_EDGE_TYPES = len(EDGE_TYPES)
_EDGE_TYPE_TO_ID = {t: i for i, t in enumerate(EDGE_TYPES)}


def edge_type_id(name: str) -> int:
    return _EDGE_TYPE_TO_ID[name]


#: Relationship whitelist followed by subgraph expansion
#: (subgraph_expander.py:39-42).
EXPANSION_EDGE_TYPES = ("ANNOTATION", "DESCRIBED_BY")


def edge_type_mask(names: Sequence[str]) -> int:
    """Bitmask over EDGE_TYPES used by the device-side expansion kernel."""
    mask = 0
    for n in names:
        mask |= 1 << edge_type_id(n)
    return mask
