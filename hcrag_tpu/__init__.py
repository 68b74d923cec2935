"""hcrag_tpu — a TPU-native hybrid knowledge-graph + RAG retrieval engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
SimoneBarandoni/HC-RAG: schema-adaptive embedding index construction, a
property graph over the indexed entities, fused dense retrieval
(cosine + top-k), k-hop graph expansion, configurable multi-metric relevance
scoring, and an agentic query pipeline — with the index and all query-side
compute living on TPU as sharded device arrays.
"""

__version__ = "0.1.0"

from hcrag_tpu.core.types import (  # noqa: F401
    DEFAULT_COMPOSITE_WEIGHTS,
    EDGE_TYPES,
    EXPANSION_EDGE_TYPES,
    NODE_TYPES,
    PRIORITY_MATRIX,
    CompositeWeights,
    NodeInput,
    QueryInput,
    QueryIntent,
    ScorerType,
)
