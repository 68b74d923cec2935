"""Runtime configuration for the HC-RAG TPU engine.

Consolidates the reference's two config surfaces:
  * `experiments/configurations.py` — LLM endpoint + graph-store constants.
  * module-level setters in `experiments/neo4j_rag_langgraph.py:49-92`
    (`set_scorer_type`, `set_composite_weights`, `set_random_seed`,
    `set_batch_size`, `reset_global_config`).

Unlike the reference's mutable module globals, state lives in a single
dataclass instance; the reference's setter API is preserved as thin functions
over a default instance so existing call patterns translate 1:1.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

from hcrag_tpu.core.types import CompositeWeights, ScorerType

# --- retrieval defaults (reference values, see SURVEY §6) -------------------
DEFAULT_TOP_K = 5  # main.py:790
DEFAULT_SIMILARITY_THRESHOLD = 0.3  # main.py:790
SEMANTIC_GATE = 0.60  # neo4j_rag_langgraph.py:460
HIGH_RELEVANCE = 0.7  # neo4j_rag_langgraph.py:641-646
FINAL_TOP_K = 15  # neo4j_rag_langgraph.py:601-603
SAMPLE_LIMIT = 20  # neo4j_rag_langgraph.py:420
EXPANSION_DEPTH = 1  # subgraph_expander.py:45
MAX_CONNECTED_NODES = 20  # subgraph_expander.py:46
EXPANSION_NEIGHBOR_LIMIT = 3  # neo4j_rag_langgraph.py:497 (LIMIT 3)
MAX_REVISIONS = 2  # neo4j_rag_langgraph.py:637
RECURSION_LIMIT = 15  # neo4j_rag_langgraph.py:871
COMBINED_RELEVANCE_WEIGHT = 0.7  # enhanced_rag_system.py:148
COMBINED_SIMILARITY_WEIGHT = 0.3  # enhanced_rag_system.py:148
MAX_CONTEXT_TOKENS = 2000  # enhanced_rag_system.py:50
CONTEXT_TOKEN_RESERVE = 500  # enhanced_rag_system.py:209
CHARS_PER_TOKEN = 4  # enhanced_rag_system.py:83-85
MAX_QUERY_ENTITIES = 10  # neo4j_rag_langgraph.py:290
EMBED_DIM = 384  # all-MiniLM-L6-v2 output dim

#: Calibrated probability below which a distilled-encoder query embedding is
#: treated as off-domain (models/confidence.py): the interface blends in
#: keyword retrieval and flags the result, the agent records the signal in
#: its result.  The reference's true checkpoint (embedding_generator.py:
#: 18-21) needs no such gate; the distilled stand-in does (its held-out
#: retrieval agreement is data-limited — tools/minilm_holdout_report.json).
ENCODER_CONFIDENCE_THRESHOLD = 0.5


@dataclasses.dataclass
class RuntimeConfig:
    """Mutable engine configuration (mirrors the reference's global knobs)."""

    scorer_type: ScorerType = ScorerType.COMPOSITE
    composite_weights: CompositeWeights = dataclasses.field(
        default_factory=CompositeWeights
    )
    random_seed: Optional[int] = None
    batch_size: int = 10  # LLM-judge chunk size (neo4j_rag_langgraph.py:59)

    # LLM endpoint (configurations.py:5-7); offline by default in this build.
    llm_base_url: str = os.environ.get("HCRAG_LLM_BASE_URL", "")
    llm_api_key: str = os.environ.get("HCRAG_LLM_API_KEY", "")
    llm_model: str = os.environ.get("HCRAG_LLM_MODEL", "")
    llm_timeout_s: float = 30.0  # call_ollama_llm default (…langgraph.py:97)

    def reset(self) -> None:
        fresh = RuntimeConfig()
        for f in dataclasses.fields(self):
            setattr(self, f.name, getattr(fresh, f.name))


#: Process-default configuration, used when callers do not pass their own.
GLOBAL_CONFIG = RuntimeConfig()


def set_scorer_type(scorer_type: ScorerType) -> None:
    GLOBAL_CONFIG.scorer_type = scorer_type


def set_composite_weights(weights: CompositeWeights) -> None:
    GLOBAL_CONFIG.composite_weights = weights


def set_random_seed(seed: int) -> None:
    GLOBAL_CONFIG.random_seed = seed


def set_batch_size(batch_size: int = 10) -> None:
    GLOBAL_CONFIG.batch_size = batch_size


def reset_global_config() -> None:
    GLOBAL_CONFIG.reset()
