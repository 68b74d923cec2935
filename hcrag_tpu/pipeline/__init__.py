from hcrag_tpu.pipeline.agent import AgentResult, RetrievalAgent  # noqa: F401
from hcrag_tpu.pipeline.enhanced import EnhancedRAG, RAGResponse  # noqa: F401
from hcrag_tpu.pipeline.improved_agent import (  # noqa: F401
    ImprovedRetrievalAgent,
    InMemoryStore,
    MemorySaver,
)
from hcrag_tpu.pipeline.integration import GraphRelevanceScorer  # noqa: F401
from hcrag_tpu.pipeline.isrelevant import (  # noqa: F401
    batch_isRelevant,
    isRelevant,
)
from hcrag_tpu.pipeline.llm import LLMClient  # noqa: F401
from hcrag_tpu.pipeline.parser import QueryParser  # noqa: F401
