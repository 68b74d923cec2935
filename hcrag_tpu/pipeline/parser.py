"""QueryParser — LLM structured entity extraction (query_parser.py rebuild).

Extracts {product, document, relationship} entities from natural-language
queries via structured LLM output, returning the reference's exact empty
structure on any failure (query_parser.py:124-131).  Offline mode returns the
empty structure immediately plus a `search_text` passthrough so downstream
retrieval still works.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from pydantic import BaseModel, Field

from hcrag_tpu.pipeline.llm import LLMClient


class ProductEntity(BaseModel):
    name: Optional[str] = None
    features: List[str] = Field(default_factory=list)
    category: Optional[str] = None


class DocumentEntity(BaseModel):
    type: Optional[str] = None
    name: Optional[str] = None


class RelationshipEntity(BaseModel):
    type: Optional[str] = None
    direction: Optional[str] = None


class QueryEntities(BaseModel):
    product: ProductEntity = Field(default_factory=ProductEntity)
    document: DocumentEntity = Field(default_factory=DocumentEntity)
    relationship: RelationshipEntity = Field(default_factory=RelationshipEntity)


_SYSTEM_PROMPT = """You are a query parser for a product knowledge graph system.
Your task is to extract relevant entities from user queries about products, documents, and relationships.

Extract the following entities:

1. Product: name (the main product name), features (color, size, material, ...), category
2. Document: type (manual, specification, guide, ...), name
3. Relationship: type (similar, compatible, related, ...), direction (incoming, outgoing, bidirectional)

Guidelines:
- If an entity is not present in the query, use null as the value
- Use English for all extracted values
- Be specific and accurate in entity extraction
- Consider synonyms and variations in product names
- Extract all relevant features mentioned in the query"""

EMPTY_RESULT: Dict[str, Any] = {
    "product": {"name": None, "features": [], "category": None},
    "document": {"type": None, "name": None},
    "relationship": {"type": None, "direction": None},
}


class QueryParser:
    def __init__(self, client: Optional[LLMClient] = None):
        self.client = client or LLMClient()

    def parse_query(self, query: str) -> Dict[str, Any]:
        """Structured parse; reference-identical empty dict on failure."""
        result = self.client.call(
            _SYSTEM_PROMPT, query, QueryEntities, fallback=False
        )
        if isinstance(result, QueryEntities):
            out = result.model_dump()
        else:
            out = {k: dict(v) for k, v in EMPTY_RESULT.items()}
        out["search_text"] = query
        return out

    def parse_queries_batch(self, queries: List[str]) -> List[Dict[str, Any]]:
        return [self.parse_query(q) for q in queries]
