"""Keyword entity extraction and intent inference (host-side, no-LLM path).

Replicates the reference's deterministic fallback extractors:
  * `_extract_entities_from_content` — fixed product-keyword vocabulary with
    a first-meaningful-words fallback (graph_relevance_integration.py:87-110).
  * `_extract_entities_simple` — stop-worded leading words, ≤5
    (enhanced_rag_system.py:102-108).
  * `_infer_query_intent` — keyword routing over the five intents, two rule
    orderings existing in the reference (graph_relevance_integration.py:112-127
    and enhanced_rag_system.py:87-100).
"""

from __future__ import annotations

from typing import List

from hcrag_tpu.core.types import QueryIntent

#: Fixed product vocabulary (graph_relevance_integration.py:90-96).
KEYWORD_VOCAB: List[str] = [
    "mountain bike", "road bike", "bike", "bicycle",
    "frame", "handlebar", "wheel", "tire", "brake",
    "gear", "pedal", "chain", "saddle", "helmet",
    "red", "black", "blue", "white", "green",
    "small", "medium", "large", "xl", "xs",
]

MAX_ENTITIES = 5


def extract_entities_from_content(content: str) -> List[str]:
    """Keyword-vocabulary entity extraction (graph_relevance_integration.py:87-110).

    Substring scan over the fixed vocabulary in declaration order; if nothing
    matches, fall back to the first 3 words longer than 2 chars.
    """
    content_lower = content.lower()
    found = [kw for kw in KEYWORD_VOCAB if kw in content_lower]
    if not found:
        words = content.split()[:3]
        found = [w.lower().strip(".,!?") for w in words if len(w) > 2]
    return found[:MAX_ENTITIES]


_SIMPLE_STOPWORDS = {"find", "show", "what", "where", "when", "how"}


def extract_entities_simple(text: str) -> List[str]:
    """Leading-words extraction (enhanced_rag_system.py:102-108)."""
    words = [
        w.lower().strip(".,!?")
        for w in text.split()
        if len(w) > 3 and w.lower() not in _SIMPLE_STOPWORDS
    ]
    return words[:MAX_ENTITIES]


def infer_query_intent(query: str) -> QueryIntent:
    """Keyword intent routing, graph_relevance_integration.py:112-127 ordering
    (product-search verbs take precedence)."""
    q = query.lower()
    if any(w in q for w in ("find", "search", "show", "get", "buy")):
        return QueryIntent.PRODUCT_SEARCH
    if any(w in q for w in ("manual", "document", "guide", "instructions")):
        return QueryIntent.DOCUMENT_REQUEST
    if any(w in q for w in ("help", "support", "problem", "issue", "fix")):
        return QueryIntent.TECHNICAL_SUPPORT
    if any(w in q for w in ("compare", "vs", "versus", "difference")):
        return QueryIntent.COMPARISON_REQUEST
    if any(w in q for w in ("spec", "specification", "details", "features")):
        return QueryIntent.SPECIFICATION_INQUIRY
    return QueryIntent.PRODUCT_SEARCH


def infer_query_intent_docfirst(query: str) -> QueryIntent:
    """Alternate rule ordering (enhanced_rag_system.py:87-100): document /
    comparison / specification / support keywords take precedence over the
    product-search default."""
    q = query.lower()
    if any(w in q for w in ("manual", "documentation", "guide", "instruction")):
        return QueryIntent.DOCUMENT_REQUEST
    if any(w in q for w in ("compare", "vs", "versus", "difference")):
        return QueryIntent.COMPARISON_REQUEST
    if any(w in q for w in ("spec", "specification", "technical", "details")):
        return QueryIntent.SPECIFICATION_INQUIRY
    if any(w in q for w in ("help", "support", "troubleshoot", "fix", "problem")):
        return QueryIntent.TECHNICAL_SUPPORT
    return QueryIntent.PRODUCT_SEARCH


def metadata_node_type(metadata: dict) -> str:
    """Map an index row's metadata to a canonical node type.

    Mirrors `convert_rag_result_to_node_input`
    (graph_relevance_integration.py:50-64): database_table rows split by table
    name (Product -> product, ProductCategory -> category, else
    specification); pdf_document -> document; json_table -> specification;
    anything else -> unknown.
    """
    t = metadata.get("type")
    if t == "database_table":
        table = str(metadata.get("table_name", "unknown")).lower()
        if table == "product":
            return "product"
        if table in ("productcategory", "category"):
            return "category"
        return "specification"
    if t in ("pdf_document", "text_document"):
        return "document"
    if t == "json_table":
        return "specification"
    return "unknown"
