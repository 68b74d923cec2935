"""Host-side LLM client with the reference's failure semantics.

Replaces `call_ollama_llm` (neo4j_rag_langgraph.py:96-155) and the scattered
OpenAI client constructions.  Transport is httpx against any OpenAI-compatible
chat-completions endpoint (the `openai` package is not available in this
environment).  Failure behavior is part of the framework contract
(SURVEY §5.3) and is preserved exactly:

  * plain call failure  -> the fixed apology string
    (neo4j_rag_langgraph.py:155)
  * structured call failure -> caller-specific fallback object (each call
    site supplies one, mirroring the reference's per-site fallbacks)
  * no endpooint configured -> immediate deterministic fallback (offline
    mode) without network wait

Structured output uses pydantic models via OpenAI's `response_format`
json-schema channel, with a tolerant "parse the first JSON object in the
text" fallback for endpoints without native structured output.
"""

from __future__ import annotations

import json
import re
from typing import Any, List, Optional, Type

from pydantic import BaseModel, Field

from hcrag_tpu.config import GLOBAL_CONFIG, RuntimeConfig

FALLBACK_ANSWER = (
    "I apologize, but I'm having trouble processing your request due to a "
    "technical issue. Please try again."
)


# --- structured response models (reference pydantic models) -----------------


class QueryIntentResponse(BaseModel):
    """neo4j_rag_langgraph.py:178-188"""

    intent: str = Field(description=(
        "Query intent: product_search, document_request, technical_support, "
        "comparison_request, or specification_inquiry"
    ))
    confidence: float = Field(description="Confidence level in detected intent (0-1)")
    reasoning: str = Field(description="Brief explanation of why this intent was chosen")


class EntityExtractionResponse(BaseModel):
    """neo4j_rag_langgraph.py:236-244"""

    entities: List[str] = Field(description="List of relevant entities extracted from the query")
    reasoning: str = Field(description="Brief explanation of why these entities were extracted")


class Decision(BaseModel):
    """neo4j_rag_langgraph.py:626-629"""

    decision: str = Field(description="'sufficient' or 'revision'")
    reasoning: str = Field(description="Brief explanation of the decision")


class RelevanceScore(BaseModel):
    """isRelevant.py:118-119"""

    score: float


class BatchRelevanceScore(BaseModel):
    """isRelevant.py:122-126"""

    scores: List[float] = Field(
        description="List of relevance scores for each node in the batch"
    )


_JSON_RE = re.compile(r"\{.*\}", re.DOTALL)


class LLMClient:
    """OpenAI-compatible chat-completions client with offline fallbacks."""

    def __init__(self, config: Optional[RuntimeConfig] = None):
        self.config = config or GLOBAL_CONFIG
        self.call_count = 0
        self.failure_count = 0

    @property
    def offline(self) -> bool:
        return not self.config.llm_base_url

    def _post(self, messages, response_format: Optional[Type[BaseModel]], timeout,
              max_tokens: Optional[int] = None, temperature: Optional[float] = None):
        import httpx

        payload: dict = {
            "model": self.config.llm_model,
            "messages": messages,
        }
        if max_tokens is not None:
            payload["max_tokens"] = max_tokens
        if temperature is not None:
            payload["temperature"] = temperature
        if response_format is not None:
            payload["response_format"] = {
                "type": "json_schema",
                "json_schema": {
                    "name": response_format.__name__,
                    "schema": response_format.model_json_schema(),
                },
            }
        resp = httpx.post(
            self.config.llm_base_url.rstrip("/") + "/chat/completions",
            json=payload,
            headers={"Authorization": f"Bearer {self.config.llm_api_key}"},
            timeout=timeout,
        )
        resp.raise_for_status()
        return resp.json()["choices"][0]["message"]["content"]

    def call(
        self,
        system_prompt: str,
        user_prompt: str,
        response_format: Optional[Type[BaseModel]] = None,
        timeout: Optional[float] = None,
        fallback: Any = None,
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> Any:
        """The `call_ollama_llm` contract: returns text, or a parsed
        `response_format` instance, or the fallback on any failure."""
        timeout = timeout if timeout is not None else self.config.llm_timeout_s
        self.call_count += 1
        if self.offline:
            self.failure_count += 1
            return self._fallback(response_format, fallback)
        try:
            content = self._post(
                [
                    {"role": "system", "content": system_prompt},
                    {"role": "user", "content": user_prompt},
                ],
                response_format,
                timeout,
                max_tokens=max_tokens,
                temperature=temperature,
            )
            if response_format is None:
                return content
            return self._parse(content, response_format)
        except Exception:
            self.failure_count += 1
            return self._fallback(response_format, fallback)

    def call_stream(
        self,
        system_prompt: str,
        user_prompt: str,
        on_token,
        *,
        timeout: Optional[float] = None,
        fallback: Any = None,
        max_tokens: Optional[int] = None,
        temperature: Optional[float] = None,
    ) -> str:
        """Incremental answer generation (neo4j_rag_langgraph_improved.py:
        160-210): the reference's async streaming LLM invokes a per-token
        callback as chunks arrive; this is the synchronous equivalent over
        the OpenAI streaming API (SSE `data:` lines, `delta.content`
        chunks).  `on_token(text_chunk)` fires for every chunk BEFORE this
        method returns the accumulated answer.

        Offline / failure fallback preserves the callback contract: the
        fallback answer is emitted through `on_token` in word chunks (the
        reference's non-streaming degradation path), so callers render
        progressively either way."""
        timeout = timeout if timeout is not None else self.config.llm_timeout_s
        self.call_count += 1

        def _emit_fallback() -> str:
            self.failure_count += 1
            answer = fallback() if callable(fallback) else fallback
            if not isinstance(answer, str) or not answer:
                answer = FALLBACK_ANSWER
            words = answer.split(" ")
            for i, w in enumerate(words):
                on_token(w if i == len(words) - 1 else w + " ")
            return answer

        if self.offline:
            return _emit_fallback()
        try:
            import httpx

            payload: dict = {
                "model": self.config.llm_model,
                "messages": [
                    {"role": "system", "content": system_prompt},
                    {"role": "user", "content": user_prompt},
                ],
                "stream": True,
            }
            if max_tokens is not None:
                payload["max_tokens"] = max_tokens
            if temperature is not None:
                payload["temperature"] = temperature
            parts: List[str] = []
            with httpx.stream(
                "POST",
                self.config.llm_base_url.rstrip("/") + "/chat/completions",
                json=payload,
                headers={"Authorization": f"Bearer {self.config.llm_api_key}"},
                timeout=timeout,
            ) as resp:
                resp.raise_for_status()
                for line in resp.iter_lines():
                    line = line.strip()
                    if not line.startswith("data:"):
                        continue
                    data = line[len("data:"):].strip()
                    if data == "[DONE]":
                        break
                    try:
                        delta = json.loads(data)["choices"][0].get("delta", {})
                    except Exception:
                        continue
                    chunk = delta.get("content")
                    if chunk:
                        parts.append(chunk)
                        on_token(chunk)
            if not parts:
                return _emit_fallback()
            return "".join(parts)
        except Exception:
            return _emit_fallback()

    @staticmethod
    def _parse(content: str, response_format: Type[BaseModel]) -> BaseModel:
        try:
            return response_format.model_validate_json(content)
        except Exception:
            m = _JSON_RE.search(content)
            if m:
                return response_format.model_validate(json.loads(m.group(0)))
            raise

    @staticmethod
    def _fallback(response_format, fallback):
        if fallback is not None:
            return fallback() if callable(fallback) else fallback
        if response_format is None:
            return FALLBACK_ANSWER
        if response_format is QueryIntentResponse:
            # The reference synthesizes this exact fallback
            # (neo4j_rag_langgraph.py:137-149).
            return QueryIntentResponse(
                intent="product_search",
                confidence=0.5,
                reasoning="Fallback due to LLM timeout",
            )
        return "Error: LLM timeout"
