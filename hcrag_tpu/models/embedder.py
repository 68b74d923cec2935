"""Text embedders.

The reference embeds every text with SentenceTransformer all-MiniLM-L6-v2,
one call per row (embedding_generator.py:18-21, :124).  This build treats the
embedder as a pluggable component with a batched `encode(texts) -> [N, D]`
contract:

  * `HashingEmbedder` — the default: deterministic feature-hashed bag of
    words + bigrams, L2-normalized, zero external weights.  Embeddings are
    not MiniLM-compatible, but cosine geometry over shared tokens behaves
    sensibly and identically across runs/hosts, which is what the framework's
    tests and benchmarks need.  (This environment has no model weights; the
    reference's .pkl artifact supplies real MiniLM vectors for parity tests.)
  * `SentenceTransformerEmbedder` — thin gated adapter used when the weights
    are available locally; batched encode instead of per-row.
  * `FlaxMiniLMEmbedder` (models/minilm.py) — on-device MiniLM-architecture
    encoder for TPU-side embedding when a weight checkpoint is supplied.
"""

from __future__ import annotations

import re
from typing import List, Optional, Protocol, Sequence

import numpy as np

from hcrag_tpu.config import EMBED_DIM


class TextEmbedder(Protocol):
    dim: int

    def encode(self, texts: Sequence[str]) -> np.ndarray: ...


_TOKEN_RE = re.compile(r"[a-z0-9]+")

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_FNV_MASK = (1 << 64) - 1


def _stable_hash(token: str) -> int:
    """Stable 64-bit FNV-1a hash — process-seed independent and byte-for-byte
    reproducible by the native C++ tokenizer (`native/fasthash.cpp`)."""
    h = _FNV_OFFSET
    for byte in token.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _FNV_MASK
    return h


class HashingEmbedder:
    """Deterministic feature-hashing sentence embedder with optional IDF.

    Tokens and adjacent bigrams are hashed into `dim` buckets with a +-1 sign
    bit; vectors are L2-normalized.  Shared vocabulary => high cosine,
    disjoint => near zero, matching the ordinal behavior retrieval relies on.

    `fit(corpus)` learns per-bucket document frequencies; encoding then
    weights each feature by idf = log(1 + N/df), which keeps boilerplate
    tokens (column names, "Table:", guids) from swamping the discriminative
    ones — necessary for short queries to clear the reference's 0.60
    semantic gate against long row texts.
    """

    def __init__(self, dim: int = EMBED_DIM, use_bigrams: bool = True):
        self.dim = dim
        self.use_bigrams = use_bigrams
        self.bucket_df: np.ndarray | None = None  # [dim] document freq
        self.n_docs: int = 0

    def _features(self, text: str) -> List[str]:
        tokens = _TOKEN_RE.findall(text.lower())
        feats = list(tokens)
        if self.use_bigrams:
            feats.extend(f"{a}_{b}" for a, b in zip(tokens, tokens[1:]))
        return feats

    def fit(self, corpus: Sequence[str]) -> "HashingEmbedder":
        from hcrag_tpu import native

        df = native.bucket_df(corpus, self.dim, use_bigrams=self.use_bigrams)
        if df is None:  # pure-Python fallback
            df = np.zeros(self.dim, dtype=np.int64)
            for text in corpus:
                buckets = {
                    _stable_hash(f) % self.dim for f in self._features(text)
                }
                for b in buckets:
                    df[b] += 1
        self.bucket_df = df
        self.n_docs = len(corpus)
        return self

    def _idf(self, bucket: int) -> float:
        if self.bucket_df is None:
            return 1.0
        return float(
            np.log1p(self.n_docs / (1.0 + self.bucket_df[bucket]))
        )

    def encode_one(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float32)
        for feat in self._features(text):
            h = _stable_hash(feat)
            bucket = h % self.dim
            sign = 1.0 if (h >> 32) & 1 else -1.0
            vec[bucket] += sign * self._idf(bucket)
        norm = np.linalg.norm(vec)
        return vec / norm if norm > 0 else vec

    def _idf_weights(self) -> Optional[np.ndarray]:
        if self.bucket_df is None:
            return None
        return np.log1p(self.n_docs / (1.0 + self.bucket_df.astype(np.float64)))

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        from hcrag_tpu import native

        out = native.embed_batch(
            texts, self.dim, use_bigrams=self.use_bigrams,
            idf=self._idf_weights(),
        )
        if out is not None:
            return out
        return np.stack([self.encode_one(t) for t in texts], axis=0)

    # --- persistence (rides in DenseIndex.generation_info) ----------------
    def state_dict(self) -> dict:
        return {
            "type": "hashing",
            "dim": self.dim,
            "use_bigrams": self.use_bigrams,
            "n_docs": self.n_docs,
            "bucket_df": (
                self.bucket_df.tolist() if self.bucket_df is not None else None
            ),
        }

    @classmethod
    def from_state(cls, state: dict) -> "HashingEmbedder":
        emb = cls(dim=state["dim"], use_bigrams=state.get("use_bigrams", True))
        if state.get("bucket_df") is not None:
            emb.bucket_df = np.asarray(state["bucket_df"], dtype=np.int64)
            emb.n_docs = state.get("n_docs", 0)
        return emb


def embedder_from_index(index) -> "TextEmbedder":
    """Reconstruct the embedder an index was built with (falls back to an
    unfitted default when no state was persisted).

    An index whose rows are real MiniLM vectors (the reference artifact
    records ``model_name: all-MiniLM-L6-v2``,
    embedding_generator.py:428-435) gets the distilled-to-golden MiniLM
    encoder when its artifacts exist — novel query text then embeds into
    the SAME space as the index rows (>=0.999 corpus cosine vs the true
    model) instead of the mismatched hashing space."""
    state = index.generation_info.get("embedder_state")
    if state and state.get("type") == "hashing":
        return HashingEmbedder.from_state(state)
    if "minilm" in str(index.generation_info.get("model_name", "")).lower():
        from hcrag_tpu.models.minilm import load_distilled_embedder

        distilled = load_distilled_embedder()
        if distilled is not None and distilled.dim == index.dim:
            return distilled
    return default_embedder(index.dim)


class SentenceTransformerEmbedder:
    """Gated adapter over sentence-transformers (batched, unlike the
    reference's per-row encode)."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2"):
        from sentence_transformers import SentenceTransformer  # gated import

        self.model = SentenceTransformer(model_name)
        self.dim = self.model.get_sentence_embedding_dimension()

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        return np.asarray(self.model.encode(list(texts), batch_size=64))


def default_embedder(dim: int = EMBED_DIM) -> TextEmbedder:
    """Default embedder for the process.

    The deterministic hashing embedder unless ``HCRAG_EMBEDDER=st`` opts into
    sentence-transformers.  The torch import is deliberately NOT attempted by
    default: loading torch into a process that already initialized JAX's
    runtime can deadlock on OpenMP threads, and this environment has no model
    weights anyway.
    """
    import os

    if os.environ.get("HCRAG_EMBEDDER", "").lower() in ("st", "sentence-transformers"):
        try:
            os.environ.setdefault("HF_HUB_OFFLINE", "1")
            return SentenceTransformerEmbedder()
        except Exception:
            pass
    return HashingEmbedder(dim=dim)
