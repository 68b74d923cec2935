"""DenseIndex — the on-device embedding index.

TPU-native replacement for the reference's pickled embedding store
(`embedding_generator.py:422-447`, consumed by `main.py:757-764`).  Where the
reference keeps parallel Python lists ``{embeddings, metadata, texts}``, this
index is a struct-of-arrays designed for device residency:

  * ``emb``           [N, D]  — L2-normalized embeddings (f32 or bf16), so
                                cosine similarity is a plain matmul on the MXU
  * ``type_ids``      [N]     — canonical node-type id (NODE_TYPES) derived
                                from metadata for device-side priority lookups
  * ``entity_bits``   [N, W]  — multi-hot entity bitsets (uint32 words)
  * ``entity_counts`` [N]     — popcounts of entity_bits
  * ``graph_ids``     [N]     — linked property-graph node (-1 = none); the
                                device analogue of the reference's
                                ``embedding_index``/``embedding_id``
                                cross-links (knowledge_graph.py:264-327)

Host-side (off the hot path): ``metadata`` dicts, ``texts``, the entity
vocabulary, and generation info.  A compat reader ingests the reference's
``knowledge_graph_embeddings.pkl`` for bit-parity testing.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from hcrag_tpu.core.types import node_type_id
from hcrag_tpu.core.vocab import EntityVocab
from hcrag_tpu.ingest.entities import (
    extract_entities_from_content,
    metadata_node_type,
)


def _normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


@dataclasses.dataclass
class DenseIndex:
    """Struct-of-arrays dense retrieval index."""

    emb: np.ndarray  # [N, D] float32/bfloat16, L2-normalized
    type_ids: np.ndarray  # [N] int32
    entity_bits: np.ndarray  # [N, W] uint32
    entity_counts: np.ndarray  # [N] int32
    graph_ids: np.ndarray  # [N] int32, -1 if unlinked
    metadata: List[dict]
    texts: List[str]
    vocab: EntityVocab
    generation_info: Dict = dataclasses.field(default_factory=dict)

    # --- shape helpers ------------------------------------------------------
    @property
    def n(self) -> int:
        return int(self.emb.shape[0])

    @property
    def dim(self) -> int:
        return int(self.emb.shape[1])

    def row_of_metadata(self, metadata: dict) -> int:
        """O(1) row lookup by metadata identity/id (lazily built map);
        returns -1 when unknown."""
        cache = getattr(self, "_row_by_meta_id", None)
        if cache is None:
            cache = {}
            for i, m in enumerate(self.metadata):
                key = m.get("id")
                if key is not None and key not in cache:
                    cache[key] = i
            self._row_by_meta_id = cache
        return cache.get(metadata.get("id"), -1)

    def type_mask(self, content_type: str) -> np.ndarray:
        """Row mask for a metadata content type ('database_table',
        'json_table', 'pdf_document') — the `search_by_category` prefilter
        (main.py:871-879)."""
        return np.array(
            [m.get("type") == content_type for m in self.metadata], dtype=bool
        )

    # --- constructors -------------------------------------------------------
    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        metadata: Sequence[dict],
        texts: Sequence[str],
        *,
        graph_ids: Optional[np.ndarray] = None,
        entity_extractor: Callable[[str], List[str]] = extract_entities_from_content,
        vocab: Optional[EntityVocab] = None,
        dtype=np.float32,
        generation_info: Optional[Dict] = None,
    ) -> "DenseIndex":
        """Assemble an index from raw embeddings + per-row metadata/texts.

        Node types come from metadata (graph_relevance_integration.py:50-64),
        entities from the content via `entity_extractor`
        (graph_relevance_integration.py:87-110); the entity vocabulary is the
        union over all rows unless one is supplied.
        """
        emb = np.asarray(embeddings, dtype=np.float32)
        assert emb.ndim == 2, "embeddings must be [N, D]"
        n = emb.shape[0]
        assert len(metadata) == n and len(texts) == n

        entity_lists = [entity_extractor(t) for t in texts]
        if vocab is None:
            vocab = EntityVocab.build(entity_lists)
        bits, _ = vocab.encode_batch(entity_lists)
        counts = np.sum(
            np.unpackbits(bits.view(np.uint8), axis=1), axis=1
        ).astype(np.int32)

        type_ids = np.array(
            [node_type_id(metadata_node_type(m)) for m in metadata], dtype=np.int32
        )
        if graph_ids is None:
            graph_ids = np.full(n, -1, dtype=np.int32)

        return cls(
            emb=_normalize_rows(emb).astype(dtype),
            type_ids=type_ids,
            entity_bits=bits,
            entity_counts=counts,
            graph_ids=np.asarray(graph_ids, dtype=np.int32),
            metadata=list(metadata),
            texts=list(texts),
            vocab=vocab,
            generation_info=dict(generation_info or {}),
        )

    @classmethod
    def from_reference_pickle(
        cls, path, *, dtype=np.float32, graph_ids: Optional[np.ndarray] = None
    ) -> "DenseIndex":
        """Compat reader for the reference's pickle artifact
        (`knowledge_graph_embeddings.pkl`, written by
        embedding_generator.py:422-437)."""
        with open(path, "rb") as f:
            data = pickle.load(f)
        return cls.build(
            np.asarray(data["embeddings"], dtype=np.float32),
            data["metadata"],
            data["texts"],
            dtype=dtype,
            graph_ids=graph_ids,
            generation_info=data.get("generation_info", {}),
        )

    # --- persistence (replaces the pickle; artifact-level checkpointing,
    # SURVEY §5.4) ----------------------------------------------------------
    def save(self, directory) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            directory / "dense_index.npz",
            emb=np.asarray(self.emb, dtype=np.float32),
            type_ids=self.type_ids,
            entity_bits=self.entity_bits,
            entity_counts=self.entity_counts,
            graph_ids=self.graph_ids,
        )
        with open(directory / "index_meta.json", "w") as f:
            json.dump(
                {
                    "metadata": self.metadata,
                    "texts": self.texts,
                    "vocab": self.vocab.to_dict(),
                    "generation_info": self.generation_info,
                    "dtype": str(np.dtype(np.asarray(self.emb).dtype)),
                },
                f,
            )

    @classmethod
    def load(cls, directory, dtype=np.float32) -> "DenseIndex":
        directory = Path(directory)
        arrays = np.load(directory / "dense_index.npz")
        with open(directory / "index_meta.json") as f:
            meta = json.load(f)
        return cls(
            emb=arrays["emb"].astype(dtype),
            type_ids=arrays["type_ids"],
            entity_bits=arrays["entity_bits"],
            entity_counts=arrays["entity_counts"],
            graph_ids=arrays["graph_ids"],
            metadata=meta["metadata"],
            texts=meta["texts"],
            vocab=EntityVocab.from_dict(meta["vocab"]),
            generation_info=meta.get("generation_info", {}),
        )

    # --- incremental updates (beyond the reference, which rebuilds) --------
    def append(
        self,
        embeddings: np.ndarray,
        metadata: Sequence[dict],
        texts: Sequence[str],
        *,
        graph_ids: Optional[np.ndarray] = None,
        entity_extractor: Callable[[str], List[str]] = extract_entities_from_content,
    ) -> "DenseIndex":
        """Append rows in place (host arrays).  New entities must already be
        in the vocabulary (out-of-vocab entities simply never match, like OOV
        query entities).  Call `QueryEngine.refresh_index()` afterwards to
        re-upload the device bank."""
        emb = np.asarray(embeddings, dtype=np.float32)
        n_new = emb.shape[0]
        assert len(metadata) == n_new and len(texts) == n_new
        entity_lists = [entity_extractor(t) for t in texts]
        bits, _ = self.vocab.encode_batch(entity_lists)
        counts = np.sum(
            np.unpackbits(bits.view(np.uint8), axis=1), axis=1
        ).astype(np.int32)
        type_ids = np.array(
            [node_type_id(metadata_node_type(m)) for m in metadata],
            dtype=np.int32,
        )
        if graph_ids is None:
            graph_ids = np.full(n_new, -1, dtype=np.int32)

        own_dtype = np.asarray(self.emb).dtype
        self.emb = np.concatenate(
            [np.asarray(self.emb), _normalize_rows(emb).astype(own_dtype)]
        )
        self.type_ids = np.concatenate([self.type_ids, type_ids])
        self.entity_bits = np.concatenate([self.entity_bits, bits])
        self.entity_counts = np.concatenate([self.entity_counts, counts])
        self.graph_ids = np.concatenate(
            [self.graph_ids, np.asarray(graph_ids, dtype=np.int32)]
        )
        self.metadata.extend(metadata)
        self.texts.extend(texts)
        if hasattr(self, "_row_by_meta_id"):
            del self._row_by_meta_id  # invalidate the lazy lookup map
        return self

    def delete_rows(self, rows: Sequence[int]) -> np.ndarray:
        """Tombstone rows: returns a validity mask excluding them.  Rows stay
        in the arrays (static device shapes); pass the mask to queries or AND
        it into the engine's type masks.  Compact by rebuilding when the
        tombstone fraction grows."""
        mask = np.ones(self.n, dtype=bool)
        mask[np.asarray(list(rows), dtype=np.int64)] = False
        return mask

    def mask_where(self, predicate: Callable[[dict], bool]) -> np.ndarray:
        """Arbitrary metadata-predicate row mask (generalizes the
        `search_by_category` content-type prefilter, main.py:871-879)."""
        return np.array([bool(predicate(m)) for m in self.metadata], dtype=bool)

    # --- statistics (main.py:907-926 / embedding_generator.py:449-465) -----
    def content_statistics(self) -> Dict:
        stats: Dict = {
            "total_entries": self.n,
            "embedding_dimensions": self.dim,
            "content_types": {},
            "database_tables": {},
        }
        for meta in self.metadata:
            t = meta.get("type", "unknown")
            stats["content_types"][t] = stats["content_types"].get(t, 0) + 1
            if t == "database_table":
                tab = meta.get("table_name", "unknown")
                stats["database_tables"][tab] = (
                    stats["database_tables"].get(tab, 0) + 1
                )
        return stats
