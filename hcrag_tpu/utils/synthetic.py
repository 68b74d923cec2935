"""Synthetic index/graph generators for benchmarks and scale tests.

BASELINE.md configs 4-5: 1M-node (single chip) and 10M-node (v5e-8 sharded)
property graphs with 384-d embeddings.  Generation is seeded and chunked so
multi-GB corpora materialize quickly without blowing host RAM.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.core.vocab import EntityVocab


def synthetic_embeddings(
    n: int, dim: int = 384, seed: int = 0, dtype=np.float32
) -> np.ndarray:
    """L2-normalized random embeddings, generated in chunks."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, dim), dtype=dtype)
    chunk = 1 << 16
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        block = rng.standard_normal((stop - start, dim)).astype(np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True)
        out[start:stop] = block.astype(dtype)
    return out


def synthetic_ell(
    n: int, max_degree: int = 4, seed: int = 1
) -> np.ndarray:
    """Random padded neighbor table [n, max_degree] (self-loops removed)."""
    rng = np.random.default_rng(seed)
    nbrs = rng.integers(0, n, size=(n, max_degree), dtype=np.int64)
    rows = np.arange(n)[:, None]
    nbrs = np.where(nbrs == rows, (nbrs + 1) % n, nbrs)
    return nbrs.astype(np.int32)


def synthetic_bank(
    n: int,
    dim: int = 384,
    *,
    vocab_size: int = 128,
    entities_per_node: int = 3,
    seed: int = 0,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(emb, type_ids, entity_bits, entity_counts) for a synthetic corpus."""
    rng = np.random.default_rng(seed + 2)
    emb = synthetic_embeddings(n, dim, seed, dtype)
    type_ids = rng.integers(0, 6, size=n).astype(np.int32)
    words = (vocab_size + 31) // 32
    bits = np.zeros((n, words), dtype=np.uint32)
    ent_ids = rng.integers(0, vocab_size, size=(n, entities_per_node))
    for j in range(entities_per_node):
        np.bitwise_or.at(
            bits,
            (np.arange(n), ent_ids[:, j] // 32),
            (np.uint32(1) << (ent_ids[:, j] % 32).astype(np.uint32)),
        )
    counts = np.sum(
        np.unpackbits(bits.view(np.uint8), axis=1), axis=1
    ).astype(np.int32)
    return emb, type_ids, bits, counts


def synthetic_dense_index(
    n: int, dim: int = 384, *, seed: int = 0, dtype=np.float32
) -> DenseIndex:
    """A DenseIndex over synthetic data (metadata/texts are lightweight
    placeholders; device arrays carry the load)."""
    emb, type_ids, bits, counts = synthetic_bank(n, dim, seed=seed, dtype=dtype)
    from hcrag_tpu.core.types import NODE_TYPES

    metadata = [
        {"id": f"syn_{i}", "type": "database_table", "table_name": "Synthetic",
         "row_index": i}
        for i in range(n)
    ]
    texts = [f"synthetic row {i}" for i in range(n)]
    vocab = EntityVocab({f"e{i}": i for i in range(bits.shape[1] * 32)})
    return DenseIndex(
        emb=emb,
        type_ids=type_ids,
        entity_bits=bits,
        entity_counts=counts,
        graph_ids=np.arange(n, dtype=np.int32),
        metadata=metadata,
        texts=texts,
        vocab=vocab,
        generation_info={"synthetic": True, "n": n, "dim": dim},
    )
