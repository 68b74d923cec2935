"""Dense similarity + top-k ops (jax.numpy reference path).

This is the TPU-native replacement for the reference's brute-force retrieval
kernel (`/root/reference/experiments/main.py:831-857`):

    similarities = cosine_similarity([q], matrix)[0]
    top = np.argsort(similarities)[::-1][:top_k]
    keep scores >= threshold

Design notes (TPU-first):
  * The index matrix is L2-normalized once at build time, so cosine similarity
    is a single batched matmul that XLA tiles straight onto the MXU.
  * Queries are processed in batches [B, D]; the score matrix is [B, N].
  * Top-k uses a two-stage scheme (per-chunk top-k, then top-k over the
    surviving candidates) which avoids a full O(N log N) sort and keeps the
    intermediate in registers/VMEM-sized tiles.
  * Ties break toward the lower index (deterministic), which is the documented
    contract of `jax.lax.top_k`; the reference's `np.argsort` tie order is
    unspecified, so we pin this down as the framework's semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along `axis`; zero vectors map to zero (cosine 0)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def cosine_scores(
    query_emb: jnp.ndarray,
    index_emb: jnp.ndarray,
    *,
    index_normalized: bool = True,
) -> jnp.ndarray:
    """Cosine similarity of a query batch against the index.

    Args:
      query_emb: [B, D] (any norm; normalized internally).
      index_emb: [N, D]; pass ``index_normalized=False`` for raw embeddings.

    Returns:
      [B, N] float32 cosine similarities in [-1, 1].
    """
    q = l2_normalize(query_emb.astype(jnp.float32))
    e = index_emb if index_normalized else l2_normalize(index_emb.astype(jnp.float32))
    # bf16 inputs with f32 accumulation keep the MXU fed without recall loss.
    return jnp.dot(
        q.astype(index_emb.dtype), e.T, preferred_element_type=jnp.float32
    )


def normalized_cosine(raw_cosine: jnp.ndarray) -> jnp.ndarray:
    """Map cosine in [-1, 1] to [0, 1]: the reference's semantic-similarity
    normalization ``(sim + 1) / 2`` (isRelevant.py:208)."""
    return (raw_cosine + 1.0) * 0.5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fast_top_k(scores: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-aware exact top-k over the last axis.

    On TPU, `lax.approx_max_k` with recall_target=1.0 lowers to the hardware
    PartialReduce op — an exact top-k that avoids the full bitonic sort
    `lax.top_k` pays (the dominant cost of the retrieval step at large N).
    Elsewhere it falls back to `lax.top_k`.  Note: within-tile tie ORDER on
    the TPU path follows the hardware reduce; cross-chunk merges remain
    position-stable, and score parity is unaffected.
    """
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = "cpu"
    if backend in ("tpu", "axon") and k <= scores.shape[-1]:
        return jax.lax.approx_max_k(
            scores, k, recall_target=1.0, aggregate_to_topk=True
        )
    return jax.lax.top_k(scores, k)


def chunked_top_k(
    scores: jnp.ndarray, k: int, chunk: int = 16384
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k over the last axis.

    Stage 1 splits the N axis into chunks and takes a per-chunk top-k; stage 2
    re-top-ks the [num_chunks * k] survivors.  For N >> k this does ~N + C*k
    work instead of a full sort and vectorizes cleanly on the VPU.

    Args:
      scores: [B, N].
      k: number of results (static).
      chunk: chunk length (static); chosen so a [B, chunk] tile fits in VMEM.

    Returns:
      (values [B, k], indices [B, k]) sorted descending, ties -> lower index.
    """
    b, n = scores.shape
    k = min(k, n)
    if n <= max(chunk, 4 * k):
        return jax.lax.top_k(scores, k)

    n_pad = _round_up(n, chunk)
    if n_pad != n:
        scores = jnp.pad(
            scores, ((0, 0), (0, n_pad - n)), constant_values=-jnp.inf
        )
    c = n_pad // chunk
    tiled = scores.reshape(b, c, chunk)
    v1, i1 = fast_top_k(tiled, k)  # [B, C, k]
    base = (jnp.arange(c, dtype=jnp.int32) * chunk)[None, :, None]
    gi1 = i1.astype(jnp.int32) + base  # global indices
    v1 = v1.reshape(b, c * k)
    gi1 = gi1.reshape(b, c * k)
    v2, i2 = jax.lax.top_k(v1, k)  # [B, k] over survivors
    idx = jnp.take_along_axis(gi1, i2, axis=1)
    return v2, idx


@functools.partial(jax.jit, static_argnames=("top_k", "index_normalized"))
def dense_top_k(
    query_emb: jnp.ndarray,
    index_emb: jnp.ndarray,
    top_k: int,
    *,
    index_normalized: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cosine + top-k: the `find_similar_content` kernel (main.py:831-845).

    Returns (scores [B, k], indices [B, k]); thresholding is left to the
    caller so the compiled kernel stays shape-static.
    """
    scores = cosine_scores(query_emb, index_emb, index_normalized=index_normalized)
    return chunked_top_k(scores, top_k)


def threshold_mask(scores: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Boolean keep-mask replicating the reference's post-top-k filter
    ``similarities[idx] >= similarity_threshold`` (main.py:847-849)."""
    return scores >= threshold


def masked_top_k(
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k restricted to rows where `valid_mask` is True.

    Device-side equivalent of `search_by_category`'s metadata prefilter
    (main.py:859-905): invalid rows score -inf and can never enter the top-k.
    """
    neg = jnp.full_like(scores, -jnp.inf)
    return chunked_top_k(jnp.where(valid_mask[None, :], scores, neg), k)


def streaming_masked_top_k(
    query_emb: jnp.ndarray,
    index_emb: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
    chunk_rows: int = 1 << 17,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine + top-k streamed over row chunks — the large-N path.

    Materializing the full [B, N] score matrix costs 4*B*N bytes of HBM (4 GB
    at B=1024, N=1M) and inflates XLA's memory planning; instead the index is
    scanned in `chunk_rows` blocks with `lax.map`: each step is one MXU
    matmul [B, chunk] + a local top-k, keeping live memory at B*chunk and
    compile size constant in N.  Per-chunk candidates are merged by one final
    top-k.  Tie-breaking remains lowest-global-index (chunks scan ascending,
    the merge is position-stable).

    Args:
      query_emb: [B, D] normalized queries.
      index_emb: [N, D] normalized rows.
      valid_mask: [N] bool.
      k: static k.
      chunk_rows: rows per scanned block (padded up as needed).
    """
    b, d = query_emb.shape
    n = index_emb.shape[0]
    k = min(k, n)
    n_pad = _round_up(n, chunk_rows)
    if n_pad != n:
        index_emb = jnp.pad(index_emb, ((0, n_pad - n), (0, 0)))
        valid_mask = jnp.pad(valid_mask, (0, n_pad - n))
    c = n_pad // chunk_rows
    emb_chunks = index_emb.reshape(c, chunk_rows, d)
    mask_chunks = valid_mask.reshape(c, chunk_rows)
    bases = (jnp.arange(c, dtype=jnp.int32) * chunk_rows)[:, None]
    q = query_emb.astype(index_emb.dtype)

    def body(args):
        emb_c, mask_c, base = args
        scores = jnp.dot(
            q, emb_c.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = jnp.where(mask_c[None, :], scores, -jnp.inf)
        v, i = fast_top_k(scores, k)
        return v, i.astype(jnp.int32) + base

    vals, idxs = jax.lax.map(body, (emb_chunks, mask_chunks, bases))
    # [C, B, k] -> [B, C*k], chunk-major so ties resolve to lower chunk.
    vals = jnp.moveaxis(vals, 0, 1).reshape(b, c * k)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(b, c * k)
    out_v, pos = jax.lax.top_k(vals, k)
    out_i = jnp.take_along_axis(idxs, pos, axis=1)
    return out_v, out_i
