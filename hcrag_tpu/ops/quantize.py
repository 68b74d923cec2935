"""Int8 index quantization.

Memory/bandwidth ladder for the embedding matrix (SURVEY §7.4: "bf16 or f8
with f32 accumulation" at 10M rows):

    f32   1.54 GB/M rows      bf16  0.77 GB/M      int8  0.38 GB/M

With symmetric per-row scales the int8 matmul runs on the MXU with int32
accumulation, and scores recover as

    score[b, n] = int_dot[b, n] * q_scale[b] * e_scale[n]

— one elementwise rescale before top-k.  At D=384 the quantization noise is
~0.2-0.5% per score; recall@10 impact is measured by the bench's recall gate
rather than assumed.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_rows(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization.

    Returns (q [N, D] int8, scale [N] float32) with row ~= q * scale.
    """
    emb = np.asarray(emb, dtype=np.float32)
    absmax = np.abs(emb).max(axis=1)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint(emb / safe[:, None]), -127, 127).astype(np.int8)
    return q, scale


def quantize_residual(
    emb: np.ndarray, q8: np.ndarray, scale: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Second-level int8 quantization of the first level's residual.

    Reconstruction  row ~= q8*scale + r8*rscale  carries ~1/127 of the
    first-level error (relative error ~3e-5 — finer than bf16 rounding), so
    candidate rescoring against the reconstruction recovers exact-match
    recall while the SELECTION bank stays 1 byte/element.  Storage:
    int8+residual = 2 bytes/element (the bf16 copy it replaces costs the
    same, but would double the bytes STREAMED by the selection kernel)."""
    emb = np.asarray(emb, dtype=np.float32)
    resid = emb - q8.astype(np.float32) * scale[:, None]
    return quantize_rows(resid)


def quantized_scores(
    q_int8: jnp.ndarray,
    q_scale: jnp.ndarray,
    e_int8: jnp.ndarray,
    e_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Cosine scores from int8 operands: int32 MXU matmul + rank-1 rescale."""
    int_dot = jax.lax.dot_general(
        q_int8,
        e_int8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N]
    return (
        int_dot.astype(jnp.float32)
        * q_scale[:, None].astype(jnp.float32)
        * e_scale[None, :].astype(jnp.float32)
    )


def quantize_queries(q: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row int8 quantization of a (normalized) query batch, on device."""
    absmax = jnp.max(jnp.abs(q), axis=1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    qi = jnp.clip(jnp.round(q / safe[:, None]), -127, 127).astype(jnp.int8)
    return qi, scale.astype(jnp.float32)


def streaming_quantized_top_k(
    q: jnp.ndarray,
    e_int8: jnp.ndarray,
    e_scale: jnp.ndarray,
    valid_mask: jnp.ndarray,
    k: int,
    chunk_rows: int = 1 << 17,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming masked top-k over an int8 index (large-N path)."""
    b, d = q.shape
    n = e_int8.shape[0]
    k = min(k, n)
    pad = (-n) % chunk_rows
    if pad:
        e_int8 = jnp.pad(e_int8, ((0, pad), (0, 0)))
        e_scale = jnp.pad(e_scale, (0, pad))
        valid_mask = jnp.pad(valid_mask, (0, pad))
    c = (n + pad) // chunk_rows
    e_chunks = e_int8.reshape(c, chunk_rows, d)
    s_chunks = e_scale.reshape(c, chunk_rows)
    m_chunks = valid_mask.reshape(c, chunk_rows)
    bases = (jnp.arange(c, dtype=jnp.int32) * chunk_rows)[:, None]
    qi, qs = quantize_queries(q.astype(jnp.float32))

    def body(args):
        e_c, s_c, m_c, base = args
        scores = quantized_scores(qi, qs, e_c, s_c)
        scores = jnp.where(m_c[None, :], scores, -jnp.inf)
        from hcrag_tpu.ops.similarity import fast_top_k

        v, i = fast_top_k(scores, k)
        return v, i.astype(jnp.int32) + base

    vals, idxs = jax.lax.map(body, (e_chunks, s_chunks, m_chunks, bases))
    vals = jnp.moveaxis(vals, 0, 1).reshape(b, c * k)
    idxs = jnp.moveaxis(idxs, 0, 1).reshape(b, c * k)
    out_v, pos = jax.lax.top_k(vals, k)
    return out_v, jnp.take_along_axis(idxs, pos, axis=1)
