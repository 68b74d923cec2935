"""Pallas TPU kernel: fused multi-metric relevance scoring.

Kernel (b) of the north star: one pass computes, for a query batch against a
node bank,

    sem  = (q . e + 1)/2          (MXU matmul on normalized embeddings)
    ent  = popcount(q_bits & n_bits) / |q|  with 0.5/0.1 empty rules (VPU)
    typ  = priority[intent, type]            (gather)
    out  = weighted_sum([sem, llm, ent, typ]) or max(...)

entirely in VMEM — the metric stack never round-trips through HBM.  Used for
re-scoring candidate banks (sampled agent nodes, expanded neighborhoods,
retrieved rows); the XLA path in `ops/scoring.py` remains the reference
implementation and the parity oracle.

Layout notes: node count padded to the tile size; entity bitsets are uint32
words [*, W] with W padded to 8 so int32 tiles align; the priority matrix and
weights ride in as small VMEM-resident constants.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hcrag_tpu.core.types import (
    PRIORITY_MATRIX,
    REDUCE_MAX,
    NUM_NODE_TYPES,
)


def _scoring_kernel(
    q_emb_ref,      # [B, D] f32
    q_bits_ref,     # [B, W] uint32 (replicated over grid)
    q_count_ref,    # [B, 1] int32 (popcount + oov)
    intent_ref,     # [B, 1] int32
    weights_ref,    # [1, 4] f32
    priority_ref,   # [I, T] f32
    n_emb_ref,      # [TILE, D]
    n_bits_ref,     # [TILE, W] uint32
    n_count_ref,    # [TILE, 1] int32
    n_type_ref,     # [TILE, 1] int32
    llm_ref,        # [B, TILE] f32 (host-computed judge column or zeros)
    out_ref,        # [B, TILE] f32
    *,
    reduction: int,
):
    b = q_emb_ref.shape[0]
    tile = n_emb_ref.shape[0]
    w = q_bits_ref.shape[1]

    # Semantic: MXU matmul, then (cos+1)/2.
    cos = jax.lax.dot_general(
        q_emb_ref[:],
        n_emb_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE]
    sem = (cos + 1.0) * 0.5

    # Entity match: bitset AND + popcount accumulated over words.
    inter = jnp.zeros((b, tile), jnp.int32)
    for word in range(w):
        qw = q_bits_ref[:, word][:, None]  # [B, 1]
        nw = n_bits_ref[:, word][None, :]  # [1, TILE]
        inter = inter + jax.lax.population_count(qw & nw).astype(jnp.int32)
    q_count = q_count_ref[:, 0][:, None].astype(jnp.float32)  # [B, 1]
    n_count = n_count_ref[:, 0][None, :]  # [1, TILE]
    ratio = inter.astype(jnp.float32) / jnp.maximum(q_count, 1.0)
    ent = jnp.where(
        q_count == 0.0,
        jnp.where(n_count == 0, 0.5, 0.1),
        ratio,
    )

    # Node-type priority: tiny gather via one-hot contraction (avoids
    # dynamic gather lowering inside the kernel).
    intent_onehot = (
        intent_ref[:, 0][:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (b, priority_ref.shape[0]), 1)
    ).astype(jnp.float32)  # [B, I]
    row_pri = jnp.dot(
        intent_onehot, priority_ref[:], preferred_element_type=jnp.float32
    )  # [B, T]
    type_onehot = (
        n_type_ref[:, 0][None, :, None]
        == jax.lax.broadcasted_iota(
            jnp.int32, (1, tile, priority_ref.shape[1]), 2
        )
    ).astype(jnp.float32)  # [1, TILE, T]
    typ = jnp.einsum("bt,xnt->bn", row_pri, type_onehot)  # [B, TILE]

    llm = llm_ref[:]

    if reduction == REDUCE_MAX:
        out = jnp.maximum(jnp.maximum(sem, llm), jnp.maximum(ent, typ))
    else:
        w0 = weights_ref[0, 0]
        w1 = weights_ref[0, 1]
        w2 = weights_ref[0, 2]
        w3 = weights_ref[0, 3]
        out = sem * w0 + llm * w1 + ent * w2 + typ * w3
    out_ref[:] = out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("reduction", "tile", "interpret")
)
def pallas_batch_relevance(
    q_emb: jnp.ndarray,      # [B, D] normalized f32
    q_bits: jnp.ndarray,     # [B, W] uint32
    q_counts: jnp.ndarray,   # [B] int32 (in-vocab popcount + oov)
    intent_ids: jnp.ndarray, # [B] int32
    node_emb: jnp.ndarray,   # [N, D] normalized
    node_bits: jnp.ndarray,  # [N, W] uint32
    node_counts: jnp.ndarray,  # [N] int32
    node_type_ids: jnp.ndarray,  # [N] int32
    weights: jnp.ndarray,    # [4] f32
    llm_scores: Optional[jnp.ndarray] = None,  # [B, N]
    *,
    reduction: int = 0,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused relevance scores [B, N] for a query batch over a node bank."""
    b, d = q_emb.shape
    n = node_emb.shape[0]
    w = q_bits.shape[1]

    n_pad = _round_up(n, tile)
    if n_pad != n:
        pad = n_pad - n
        node_emb = jnp.pad(node_emb, ((0, pad), (0, 0)))
        node_bits = jnp.pad(node_bits, ((0, pad), (0, 0)))
        node_counts = jnp.pad(node_counts, (0, pad))
        node_type_ids = jnp.pad(
            node_type_ids, (0, pad), constant_values=NUM_NODE_TYPES - 1
        )
    if llm_scores is None:
        llm_scores = jnp.zeros((b, n_pad), jnp.float32)
    elif llm_scores.shape[1] != n_pad:
        llm_scores = jnp.pad(
            llm_scores, ((0, 0), (0, n_pad - llm_scores.shape[1]))
        )
    num_tiles = n_pad // tile

    kernel = functools.partial(_scoring_kernel, reduction=reduction)
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                PRIORITY_MATRIX.shape, lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        interpret=interpret,
    )(
        q_emb.astype(jnp.float32),
        q_bits,
        q_counts.reshape(b, 1),
        intent_ids.reshape(b, 1),
        weights.reshape(1, 4).astype(jnp.float32),
        jnp.asarray(PRIORITY_MATRIX),
        node_emb.astype(jnp.float32),
        node_bits,
        node_counts.reshape(-1, 1),
        node_type_ids.reshape(-1, 1),
        llm_scores.astype(jnp.float32),
    )
    return out[:, :n]
