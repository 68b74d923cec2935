"""Shard-local kernels + cross-shard merges (the ICI communication layer).

The communication pattern for sharded retrieval (SURVEY §5.8):

  * index rows are sharded contiguously across the `rows` mesh axis;
  * each shard computes a local cosine matmul + local top-k (MXU + VPU work,
    no communication);
  * the per-shard (values, global-indices) candidates ride ICI via
    `all_gather` — O(shards * k) per query, tiny next to the matmul;
  * a final top-k over the gathered candidates runs replicated on every
    shard.

Tie-breaking stays deterministic end-to-end: `lax.top_k` prefers the lowest
position, candidates are concatenated shard-major (= ascending global row),
so equal scores resolve to the lowest global index — the same contract as the
single-device engine.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hcrag_tpu.parallel.mesh import ROWS_AXIS


def sharded_top_k(
    mesh: Mesh,
    query_emb: jnp.ndarray,
    index_emb: jnp.ndarray,
    top_k: int,
    valid_mask: Optional[jnp.ndarray] = None,
    batch_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine + top-k over a row-sharded index.

    Args:
      mesh: 1-D (or wider) mesh containing the `rows` axis.
      query_emb: [B, D] L2-normalized queries (replicated, or sharded along
        axis 0 over `batch_axis` when given — data-parallel queries).
      index_emb: [N, D] L2-normalized rows (sharded along axis 0).
      top_k: static k.
      valid_mask: optional [N] bool row filter (sharded along axis 0).
      batch_axis: optional mesh axis name to shard the query batch over; the
        per-shard candidate merge still rides ICI within each batch group.

    Returns (values [B, k], global indices [B, k]) — replicated, or
    batch-sharded when `batch_axis` is given.
    """
    n = index_emb.shape[0]
    n_shards = mesh.shape[ROWS_AXIS]
    rows_per_shard = n // n_shards
    assert rows_per_shard * n_shards == n, (
        f"index rows ({n}) must divide evenly over {n_shards} shards; pad the"
        " index at build time"
    )

    def local_fn(q, emb_local, mask_local):
        # q [B, D] replicated; emb_local [N/s, D]; mask_local [N/s]
        scores = jnp.dot(
            q.astype(emb_local.dtype),
            emb_local.T,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask_local[None, :], scores, -jnp.inf)
        k_local = min(top_k, rows_per_shard)
        v_loc, i_loc = jax.lax.top_k(scores, k_local)
        shard_id = jax.lax.axis_index(ROWS_AXIS)
        i_glob = i_loc.astype(jnp.int32) + shard_id * rows_per_shard
        # Candidates ride ICI: [s, B, k_local] -> shard-major merge.
        v_all = jax.lax.all_gather(v_loc, ROWS_AXIS)  # [s, B, k]
        i_all = jax.lax.all_gather(i_glob, ROWS_AXIS)
        v_cat = jnp.moveaxis(v_all, 0, 1).reshape(q.shape[0], -1)
        i_cat = jnp.moveaxis(i_all, 0, 1).reshape(q.shape[0], -1)
        v_fin, pos = jax.lax.top_k(v_cat, top_k)
        i_fin = jnp.take_along_axis(i_cat, pos, axis=1)
        return v_fin, i_fin

    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)

    q_spec = P(batch_axis) if batch_axis else P()
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(q_spec, P(ROWS_AXIS), P(ROWS_AXIS)),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    )
    return fn(query_emb, index_emb, valid_mask)


def sharded_row_gather(
    mesh: Mesh,
    table: jnp.ndarray,
    indices: jnp.ndarray,
) -> jnp.ndarray:
    """Gather rows of a row-sharded [N, ...] table at replicated indices.

    One-owner reduction: each shard contributes its owned rows, others
    contribute zero, and a `psum` over ICI assembles the result.  Cost is
    O(|indices| * row_bytes) on the wire — used for gathering top-k row
    features when the feature tables are sharded rather than replicated.

    indices: [...] int32 global row ids; negative ids yield zero rows.
    """
    n = table.shape[0]
    n_shards = mesh.shape[ROWS_AXIS]
    rows_per_shard = n // n_shards

    def local_fn(table_local, idx):
        shard_id = jax.lax.axis_index(ROWS_AXIS)
        local = idx - shard_id * rows_per_shard
        own = (local >= 0) & (local < rows_per_shard) & (idx >= 0)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        vals = table_local[safe]
        vals = jnp.where(
            own.reshape(own.shape + (1,) * (vals.ndim - own.ndim)), vals, 0
        )
        return jax.lax.psum(vals, ROWS_AXIS)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(ROWS_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table, indices)


def pad_rows(array, multiple: int, pad_value=0):
    """Pad axis 0 to a multiple (for even sharding); returns (padded, n_orig)."""
    import numpy as np

    n = array.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return array, n
    pad_width = [(0, target - n)] + [(0, 0)] * (array.ndim - 1)
    return np.pad(array, pad_width, constant_values=pad_value), n
