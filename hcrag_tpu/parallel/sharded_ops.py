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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hcrag_tpu.parallel.mesh import ROWS_AXIS


def sharded_top_k(
    mesh: Mesh,
    query_emb: jnp.ndarray,
    index_emb: Optional[jnp.ndarray],
    top_k: int,
    valid_mask: Optional[jnp.ndarray] = None,
    batch_axis: Optional[str] = None,
    *,
    banks: Optional[dict] = None,
    local_select=None,
    fetch_k: int = 0,
    rescore_key: Optional[str] = None,
    rescore_rows=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine + top-k over a row-sharded index.

    Args:
      mesh: 1-D (or wider) mesh containing the `rows` axis.
      query_emb: [B, D] L2-normalized queries (replicated, or sharded along
        axis 0 over `batch_axis` when given — data-parallel queries).
      index_emb: [N, D] L2-normalized rows (sharded along axis 0); may be
        None when `banks` carries the selection arrays (int8-only mode).
      top_k: static k.
      valid_mask: optional [N] bool row filter (sharded along axis 0).
      batch_axis: optional mesh axis name to shard the query batch over; the
        per-shard candidate merge still rides ICI within each batch group.
      banks: extra row-sharded [N, ...] arrays handed to `local_select` (and
        to the rescore stage via `rescore_key`) as their local shards —
        e.g. {"emb_int8": ..., "emb_scale": ..., "emb_f32": ...}.
      local_select: optional shard-local selection kernel
        `(q, banks_local, mask_local, top_k, fetch_k) -> (values, LOCAL idx)`
        returning max(top_k, fetch_k) oversampled candidates per query
        ((NEG_INF, -1) fillers allowed).  This is how the engine's
        Pallas/int8/streaming kernels run per-shard — the default is a plain
        XLA matmul + lax.top_k over `banks["emb"]`.
      fetch_k: candidates kept at the cross-shard merge (>= top_k enables
        exact-rescore oversampling; 0 means top_k).
      rescore_key: when set, the merged candidates are re-ranked by exact
        f32 dots against the row-sharded `banks[rescore_key]` table.  The
        rescore itself is distributed: each shard scores only the candidates
        it OWNS (zero elsewhere) and a psum of the [B, fetch_k] score matrix
        — not the [B, fetch_k, D] rows — rides ICI.
      rescore_rows: alternative to `rescore_key`: a callable
        `(banks_local, local_idx) -> [B, m, D] rows` reconstructing the
        exact rows from the local banks (e.g. int8 + residual dequant).

    Returns (values [B, k], global indices [B, k]) — replicated, or
    batch-sharded when `batch_axis` is given.

    Determinism: per-shard kernels break ties to the lowest local index,
    candidates merge shard-major (= ascending global row), and `lax.top_k`
    prefers the lowest position — so equal scores resolve to the lowest
    global index, identical to the single-device engine.  The merged
    candidate SET also matches the single-device merge exactly: a candidate
    in the global top-fetch_k of the pooled per-tile candidates is
    necessarily in its own shard's top-fetch_k.
    """
    banks = dict(banks or {})
    if index_emb is not None:
        banks.setdefault("emb", index_emb)
    n = next(iter(banks.values())).shape[0]
    n_shards = mesh.shape[ROWS_AXIS]
    rows_per_shard = n // n_shards
    assert rows_per_shard * n_shards == n, (
        f"index rows ({n}) must divide evenly over {n_shards} shards; pad the"
        " index at build time"
    )
    fk = max(top_k, fetch_k)
    do_rescore = rescore_rows is not None or rescore_key is not None
    if rescore_rows is None and rescore_key is not None:
        rescore_rows = lambda bl, ix: bl[rescore_key][ix]  # noqa: E731

    def default_select(q, banks_local, mask_local, k_out, m_out):
        emb_local = banks_local["emb"]
        scores = jnp.dot(
            q.astype(emb_local.dtype),
            emb_local.T,
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(mask_local[None, :], scores, -jnp.inf)
        return jax.lax.top_k(scores, min(max(k_out, m_out), scores.shape[1]))

    select = local_select or default_select

    def local_fn(q, banks_local, mask_local):
        # q [B, D] replicated; banks_local [N/s, ...]; mask_local [N/s]
        v_loc, i_loc = select(q, banks_local, mask_local, top_k, fk)
        shard_id = jax.lax.axis_index(ROWS_AXIS)
        i_glob = jnp.where(
            i_loc >= 0,
            i_loc.astype(jnp.int32) + shard_id * rows_per_shard,
            -1,
        )
        # Candidates ride ICI: [s, B, m] -> shard-major merge.
        v_all = jax.lax.all_gather(v_loc, ROWS_AXIS)
        i_all = jax.lax.all_gather(i_glob, ROWS_AXIS)
        v_cat = jnp.moveaxis(v_all, 0, 1).reshape(q.shape[0], -1)
        i_cat = jnp.moveaxis(i_all, 0, 1).reshape(q.shape[0], -1)
        keep = top_k if not do_rescore else min(fk, v_cat.shape[1])
        v_m, pos = jax.lax.top_k(v_cat, keep)
        i_m = jnp.take_along_axis(i_cat, pos, axis=1)
        if not do_rescore:
            return v_m, i_m

        # Distributed exact rescore: each shard computes exact f32 scores
        # for the merged candidates it OWNS (others contribute zero) and a
        # psum over ICI assembles the [B, m] exact-score matrix — B*m*4
        # bytes on the wire instead of the B*m*D*4 a row-gather would cost.
        local = i_m - shard_id * rows_per_shard
        valid = (i_m >= 0) & (v_m > -1e29)
        own = valid & (local >= 0) & (local < rows_per_shard)
        safe = jnp.clip(local, 0, rows_per_shard - 1)
        rows = rescore_rows(banks_local, safe).astype(jnp.float32)  # [B,m,D]
        exact = jnp.einsum(
            "bd,bmd->bm", q.astype(jnp.float32), rows,
            precision=jax.lax.Precision.HIGHEST,
        )
        exact = jnp.where(own, exact, 0.0)
        exact = jax.lax.psum(exact, ROWS_AXIS)
        exact = jnp.where(valid, exact, -1e30)
        sv, sp = jax.lax.top_k(exact, top_k)
        return sv, jnp.take_along_axis(i_m, sp, axis=1)

    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)

    q_spec = P(batch_axis) if batch_axis else P()
    bank_specs = {k: P(ROWS_AXIS) for k in banks}
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(q_spec, bank_specs, P(ROWS_AXIS)),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    )
    return fn(query_emb, banks, valid_mask)


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
