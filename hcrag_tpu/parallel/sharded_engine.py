"""ShardedQueryEngine — the multi-chip query path.

Extends `QueryEngine` with index rows sharded over the `rows` mesh axis (ICI
domain).  Memory/communication layout (SURVEY §2.3, §5.8):

  * `emb` [N, D]           — SHARDED along rows (the dominant array:
                              ~1.5 KB/row at D=384 f32, 768 B bf16)
  * per-row feature tables — replicated (tens of bytes per row)
  * queries                — replicated; per-shard top-k candidates merged
                              over ICI via all_gather (O(shards*k))
  * graph adjacency        — replicated in this engine (shard when G*M grows
                              past HBM; `sharded_row_gather` provides the
                              cross-shard gather primitive for that case)

The sharded path is bit-identical to the single-device engine: same scores,
same deterministic lowest-global-index tie-breaking, verified by the 8-device
CPU-mesh tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.core.graph import CsrGraph
from hcrag_tpu.parallel.mesh import ROWS_AXIS, make_row_mesh, row_sharding
from hcrag_tpu.parallel.sharded_ops import pad_rows, sharded_top_k
from hcrag_tpu.query.engine import QueryEngine


class ShardedQueryEngine(QueryEngine):
    def __init__(
        self,
        index: DenseIndex,
        graph: Optional[CsrGraph] = None,
        *,
        mesh=None,
        embedder=None,
        ell_max_degree: Optional[int] = None,
        shard_queries: bool = False,
    ):
        self.mesh = mesh if mesh is not None else make_row_mesh()
        #: With a 2-D (batch, rows) mesh, also shard the query batch —
        #: data-parallel queries on top of the row-sharded index.
        from hcrag_tpu.parallel.mesh import BATCH_AXIS

        self.batch_axis = (
            BATCH_AXIS
            if shard_queries and BATCH_AXIS in self.mesh.shape
            else None
        )
        n_shards = self.mesh.shape[ROWS_AXIS]

        # Pad the row axis so it divides evenly across shards; padded rows are
        # masked out of every top-k by `_row_valid`.
        emb_padded, n_orig = pad_rows(np.asarray(index.emb), n_shards)
        self._n_orig = n_orig
        self._n_padded = emb_padded.shape[0]

        super().__init__(
            index, graph, embedder=embedder, ell_max_degree=ell_max_degree
        )

        # Re-place the big arrays with explicit shardings.  Every other table
        # is explicitly REPLICATED on the same mesh: mixing mesh-committed
        # and single-device-committed arguments in one jit call is an error,
        # and checkpoint restores return committed arrays.
        from hcrag_tpu.parallel.mesh import replicated

        repl = replicated(self.mesh)
        self.d_emb = jax.device_put(jnp.asarray(emb_padded), row_sharding(self.mesh))
        self.d_type_ids = jax.device_put(
            jnp.asarray(pad_rows(index.type_ids, n_shards, pad_value=0)[0]), repl
        )
        self.d_bits = jax.device_put(
            jnp.asarray(pad_rows(index.entity_bits, n_shards)[0]), repl
        )
        self.d_counts = jax.device_put(
            jnp.asarray(pad_rows(index.entity_counts, n_shards)[0]), repl
        )
        self.d_graph_ids = jax.device_put(
            jnp.asarray(pad_rows(index.graph_ids, n_shards, pad_value=-1)[0]),
            repl,
        )
        self._row_valid = jax.device_put(
            jnp.asarray(np.arange(self._n_padded) < n_orig), repl
        )
        if self.d_neighbors is not None:
            self.d_neighbors = jax.device_put(self.d_neighbors, repl)
            self.d_neighbors_hop2 = jax.device_put(self.d_neighbors_hop2, repl)
            self.d_g_type_ids = jax.device_put(self.d_g_type_ids, repl)
            self.d_g_row = jax.device_put(self.d_g_row, repl)

    def _bank(self):
        bank = super()._bank()
        bank["row_valid"] = self._row_valid
        return bank

    def _put_query_input(self, x):
        from hcrag_tpu.parallel.mesh import replicated

        return jax.device_put(x, replicated(self.mesh))

    def _gather_emb_rows(self, indices, bank):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return bank["emb"].at[indices].get(
            out_sharding=NamedSharding(self.mesh, P())
        )

    def _topk_impl(self, q_emb, type_mask, top_k: int, bank):
        # type_mask arrives sized [n_orig] (host filters) or [n_padded] (the
        # engine's cached all-true mask); pad if needed, then AND validity.
        pad = self._n_padded - type_mask.shape[0]
        if pad:
            type_mask = jnp.concatenate(
                [type_mask, jnp.zeros((pad,), dtype=bool)]
            )
        mask = type_mask & bank["row_valid"]
        return sharded_top_k(
            self.mesh, q_emb, bank["emb"], top_k, mask,
            batch_axis=self.batch_axis,
        )
