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
        shard_graph: bool = False,
        **kernel_opts,
    ):
        """`kernel_opts` forward to `QueryEngine` — the sharded path runs the
        SAME kernel stack per shard (`use_pallas`, `quantize_int8`,
        `int8_only`, `int8_rescore`, `exact_rescore`, `pallas_tile_n`,
        `pallas_interpret`): shard-local Pallas/int8/streaming selection, an
        ICI all-gather merge, and a distributed exact-rescore (see
        `sharded_ops.sharded_top_k`).

        `shard_graph=True` also shards the graph-side tables (neighbor ELL,
        per-node type ids, node->row links) over the rows axis instead of
        replicating them: at 10M nodes x degree 8 the two int32 ELL tables
        cost 640 MB replicated vs 80 MB/chip sharded.  Expansion hop gathers
        and per-node feature gathers then go through explicit replicated
        out-sharding gathers (XLA inserts the cross-shard collective)."""
        self.shard_graph = bool(shard_graph)
        self.mesh = mesh if mesh is not None else make_row_mesh()
        #: With a 2-D (batch, rows) mesh, also shard the query batch —
        #: data-parallel queries on top of the row-sharded index.
        from hcrag_tpu.parallel.mesh import BATCH_AXIS

        self.batch_axis = (
            BATCH_AXIS
            if shard_queries and BATCH_AXIS in self.mesh.shape
            else None
        )
        super().__init__(
            index, graph, embedder=embedder, ell_max_degree=ell_max_degree,
            **kernel_opts,
        )
        n_shards = self.mesh.shape[ROWS_AXIS]
        n_orig = self._n_rows
        self._n_orig = n_orig  # alias; `_n_padded` is set by _init_emb_banks

        # The embedding banks were placed row-sharded by `_init_emb_banks`
        # (called from the base __init__).  Re-place every OTHER table
        # explicitly REPLICATED on the same mesh, padded to the sharded row
        # count: mixing mesh-committed and single-device-committed arguments
        # in one jit call is an error, and top-k indices range over the
        # padded rows.
        from hcrag_tpu.parallel.mesh import replicated

        repl = replicated(self.mesh)
        pad_to = self._n_padded
        self.d_type_ids = jax.device_put(
            jnp.asarray(pad_rows(index.type_ids, pad_to, pad_value=0)[0]), repl
        )
        self.d_bits = jax.device_put(
            jnp.asarray(pad_rows(index.entity_bits, pad_to)[0]), repl
        )
        self.d_counts = jax.device_put(
            jnp.asarray(pad_rows(index.entity_counts, pad_to)[0]), repl
        )
        self.d_graph_ids = jax.device_put(
            jnp.asarray(pad_rows(index.graph_ids, pad_to, pad_value=-1)[0]),
            repl,
        )
        self._row_valid = jax.device_put(
            jnp.asarray(np.arange(self._n_padded) < n_orig), repl
        )
        if self.d_neighbors is not None:
            if self.shard_graph:
                # Per-shard ELL: pad the graph-node axis to the shard count
                # (pad rows carry -1 neighbors / -1 row links, so they are
                # inert) and split every graph table over `rows`.
                n_shards = self.mesh.shape[ROWS_AXIS]
                rows = row_sharding(self.mesh)
                put_g = lambda a, pad_value: jax.device_put(  # noqa: E731
                    jnp.asarray(
                        pad_rows(
                            np.asarray(a), n_shards, pad_value=pad_value
                        )[0]
                    ),
                    rows,
                )
                self.d_neighbors = put_g(self.d_neighbors, -1)
                self.d_neighbors_hop2 = put_g(self.d_neighbors_hop2, -1)
                self.d_g_type_ids = put_g(self.d_g_type_ids, 0)
                self.d_g_row = put_g(self.d_g_row, -1)
            else:
                self.d_neighbors = jax.device_put(self.d_neighbors, repl)
                self.d_neighbors_hop2 = jax.device_put(
                    self.d_neighbors_hop2, repl
                )
                self.d_g_type_ids = jax.device_put(self.d_g_type_ids, repl)
                self.d_g_row = jax.device_put(self.d_g_row, repl)

    def _gather_graph(self, table, idx):
        if not self.shard_graph:
            return table[idx]
        from jax.sharding import NamedSharding, PartitionSpec as P

        return table.at[idx].get(out_sharding=NamedSharding(self.mesh, P()))

    def _expand_impl(self, bank, seeds, depth: int, max_expanded: int):
        """Sharded-graph expansion: hop gathers hoisted OUT of the per-query
        vmap so each is ONE batched cross-shard gather; dedup/cap stays
        per-query (pure VPU work over gathered candidates).

        Semantics match `ops.expand.expand_k_hop` exactly: the intermediate
        frontier dedup there only masks duplicate positions to -1 (it never
        reorders), and duplicate hop-2 blocks introduce the same ids at
        LATER positions, so first-occurrence discovery order — and with it
        the cap — is unchanged (subgraph_expander.py:44-96 contract)."""
        if not self.shard_graph:
            return super()._expand_impl(bank, seeds, depth, max_expanded)
        from hcrag_tpu.ops.expand import dedup_and_cap

        nbrs = bank["neighbors"]
        table2 = bank["neighbors_hop2"]
        g = nbrs.shape[0]
        b = seeds.shape[0]
        cand = seeds  # [B, F]
        hops = []
        for hop in range(depth):
            table = nbrs if hop == 0 else table2
            safe = jnp.where(cand >= 0, cand, 0)
            nb = self._gather_graph(table, safe)  # [B, F, M]
            nb = jnp.where((cand >= 0)[..., None], nb, -1)
            cand = nb.reshape(b, -1)
            hops.append(cand)
        candidates = hops[0] if len(hops) == 1 else jnp.concatenate(hops, axis=1)
        return jax.vmap(lambda c: dedup_and_cap(c, g, max_expanded))(candidates)

    def _row_pad_multiple(self) -> int:
        # Shard count x tile alignment: every shard's LOCAL block stays
        # tile-aligned, so the per-shard Pallas kernels never pad internally.
        return self.mesh.shape[ROWS_AXIS] * super()._row_pad_multiple()

    def _init_emb_banks(self, emb_host: np.ndarray, device) -> None:
        """Row-sharded placement of the embedding banks — one sharded copy
        of the dominant array, never a single-device intermediate."""
        self._n_padded = emb_host.shape[0]
        rows = row_sharding(self.mesh)
        put_rows = lambda arr: jax.device_put(arr, rows)  # noqa: E731
        if self.quantize_int8:
            from hcrag_tpu.ops.quantize import quantize_residual, quantize_rows

            q8, scale = quantize_rows(emb_host.astype(np.float32))
            self.d_emb_int8 = put_rows(q8)
            self.d_emb_scale = put_rows(scale)
            if self.int8_residual:
                r8, rscale = quantize_residual(emb_host, q8, scale)
                self.d_emb_res8 = put_rows(r8)
                self.d_emb_res_scale = put_rows(rscale)
            else:
                self.d_emb_res8 = None
                self.d_emb_res_scale = None
            self.d_emb = (
                None
                if self.int8_only
                else put_rows(emb_host.astype(jnp.bfloat16))
            )
            self.d_emb_f32 = None
        else:
            self.d_emb_int8 = None
            self.d_emb_scale = None
            self.d_emb_res8 = None
            self.d_emb_res_scale = None
            if self.exact_rescore and emb_host.dtype == np.float32:
                self.d_emb = put_rows(emb_host.astype(jnp.bfloat16))
                self.d_emb_f32 = put_rows(emb_host)
            else:
                self.exact_rescore = 0
                self.d_emb_f32 = None
                self.d_emb = put_rows(emb_host)

    def _bank(self):
        bank = super()._bank()
        bank["row_valid"] = self._row_valid
        return bank

    def _put_query_input(self, x):
        from hcrag_tpu.parallel.mesh import replicated

        return jax.device_put(x, replicated(self.mesh))

    def _gather_emb_rows(self, indices, bank):
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        if "emb" not in bank:
            # int8-only residency: dequantize gathered rows on the fly
            # (+ the residual level when present).
            rows = (
                bank["emb_int8"].at[indices].get(out_sharding=repl)
                .astype(jnp.float32)
                * bank["emb_scale"].at[indices].get(out_sharding=repl)[..., None]
            )
            if "emb_res8" in bank:
                rows = rows + (
                    bank["emb_res8"].at[indices].get(out_sharding=repl)
                    .astype(jnp.float32)
                    * bank["emb_res_scale"].at[indices]
                    .get(out_sharding=repl)[..., None]
                )
            return rows
        return bank["emb"].at[indices].get(out_sharding=repl)

    def _topk_impl(self, q_emb, type_mask, top_k: int, bank):
        # type_mask arrives sized [n_orig] (host filters) or [n_padded] (the
        # engine's cached all-true mask); pad if needed, then AND validity.
        pad = self._n_padded - type_mask.shape[0]
        if pad:
            type_mask = jnp.concatenate(
                [type_mask, jnp.zeros((pad,), dtype=bool)]
            )
        mask = type_mask & bank["row_valid"]

        # Row-sharded banks handed to the shard-local kernel (+ rescore).
        banks = {}
        for key in (
            "emb", "emb_int8", "emb_scale", "emb_f32",
            "emb_res8", "emb_res_scale",
        ):
            if key in bank:
                banks[key] = bank[key]
        m = self._rescore_m()
        rescore_rows = None
        if m:
            if not self.quantize_int8:
                rescore_rows = lambda bl, ix: bl["emb_f32"][ix]  # noqa: E731
            elif self.int8_residual:
                # int8-only + residual: reconstruct q8*s + r8*rs per shard.
                def rescore_rows(bl, ix):  # noqa: E731
                    return (
                        bl["emb_int8"][ix].astype(jnp.float32)
                        * bl["emb_scale"][ix][..., None]
                        + bl["emb_res8"][ix].astype(jnp.float32)
                        * bl["emb_res_scale"][ix][..., None]
                    )
            else:
                rescore_rows = lambda bl, ix: bl["emb"][ix]  # noqa: E731
        return sharded_top_k(
            self.mesh, q_emb, None, top_k, mask,
            batch_axis=self.batch_axis,
            banks=banks,
            local_select=self._local_select,
            fetch_k=max(top_k, m) if m else 0,
            rescore_rows=rescore_rows,
        )
