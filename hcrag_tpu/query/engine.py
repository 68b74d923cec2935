"""QueryEngine — the batched, jitted query path.

Single-device rebuild of the reference's query stack (SURVEY §3.2, §3.3):

  reference                                   here
  ---------                                   ----
  EmbeddingRAGSystem.process_query            QueryEngine.process_query
    (main.py:790-829)                           (host wrapper, same dict shape)
  find_similar_content (main.py:831-857)      one fused device step: cosine
  search_by_category (main.py:859-905)          matmul + chunked top-k (+ type
                                                mask for category search)
  SubgraphExpander.expand_subgraph            expand_batch over ELL adjacency
    (subgraph_expander.py:44-96)                inside the same jit
  batch_isRelevant (isRelevant.py:425-501)    fused metric stack + weighted
                                                reduction on the top-k rows
                                                and on expanded graph nodes
  combined = 0.7*rel + 0.3*sim                same constants
    (enhanced_rag_system.py:148)

Everything between query-embedding input and (scores, ids) output is ONE
compiled XLA program per (batch, k, depth) shape; compiled programs are
cached on the engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hcrag_tpu import config as cfg
from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.core.graph import CsrGraph
from hcrag_tpu.core.types import (
    EXPANSION_EDGE_TYPES,
    REDUCE_MAX,
    REDUCE_WEIGHTED_SUM,
    CompositeWeights,
    QueryIntent,
    ScorerType,
    node_type_id,
    scorer_spec,
)
from hcrag_tpu.ingest.entities import (
    extract_entities_from_content,
    infer_query_intent,
)
from hcrag_tpu.ops.scoring import entity_match_scores, popcount_words
from hcrag_tpu.ops.similarity import (
    masked_top_k,
    streaming_masked_top_k,
)

_GRAPH_LABEL_TO_TYPE = {
    "Product": "product",
    "Category": "category",
    "Document": "document",
    "Annotation": "annotation",
}


@dataclasses.dataclass
class QueryBatchResult:
    """Device outputs for a query batch (all [B, ...])."""

    top_scores: np.ndarray  # [B, k] cosine similarity
    top_indices: np.ndarray  # [B, k] index rows
    relevance: np.ndarray  # [B, k] isRelevant scores of retrieved rows
    combined: np.ndarray  # [B, k] 0.7*rel + 0.3*sim
    expanded_nodes: np.ndarray  # [B, max_expanded] graph node ids (-1 pad)
    expanded_counts: np.ndarray  # [B]
    expanded_relevance: np.ndarray  # [B, max_expanded]
    #: Learned re-ranker scores [B, k] (None unless rerank=True; when set,
    #: every [B, k] field above is reordered by these, descending).
    rerank_scores: Optional[np.ndarray] = None


def exact_rescore(q_emb, v, i, rows_fn, top_k: int):
    """Exact-rescore refinement: re-rank the oversampled candidate set
    (v, i) by exact f32 dots of `rows_fn(i)` and keep top_k.
    Invalid slots never win: merge fillers carry idx -1, and rows masked out
    by the type filter carry -inf/NEG_INF scores (their indices still point
    at real — but excluded — rows, so rescoring them would resurrect
    filtered rows)."""
    valid = (i >= 0) & (v > -1e29)
    rows = rows_fn(jnp.where(valid, i, 0)).astype(jnp.float32)
    exact = jnp.einsum(
        "bd,bmd->bm", q_emb.astype(jnp.float32), rows,
        precision=jax.lax.Precision.HIGHEST,
    )
    exact = jnp.where(valid, exact, -1e30)
    sv, sp = jax.lax.top_k(exact, top_k)
    return sv, jnp.take_along_axis(i, sp, axis=1)


class QueryEngine:
    """Single-device query engine over a DenseIndex (+ optional CsrGraph)."""

    def __init__(
        self,
        index: DenseIndex,
        graph: Optional[CsrGraph] = None,
        *,
        embedder=None,
        ell_max_degree: Optional[int] = None,
        device=None,
        use_pallas: Optional[bool] = None,
        pallas_tile_n: int = 2048,
        quantize_int8: bool = False,
        int8_only: bool = False,
        int8_residual: bool = False,
        int8_rescore: int = 0,
        int8_f32_rescore: bool = False,
        exact_rescore: int = 0,
        pallas_super: int = 0,
        select_lane_t: int = 0,
        pallas_interpret: Optional[bool] = None,
    ):
        self.index = index
        self.graph = graph
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "cpu"
        on_tpu = backend in ("tpu", "axon")
        #: Run Pallas kernels in the interpreter — lets the CPU-mesh tests
        #: exercise the exact kernel code paths (incl. the sharded engine's
        #: shard-local Pallas dispatch) without TPU hardware.
        self._pallas_interpret = (
            bool(pallas_interpret)
            if pallas_interpret is not None
            else bool(use_pallas) and not on_tpu
        )
        pallas_ok = on_tpu or self._pallas_interpret
        if use_pallas is None:
            # Default to the fused Pallas kernel on TPU backends: measured
            # 19x faster than the XLA matmul+top-k pipeline (5.5 ms vs
            # 106 ms per 512-query batch at 250k rows — benchmarks/ablation).
            use_pallas = (
                on_tpu and index.dim % 128 == 0 and not quantize_int8
            )
        #: int8 index + TPU (or interpreter) -> the fused int8 kernel
        #: (halved E-read bytes).
        self._int8_pallas = (
            quantize_int8 and pallas_ok and index.dim % 128 == 0
        )
        if quantize_int8:
            use_pallas = False  # the f32/bf16 kernel has no int8 operands
        self.use_pallas = use_pallas
        self.pallas_tile_n = pallas_tile_n
        #: Supertile factor for the packed rescore-gated kernels (round 5):
        #: level-2 picks + candidate writes once per spt-tile supertile.
        #: MEASURED to lose at both 1M and 10M (see `_super_request`), so
        #: 0 (auto) never engages it; > 1 forces the path explicitly.
        self.pallas_super = int(pallas_super)
        #: Per-lane candidate depth for the fused two-level selection
        #: (0 = auto `_lane_depth(k)`).  1 halves the streaming-insert VPU
        #: passes at k<=16; only meaningful on rescore-gated paths (same
        #: probabilistic-drop contract as two_level — the bench recall
        #: gate watches it).
        self.select_lane_t = int(select_lane_t)
        self.quantize_int8 = quantize_int8
        #: Quantized-recall refinement: the int8 kernel selects an
        #: oversampled candidate set (`int8_rescore` per query), then the
        #: exact bf16 rows of just those candidates are gathered and
        #: rescored in f32 — int8 selection speed, near-exact final ranking.
        #: Needs the bf16 copy, so it is off in int8-only residency mode.
        self.int8_only = bool(int8_only)
        #: Residual-refined max-density mode: the selection bank stays int8
        #: (1 byte/elem streamed) and a SECOND int8 bank quantizes the
        #: first level's residual — candidate gathers reconstruct
        #: q8*s + r8*rs (relative error ~3e-5, finer than bf16), giving the
        #: int8-only 10M-rows-on-one-chip mode an exact-rescore source
        #: (round-1 gap: int8-only recall was 0.95 with nothing to rescore
        #: against).  Implies int8-only residency (no bf16 copy).
        self.int8_residual = bool(int8_residual) and quantize_int8
        if self.int8_residual:
            self.int8_only = True
        self.int8_rescore = (
            max(0, int(int8_rescore))
            if (quantize_int8 and (not self.int8_only or self.int8_residual))
            else 0
        )
        #: Round-5 headline mode: int8 SELECTION bank (half the bf16 E-read
        #: bytes + int8 MXU throughput) with candidates rescored from a kept
        #: f32 bank — the recall-1.0 exactness of the bf16+f32 hybrid at
        #: int8 selection speed.  Memory: +4 bytes/elem resident (f32 bank),
        #: so this is the <=1M-rows throughput mode, not the 10M density
        #: mode (which stays int8_residual).
        self.int8_f32_rescore = (
            bool(int8_f32_rescore) and quantize_int8 and not self.int8_only
        )
        #: Float-path analogue (`exact_rescore=m`): the kernel bank drops to
        #: bf16 and an f32 bank is kept for candidate rescoring — bf16 input
        #: rounding is the only recall loss in the float path, and exact f32
        #: rescoring of the oversampled merge removes it.
        self.exact_rescore = (
            max(0, int(exact_rescore)) if not quantize_int8 else 0
        )
        if embedder is None:
            from hcrag_tpu.models.embedder import embedder_from_index

            embedder = embedder_from_index(index)
        self.embedder = embedder

        put = functools.partial(jax.device_put, device=device)
        # Device-resident index bank.  The row axis is pre-padded ONCE to
        # `_row_pad_multiple()` (Pallas tile alignment — incl. the int8
        # kernel, which would otherwise jnp.pad its whole bank inside every
        # compiled step); padded rows are masked out of every top-k.
        self._n_rows = np.asarray(index.emb).shape[0]
        self._init_emb_banks(self._padded_host_emb(), device)
        self.d_type_ids = put(jnp.asarray(index.type_ids))
        self.d_bits = put(jnp.asarray(index.entity_bits))
        self.d_counts = put(jnp.asarray(index.entity_counts))
        self.d_graph_ids = put(jnp.asarray(index.graph_ids))

        # Graph bank (expansion + expanded-node scoring).
        if graph is not None:
            if graph.edge_type_vocab is None:
                ell = graph.to_ell(EXPANSION_EDGE_TYPES, max_degree=ell_max_degree)
                # Second-hop table: ANNOTATION edges only — the reference's
                # depth-2 path is Product -> Document -> Annotation
                # (subgraph_expander.py:216-218), never Document -> other
                # products of the same document.
                ell2 = graph.to_ell(("ANNOTATION",), max_degree=ell_max_degree)
            else:
                # Discovered-vocabulary graph (property-graph path): there is
                # no ANNOTATION/DESCRIBED_BY schema to whitelist — expansion
                # follows all relations, like the generic stack's retrievers
                # (query_interface.py:166-221); depth 2 reuses the same table.
                ell = graph.to_ell(max_degree=ell_max_degree)
                ell2 = ell
            self.d_neighbors = put(jnp.asarray(ell.neighbors))
            self.d_neighbors_hop2 = put(jnp.asarray(ell2.neighbors))
            g_types = np.array(
                [
                    node_type_id(_GRAPH_LABEL_TO_TYPE.get(lbl, "unknown"))
                    for lbl in graph.node_labels
                ],
                dtype=np.int32,
            )
            self.d_g_type_ids = put(jnp.asarray(g_types))
            self.d_g_row = put(jnp.asarray(graph.node_to_row))
        else:
            self.d_neighbors = None
            self.d_neighbors_hop2 = None
            self.d_g_type_ids = None
            self.d_g_row = None

        self._step_cache: Dict[Tuple, callable] = {}

    # ------------------------------------------------------------------
    # Bank construction (overridden by the sharded engine)
    # ------------------------------------------------------------------
    def _super_request(self, tile: int, batch: int) -> int:
        """Supertile factor to REQUEST from the kernel for this call shape
        (the kernel clamps further against tile count / feasibility).
        MEASURED RESULT (round 5): the mechanism loses at every size —
        39.7k vs 61.2k QPS at 1M and 4.9k vs 7.3k at 10M (results.json
        synthetic_1M_super_sweep_r5 and
        synthetic_10M_one_chip_int8_residual._super_attempt_r5).  The
        per-subtile scratch read-modify-write plus the extra accumulator
        plane cost ~3.7 us/subtile, scaling with tile count, while the
        per-tile candidate writes it saves turn out fully overlapped by
        the output DMA even at 10M.  Auto therefore NEVER engages;
        explicit `pallas_super > 1` still forces the path (tested, recall
        holds under the exact rescore) for future hardware where the
        write/compute balance differs.  Off for small batches regardless:
        the supertile candidate layout is [k_sub, B] (B on lanes), so b
        pads to 128 — wasted matmul work below that."""
        if self.pallas_super > 1 and batch >= 64:
            return self.pallas_super
        return 1

    def _super_pad_multiple(self, tile: int) -> int:
        """Pad multiple covering the supertile the kernel will resolve for
        this bank: spt * tile where spt mirrors `_resolve_super_tiles`'
        clamps (8192-row cap, tile-count cap) — so the bank divides evenly
        (no per-call jnp.pad copy) and tiny indexes aren't inflated."""
        n = int(np.asarray(self.index.emb).shape[0])
        spt = min(max(1, 8192 // tile), max(1, -(-n // tile)))
        spt = 1 << (spt.bit_length() - 1)  # floor power of two
        return spt * tile

    def _row_pad_multiple(self) -> int:
        """Row-axis padding multiple for the device bank.  Pallas paths
        pre-pad to the tile size once at init so the kernels never pad per
        call (an internal jnp.pad would copy the whole bank inside every
        compiled step); rescore-gated paths pad to the supertile width (up
        to 8192 rows) so any legal (tile, super) choice divides the bank.
        The sharded engine multiplies this by the shard count so every
        shard's local block stays tile-aligned."""
        if self.use_pallas:
            if self.exact_rescore and self.pallas_super > 1:
                return self._super_pad_multiple(min(self.pallas_tile_n, 2048))
            return self.pallas_tile_n
        if self._int8_pallas:
            if self.int8_rescore and self.pallas_super > 1:
                return self._super_pad_multiple(min(self.pallas_tile_n, 2048))
            return min(self.pallas_tile_n, 2048)  # packed lane field: 11 bits
        return 1

    def _padded_host_emb(self) -> np.ndarray:
        emb_host = np.asarray(self.index.emb)
        mult = self._row_pad_multiple()
        if mult > 1 and emb_host.shape[0] % mult:
            pad = mult - emb_host.shape[0] % mult
            emb_host = np.pad(emb_host, ((0, pad), (0, 0)))
        return emb_host

    def _init_emb_banks(self, emb_host: np.ndarray, device) -> None:
        """Build + place the embedding banks (quantized / dual-residency
        variants included).  `emb_host` arrives pre-padded to
        `_row_pad_multiple()`.  The sharded engine overrides this with
        row-sharded placement over its mesh — keeping ONE copy of the
        dominant array instead of a single-device copy plus a re-placement."""
        put = functools.partial(jax.device_put, device=device)
        if self.quantize_int8:
            from hcrag_tpu.ops.quantize import quantize_rows

            q8, scale = quantize_rows(emb_host.astype(np.float32))
            self.d_emb_int8 = put(jnp.asarray(q8))
            self.d_emb_scale = put(jnp.asarray(scale))
            if self.int8_residual:
                from hcrag_tpu.ops.quantize import quantize_residual

                r8, rscale = quantize_residual(emb_host, q8, scale)
                self.d_emb_res8 = put(jnp.asarray(r8))
                self.d_emb_res_scale = put(jnp.asarray(rscale))
            else:
                self.d_emb_res8 = None
                self.d_emb_res_scale = None
            if self.int8_only:
                # Maximum-density mode (10M rows on one chip): no bf16 copy;
                # expanded-node scoring dequantizes gathered int8 rows
                # (+ residual when enabled).
                self.d_emb = None
            else:
                # bf16 copy for expanded-node scoring gathers (small gathers;
                # dominated by the int8 matmul savings).
                self.d_emb = put(jnp.asarray(emb_host).astype(jnp.bfloat16))
            if self.int8_f32_rescore and emb_host.dtype == np.float32:
                # f32 rescore source: int8 selection speed, f32 ranking.
                self.d_emb_f32 = put(jnp.asarray(emb_host))
            else:
                self.int8_f32_rescore = False  # needs an f32 source
                self.d_emb_f32 = None
        else:
            self.d_emb_int8 = None
            self.d_emb_scale = None
            self.d_emb_res8 = None
            self.d_emb_res_scale = None
            if self.exact_rescore and emb_host.dtype == np.float32:
                # Hybrid residency: the top-k kernel streams a bf16 bank
                # (half the E-read bytes, the throughput floor at large N)
                # and the exact f32 rows of only the merged candidates are
                # rescored.  Selection speed of bf16, ranking of f32.
                self.d_emb = put(jnp.asarray(emb_host).astype(jnp.bfloat16))
                self.d_emb_f32 = put(jnp.asarray(emb_host))
            else:
                self.exact_rescore = 0  # needs an f32 source to rescore
                self.d_emb_f32 = None
                self.d_emb = put(jnp.asarray(emb_host))

    # ------------------------------------------------------------------
    # Device step construction
    # ------------------------------------------------------------------
    def _bank(self) -> Dict:
        """The device-array bank, passed as a jit ARGUMENT to every step.

        Closing over these arrays instead would embed them as constants in
        the lowered HLO — harmless on a local runtime, fatal here: this
        environment compiles via an HTTP relay and a 768 MB constant blows
        the request limit (HTTP 413) or times it out.  As arguments they
        lower to parameters; identical arrays on every call hit the same
        jit cache entry."""
        bank = {
            "type_ids": self.d_type_ids,
            "bits": self.d_bits,
            "counts": self.d_counts,
            "graph_ids": self.d_graph_ids,
        }
        if self.d_emb is not None:
            bank["emb"] = self.d_emb
        if getattr(self, "d_emb_f32", None) is not None:
            bank["emb_f32"] = self.d_emb_f32
        if self.quantize_int8:
            bank["emb_int8"] = self.d_emb_int8
            bank["emb_scale"] = self.d_emb_scale
        if getattr(self, "d_emb_res8", None) is not None:
            bank["emb_res8"] = self.d_emb_res8
            bank["emb_res_scale"] = self.d_emb_res_scale
        if self.d_neighbors is not None:
            bank["neighbors"] = self.d_neighbors
            bank["neighbors_hop2"] = self.d_neighbors_hop2
            bank["g_type_ids"] = self.d_g_type_ids
            bank["g_row"] = self.d_g_row
        return bank

    def _gather_emb_rows(self, indices, bank):
        """Gather embedding rows at arbitrary indices ([..., D]).  Overridden
        by the sharded engine: a gather from a row-sharded table needs an
        explicit replicated out-sharding (XLA inserts the collective).  In
        int8-only mode, gathered rows dequantize on the fly (+ the residual
        level when `int8_residual` — relative error ~3e-5)."""
        if "emb" not in bank:
            rows = (
                bank["emb_int8"][indices].astype(jnp.float32)
                * bank["emb_scale"][indices][..., None]
            )
            if "emb_res8" in bank:
                rows = rows + (
                    bank["emb_res8"][indices].astype(jnp.float32)
                    * bank["emb_res_scale"][indices][..., None]
                )
            return rows
        return bank["emb"][indices]

    def _local_select(self, q_emb, bank, type_mask, top_k: int, fetch_k: int):
        """The configured selection kernel over ONE contiguous row block.

        Returns (values [B, m], LOCAL row indices [B, m]) with
        m = max(top_k, fetch_k) oversampled candidates (surplus slots are
        (NEG_INF, -1) fillers); no rescoring is applied here.  Because the
        indices are local to the given bank block, the same method runs
        unchanged inside `shard_map` on a row shard — this is how the
        sharded engine reuses the Pallas/int8/streaming kernels
        (parallel/sharded_ops.sharded_top_k).
        """
        m = max(top_k, fetch_k)
        merge_k = m if m > top_k else 0
        interp = self._pallas_interpret
        emb = bank.get("emb")

        if self.use_pallas:
            from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k

            pad = emb.shape[0] - type_mask.shape[0]
            if pad:
                type_mask = jnp.concatenate(
                    [type_mask, jnp.zeros((pad,), dtype=bool)]
                )
            # VMEM budget: q block + score block + double-buffered E tile +
            # double-buffered candidate blocks must fit ~11 MB of the 16 MB
            # scoped limit.  Shrink the tile for wide dtypes; past B=1024
            # split the query batch with lax.map (fixed per-query buffers
            # alone outgrow VMEM).
            b = q_emb.shape[0]
            ebytes = emb.dtype.itemsize
            d = emb.shape[1]
            # Packed two-level selection whenever an exact-rescore stage
            # follows: the streamed per-lane top-T reduction removes the
            # k full-width selection passes (the dominant selection cost),
            # and the candidates' 2^-11 packed score rounding is nullified
            # by the f32 rescore.  Without a rescore stage the exact kernel
            # keeps bit-exact scores/ties (the parity contract).  Packed
            # lanes are 11 bits, so the packed path caps the tile at 2048;
            # it also carries a second [sub_b, tile] int32 buffer (the
            # packed copy), so large batches split at 512 queries to keep
            # the 2048 tile rather than shrinking it — re-confirmed in
            # round 3: 2x512 blocks at tile 2048 beat one 1024 block at
            # tile 1024 (19.5 vs 23.0 ms; the kernel is compute-bound, so
            # re-reading the bank is cheaper than per-tile fixed work —
            # results.json:b1024_block_split_ablation_ms).
            packed = self.exact_rescore > 0
            sub_b = min(b, 512 if packed else 1024)
            # Large-k packed selection: the k-unrolled pick loop's Mosaic
            # stack grows with b*k and blows the scoped-VMEM limit at
            # k=100/b=512 inside the fused step (57.4 MB > 16 MB compile
            # error, round 4) — halve the query block instead; at k>=50
            # selection dominates the extra bank read.
            if packed and top_k > 48:
                sub_b = min(sub_b, 256)

            def footprint(t):
                # The packed TWO-LEVEL path no longer materializes the
                # full-width packed int32 copy (round-5 fused encode —
                # `_fused_two_level_select`); only the f32 score block and
                # tiny [sub_b, 128] reduction planes live beside it.
                return (
                    4 * sub_b * d          # q block
                    + 4 * sub_b * t        # score block
                    + 2 * t * d * ebytes   # double-buffered E tile
                    + 16 * sub_b * 128     # double-buffered val/idx blocks
                )

            tile = self.pallas_tile_n
            if packed:
                tile = min(tile, 2048)
            # Budget against the 16 MB scoped-VMEM limit.  The packed
            # branch gets a higher allowance: its estimate counts the packed
            # int32 copy explicitly (13.4 MB at sub_b=512/tile=2048/bf16 —
            # measured to fit), while the non-packed f32-HIGHEST path needs
            # headroom for Mosaic's 3-pass decomposition temps the formula
            # can't see.
            budget = (14 << 20) if packed else (11 << 20)
            while tile > 512 and footprint(tile) > budget:
                tile //= 2

            # Two-level tile reduction is approximate (> lane_depth
            # per-lane collisions drop a candidate); enable it exactly when
            # an exact f32 rescore follows (`packed` <=> exact_rescore > 0
            # — the rescore runs whenever configured, including top_k >=
            # the oversample where merge_k stays 0).
            two_level = packed
            spt = self._super_request(tile, sub_b) if packed else 1
            if spt > 1:
                # Supertiles amortize the per-tile costs, so small subtiles
                # are free — and the [sub_b, tile] score + packed buffers
                # (8 bytes/elem) plus the accumulator scratch must fit
                # beside the E tile under the 16 MB scoped-VMEM limit
                # (tile 2048 + supertile extras measured 16.44 MB: OOM).
                tile = min(tile, 1024)
                spt = self._super_request(tile, sub_b)
            lane_t = self.select_lane_t if packed else 0
            if b <= sub_b:
                return pallas_cosine_top_k(
                    q_emb, emb, type_mask, top_k, tile_n=tile,
                    merge_k=merge_k, packed_select=packed, interpret=interp,
                    two_level=two_level, super_tiles=spt, lane_t=lane_t,
                )
            pad_b = (-b) % sub_b
            q_padded = (
                jnp.pad(q_emb, ((0, pad_b), (0, 0))) if pad_b else q_emb
            )
            q_chunks = q_padded.reshape(-1, sub_b, q_emb.shape[1])
            v, i = jax.lax.map(
                lambda qc: pallas_cosine_top_k(
                    qc, emb, type_mask, top_k, tile_n=tile,
                    merge_k=merge_k, packed_select=packed, interpret=interp,
                    two_level=two_level, super_tiles=spt, lane_t=lane_t,
                ),
                q_chunks,
            )
            k_eff = v.shape[-1]
            return v.reshape(-1, k_eff)[:b], i.reshape(-1, k_eff)[:b]

        if self.quantize_int8:
            from hcrag_tpu.ops.quantize import (
                quantize_queries,
                quantized_scores,
                streaming_quantized_top_k,
            )

            if self._int8_pallas:
                from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k_int8

                e8 = bank["emb_int8"]
                pad = e8.shape[0] - type_mask.shape[0]
                if pad:
                    type_mask = jnp.concatenate(
                        [type_mask, jnp.zeros((pad,), dtype=bool)]
                    )
                b = q_emb.shape[0]
                # Smaller sub-batches keep the tile at 2048 (fewer grid
                # steps beats a bigger query block: int32 + f32 score
                # buffers cost 8 bytes/element).
                sub_b = min(b, 512)
                d = e8.shape[1]
                # Packed selection encodes the lane in 11 bits — tiles wider
                # than 2048 silently corrupt the top-k, so clamp here (the
                # loop below only ever shrinks the tile further).  The
                # two-level path runs the round-5 fused rescale+encode
                # select: neither the f32 rescale copy nor the packed int32
                # copy materializes, so the per-element need is 4 bytes
                # (int32 scores) — tile 2048 fits where the k-pass path
                # needs 8 bytes/element and drops to 1024.
                tl = self.int8_rescore > 0
                sbytes = 4 if tl else 8
                tile = min(self.pallas_tile_n, 2048)
                while tile > 512 and (
                    sbytes * sub_b * tile + sub_b * d + 2 * tile * d
                    + 16 * sub_b * 128
                ) > (10 << 20):
                    tile //= 2
                # Oversample at the merge, not in the kernel: per-tile
                # selection stays at top_k passes (linear in k), the
                # cross-tile merge keeps fetch_k of the per-tile candidates.
                # Measured at 1M: in-kernel m=32 cost 3.9x throughput; the
                # merge-level variant is ~free.
                # Two-level reduction only when an exact rescore follows
                # (int8_rescore > 0 — the rescore also runs when top_k >=
                # the oversample, where merge_k stays 0): without one, a
                # > lane_depth per-lane collision would silently drop a
                # true top-k row, so int8-only mode keeps the exhaustive
                # k-pass packed loop (quantization noise only).
                two_level = tl
                spt = self._super_request(tile, sub_b) if two_level else 1
                lane_t = self.select_lane_t if two_level else 0
                if b <= sub_b:
                    return pallas_cosine_top_k_int8(
                        q_emb, e8, bank["emb_scale"], type_mask, top_k,
                        tile_n=tile, packed_select=True, merge_k=merge_k,
                        interpret=interp, two_level=two_level,
                        super_tiles=spt, lane_t=lane_t,
                    )
                pad_b = (-b) % sub_b
                q_padded = (
                    jnp.pad(q_emb, ((0, pad_b), (0, 0))) if pad_b else q_emb
                )
                q_chunks = q_padded.reshape(-1, sub_b, q_emb.shape[1])
                v, i = jax.lax.map(
                    lambda qc: pallas_cosine_top_k_int8(
                        qc, e8, bank["emb_scale"], type_mask, top_k,
                        tile_n=tile, packed_select=True, merge_k=merge_k,
                        interpret=interp, two_level=two_level,
                        super_tiles=spt, lane_t=lane_t,
                    ),
                    q_chunks,
                )
                k_eff = v.shape[-1]
                return v.reshape(-1, k_eff)[:b], i.reshape(-1, k_eff)[:b]

            if bank["emb_int8"].shape[0] > (1 << 18):
                return streaming_quantized_top_k(
                    q_emb, bank["emb_int8"], bank["emb_scale"], type_mask, m,
                )
            qi, qs = quantize_queries(q_emb.astype(jnp.float32))
            scores = quantized_scores(
                qi, qs, bank["emb_int8"], bank["emb_scale"]
            )
            return masked_top_k(scores, type_mask, m)

        n = emb.shape[0]
        if n > (1 << 18):
            # Large index: stream row chunks (constant compile size, no
            # [B, N] score buffer).
            return streaming_masked_top_k(q_emb, emb, type_mask, m)
        scores = jnp.dot(
            q_emb.astype(emb.dtype),
            emb.T,
            preferred_element_type=jnp.float32,
        )  # [B, N] cosine
        return masked_top_k(scores, type_mask, m)

    def _rescore_m(self) -> int:
        """Oversample count for the exact-rescore refinement (0 = off)."""
        return self.int8_rescore if self.quantize_int8 else self.exact_rescore

    def resolved_kernel_config(self, batch: int, top_k: int = 10) -> Dict:
        """The ACTUAL kernel strategy a `query_batch` of this shape runs —
        for bench headers and results attribution (round-4 VERDICT #9: a
        number whose kernel path isn't recorded can't be trusted later).
        Mirrors the `_step`/`_local_select` decision rules; pinned against
        them by tests/unit/test_topk_lowerings.py."""
        m = self._rescore_m()
        merge_k = m if m > top_k else 0
        out: Dict = {
            "quantize_int8": self.quantize_int8,
            "int8_only": self.int8_only,
            "int8_residual": self.int8_residual,
            "rescore_oversample": m,
            "merge_k": merge_k,
        }
        from hcrag_tpu.ops.topk_pallas import _resolve_super_tiles

        n_rows = int(np.asarray(self.index.emb).shape[0])
        from hcrag_tpu.ops.topk_pallas import _lane_depth

        if self.quantize_int8 and self._int8_pallas:
            sub_b = min(batch, 512)
            d = self.index.dim
            tl = self.int8_rescore > 0
            sbytes = 4 if tl else 8  # fused two-level: int32 scores only
            tile = min(self.pallas_tile_n, 2048)
            while tile > 512 and (
                sbytes * sub_b * tile + sub_b * d + 2 * tile * d
                + 16 * sub_b * 128
            ) > (10 << 20):
                tile //= 2
            spt = _resolve_super_tiles(
                self._super_request(tile, sub_b) if tl else 1,
                tile, -(-n_rows // tile), tl, True,
            )
            out.update(
                kernel="pallas_int8", packed_select=True,
                two_level=self.int8_rescore > 0, tile_n=tile, sub_batch=sub_b,
                super_tiles=spt,
                lane_t=(
                    (self.select_lane_t or _lane_depth(min(top_k, n_rows)))
                    if tl else 0
                ),
                select_bank="int8",
                rescore_bank=(
                    "int8_residual" if self.int8_residual
                    else "" if self.int8_only
                    else "f32" if self.int8_f32_rescore else "bf16"
                ),
            )
        elif self.use_pallas:
            packed = self.exact_rescore > 0
            sub_b = min(batch, 512 if packed else 1024)
            if packed and top_k > 48:
                sub_b = min(sub_b, 256)  # mirrors _step's Mosaic-stack guard
            d = self.index.dim
            # DEVICE bank dtype (exact_rescore drops the kernel bank to
            # bf16) — the footprint/tile resolution and the select_bank
            # label must describe what actually runs, not the host array.
            ebytes = np.dtype(self.d_emb.dtype).itemsize
            tile = self.pallas_tile_n
            if packed:
                tile = min(tile, 2048)
            budget = (14 << 20) if packed else (11 << 20)

            def footprint(t):
                # Mirrors _local_select: the fused two-level encode dropped
                # the packed int32 copy term (round 5).
                return (
                    4 * sub_b * d + 4 * sub_b * t
                    + 2 * t * d * ebytes + 16 * sub_b * 128
                )

            while tile > 512 and footprint(tile) > budget:
                tile //= 2
            spt = 1
            if packed:
                spt = self._super_request(tile, sub_b)
                if spt > 1:
                    tile = min(tile, 1024)  # mirrors _local_select
                    spt = self._super_request(tile, sub_b)
            spt = _resolve_super_tiles(
                spt, tile, -(-n_rows // tile), packed, packed,
            )
            out.update(
                kernel="pallas_float", packed_select=packed,
                two_level=packed, tile_n=tile, sub_batch=sub_b,
                super_tiles=spt,
                lane_t=(
                    (self.select_lane_t or _lane_depth(min(top_k, n_rows)))
                    if packed else 0
                ),
                select_bank=str(self.d_emb.dtype),
                rescore_bank="f32" if self.exact_rescore else "",
            )
        else:
            out.update(
                kernel=(
                    "xla_streaming_int8" if self.quantize_int8
                    else "xla_streaming"
                ),
                packed_select=False, two_level=False,
                select_bank=(
                    "int8" if self.quantize_int8
                    else str(np.asarray(self.index.emb).dtype)
                ),
                rescore_bank="f32" if m else "",
            )
        return out

    def _gather_graph(self, table, idx):
        """Gather rows of a graph-side table (neighbor ELL / per-node
        features) at batched indices.  The sharded-graph engine overrides
        this with an explicit replicated out-sharding gather so the ELL
        tables can live row-sharded (SURVEY §7.4: ragged expansion at 10M
        nodes without full replication)."""
        return table[idx]

    def _expand_impl(self, bank, seeds, depth: int, max_expanded: int):
        """Batched k-hop expansion over the ELL bank with batch-level early
        exit (deep-hop gathers + the wide dedup only execute while some
        query is short of the cap — `ops/expand.expand_batch_early_exit`).
        Overridden by the sharded-graph engine with hop gathers hoisted out
        of the per-query vmap (cross-shard gathers need batched index
        arrays)."""
        from hcrag_tpu.ops.expand import expand_batch_early_exit

        return expand_batch_early_exit(
            bank["neighbors"],
            seeds,
            depth=depth,
            max_nodes=max_expanded,
            hop2_neighbors=bank["neighbors_hop2"],
        )

    def _topk_impl(self, q_emb, type_mask, top_k: int, bank):
        """Dense cosine + masked top-k (single-device path).  The sharded
        engine overrides this with a shard_map'd local-select + ICI merge.

        With `use_pallas=True` the Pallas fused kernel streams index tiles
        through VMEM and never materializes the [B, N] score matrix."""
        m = self._rescore_m()
        fetch_k = max(top_k, m) if m else top_k
        v, i = self._local_select(q_emb, bank, type_mask, top_k, fetch_k)
        if not m:
            return v, i
        if self.quantize_int8 and "emb_f32" not in bank:
            rows_fn = lambda ix: self._gather_emb_rows(ix, bank)  # noqa: E731
        else:
            # float path, or int8_f32_rescore: exact f32 candidate rows
            rows_fn = lambda ix: bank["emb_f32"][ix]  # noqa: E731
        return exact_rescore(q_emb, v, i, rows_fn, top_k)

    def _build_step(self, top_k: int, depth: int, max_expanded: int, reduction: int):
        has_graph = self.d_neighbors is not None

        from hcrag_tpu.core.types import PRIORITY_MATRIX

        priority = jnp.asarray(PRIORITY_MATRIX)

        def _metrics_reduce(sem, llm, ent, typ, weights, intent_ids, tids):
            metrics = jnp.stack([sem, llm, ent, typ], axis=-1)
            if reduction == REDUCE_MAX:
                return jnp.max(metrics, axis=-1)
            if weights.ndim == 3:
                # Dynamic per-(intent, node-type) weights [4, I, T] — the v0
                # scorer design's get_weight dispatch as one fused gather +
                # normalized reduction (relevance_scorer_design.py:104-111,
                # 546-580).  ndim is static at trace time, so the two weight
                # layouts compile to distinct cached steps.
                from hcrag_tpu.ops.scoring import combine_metrics_dynamic

                return combine_metrics_dynamic(
                    metrics, weights, intent_ids[:, None], tids
                )
            return jnp.einsum("...m,m->...", metrics, weights)

        topk_impl = self._topk_impl
        gather_emb = self._gather_emb_rows
        gather_graph = self._gather_graph
        expand_impl = self._expand_impl

        def step(q_emb, q_bits, q_oov, intent_ids, weights, type_mask,
                 llm_topk, bank):
            # q_emb [B, D] (L2-normalized on host), q_bits [B, W], q_oov [B],
            # intent_ids [B], weights [4], type_mask [N] bool (all-True when
            # unfiltered), llm_topk [B, k] host LLM-judge column (zeros if
            # absent), bank = the device-array index/graph tables (see
            # `_bank` for why these are arguments, not closures).
            type_ids = bank["type_ids"]
            bits = bank["bits"]
            counts = bank["counts"]
            graph_ids = bank["graph_ids"]
            top_v, top_i = topk_impl(q_emb, type_mask, top_k, bank)

            # --- relevance metrics on retrieved rows --------------------
            sem = (top_v + 1.0) * 0.5
            row_bits = bits[top_i]  # [B, k, W]
            row_counts = counts[top_i]
            q_count = popcount_words(q_bits) + q_oov  # [B]
            inter = popcount_words(q_bits[:, None, :] & row_bits)  # [B, k]
            ratio = inter.astype(jnp.float32) / jnp.maximum(
                q_count[:, None].astype(jnp.float32), 1.0
            )
            ent = jnp.where(
                (q_count == 0)[:, None],
                jnp.where(row_counts == 0, 0.5, 0.1),
                ratio,
            )
            row_tids = type_ids[top_i]
            typ = priority[intent_ids[:, None], row_tids]
            rel = _metrics_reduce(
                sem, llm_topk, ent, typ, weights, intent_ids, row_tids
            )
            combined = (
                cfg.COMBINED_RELEVANCE_WEIGHT * rel
                + cfg.COMBINED_SIMILARITY_WEIGHT * top_v
            )

            if not has_graph:
                z = jnp.zeros((q_emb.shape[0], max_expanded))
                return (
                    top_v, top_i, rel, combined,
                    jnp.full((q_emb.shape[0], max_expanded), -1, jnp.int32),
                    jnp.zeros((q_emb.shape[0],), jnp.int32),
                    z,
                )

            # --- expansion -----------------------------------------------
            seeds = jnp.where(top_v >= -1.0, graph_ids[top_i], -1)  # [B, k]
            expanded, exp_count = expand_impl(
                bank, seeds, depth, max_expanded
            )

            # --- expanded-node scoring -----------------------------------
            valid = expanded >= 0
            safe_nodes = jnp.where(valid, expanded, 0)
            rows = gather_graph(bank["g_row"], safe_nodes)  # [B, E]; -1 = none
            has_row = rows >= 0
            safe_rows = jnp.where(has_row, rows, 0)
            e_emb = (
                gather_emb(safe_rows, bank).astype(jnp.float32)
                * has_row[..., None]
            )
            sem_e = (
                jnp.einsum("bd,bed->be", q_emb.astype(jnp.float32), e_emb) + 1.0
            ) * 0.5
            e_bits = bits[safe_rows] * has_row[..., None].astype(jnp.uint32)
            e_counts = jnp.where(has_row, counts[safe_rows], 0)
            inter_e = popcount_words(q_bits[:, None, :] & e_bits)
            ratio_e = inter_e.astype(jnp.float32) / jnp.maximum(
                q_count[:, None].astype(jnp.float32), 1.0
            )
            ent_e = jnp.where(
                (q_count == 0)[:, None],
                jnp.where(e_counts == 0, 0.5, 0.1),
                ratio_e,
            )
            e_tids = gather_graph(bank["g_type_ids"], safe_nodes)
            typ_e = priority[intent_ids[:, None], e_tids]
            rel_e = _metrics_reduce(
                sem_e, jnp.zeros_like(sem_e), ent_e, typ_e, weights,
                intent_ids, e_tids,
            )
            rel_e = jnp.where(valid, rel_e, 0.0)
            return top_v, top_i, rel, combined, expanded, exp_count, rel_e

        return jax.jit(step)

    def _retrieve_step(self, top_k: int):
        """Cached retrieval-ONLY jitted step: top-k selection (+ the
        configured exact rescore), no relevance metrics, no expansion.  The
        serving fast path — `BatchedExecutor(mode="retrieval")` dispatches
        this so requests never pay for device work their futures discard."""
        key = ("retrieve", top_k)
        if key not in self._step_cache:
            topk_impl = self._topk_impl

            def step(q_emb, type_mask, bank):
                return topk_impl(q_emb, type_mask, top_k, bank)

            self._step_cache[key] = jax.jit(step)
        return self._step_cache[key]

    def retrieve_batch_device(
        self,
        query_embs,
        *,
        top_k: int = cfg.DEFAULT_TOP_K,
        category_filter: Optional[str] = None,
    ):
        """Async retrieval-only dispatch returning DEVICE (scores [B, k],
        indices [B, k]) — the cheap serving step (no scoring/expansion)."""
        if isinstance(query_embs, jnp.ndarray) and query_embs.ndim == 2:
            q = query_embs
        else:
            qh = np.asarray(query_embs, dtype=np.float32)
            if qh.ndim == 1:
                qh = qh[None, :]
            qh = qh / np.maximum(
                np.linalg.norm(qh, axis=1, keepdims=True), 1e-12
            )
            q = jnp.asarray(qh)
        if category_filter:
            type_mask = jnp.asarray(self.index.type_mask(category_filter))
        else:
            type_mask = self._true_mask()
        step = self._retrieve_step(top_k)
        put = self._put_query_input
        return step(put(q), put(type_mask), self._bank())

    def _step(self, top_k: int, depth: int, max_expanded: int, reduction: int):
        key = (top_k, depth, max_expanded, reduction)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(*key)
        return self._step_cache[key]

    # ------------------------------------------------------------------
    # Batched device-level API
    # ------------------------------------------------------------------
    def query_batch_device(
        self,
        query_embs,
        *,
        top_k: int = cfg.DEFAULT_TOP_K,
        intents: Optional[Sequence[QueryIntent]] = None,
        entity_lists: Optional[Sequence[Sequence[str]]] = None,
        scorer_type: ScorerType = ScorerType.COMPOSITE,
        weights: Optional[CompositeWeights] = None,
        expansion_depth: int = cfg.EXPANSION_DEPTH,
        max_expanded: int = cfg.MAX_CONNECTED_NODES,
        category_filter: Optional[str] = None,
        llm_scores: Optional[np.ndarray] = None,
        dynamic_weight_tensor: Optional[np.ndarray] = None,
    ) -> Tuple:
        """Async variant: dispatches the fused step and returns DEVICE arrays
        without blocking — the serving path, letting callers pipeline batches
        and amortize host<->device latency.

        `dynamic_weight_tensor` ([4, NUM_INTENTS, NUM_NODE_TYPES]) switches
        the fused reduction to per-(intent, node-type) weights with v0-style
        normalization (relevance_scorer_design.py:104-111,546-580) — see
        `ops/scoring.combine_metrics_dynamic` and
        `pipeline/scorer_designs.canonical_dynamic_weight_tensor`."""
        if isinstance(query_embs, jnp.ndarray) and query_embs.ndim == 2:
            q = query_embs  # already device-resident + normalized by caller
            b = q.shape[0]
        else:
            qh = np.asarray(query_embs, dtype=np.float32)
            if qh.ndim == 1:
                qh = qh[None, :]
            qh = qh / np.maximum(
                np.linalg.norm(qh, axis=1, keepdims=True), 1e-12
            )
            b = qh.shape[0]
            q = jnp.asarray(qh)

        if intents is None:
            intent_ids = self._zeros_i32(b)
        else:
            intent_ids = jnp.asarray(
                np.array([i.index for i in intents], dtype=np.int32)
            )

        vocab = self.index.vocab
        if entity_lists is None:
            q_bits = self._zeros_bits(b)
            q_oov = self._zeros_i32(b)
        else:
            qb = np.zeros((b, vocab.num_words), dtype=np.uint32)
            qo = np.zeros(b, dtype=np.int32)
            for i, ents in enumerate(entity_lists):
                qb[i], qo[i] = vocab.encode(ents)
            q_bits, q_oov = jnp.asarray(qb), jnp.asarray(qo)

        if category_filter:
            type_mask = jnp.asarray(self.index.type_mask(category_filter))
        else:
            type_mask = self._true_mask()

        w, reduction = scorer_spec(scorer_type, weights)
        if dynamic_weight_tensor is not None:
            from hcrag_tpu.core.types import NUM_INTENTS, NUM_NODE_TYPES

            w = np.asarray(dynamic_weight_tensor, dtype=np.float32)
            if w.shape != (4, NUM_INTENTS, NUM_NODE_TYPES):
                raise ValueError(
                    "dynamic_weight_tensor must be [4 metrics, "
                    f"{NUM_INTENTS} intents, {NUM_NODE_TYPES} node types], "
                    f"got {w.shape}"
                )
            reduction = REDUCE_WEIGHTED_SUM
        if llm_scores is None:
            llm_topk = self._zeros_f32(b, top_k)
        else:
            llm_topk = jnp.asarray(np.asarray(llm_scores, dtype=np.float32))

        step = self._step(top_k, expansion_depth, max_expanded, reduction)
        put = self._put_query_input
        return step(
            put(q), put(q_bits), put(q_oov), put(intent_ids),
            put(jnp.asarray(w)), put(type_mask), put(llm_topk), self._bank(),
        )

    def _put_query_input(self, x):
        """Placement hook for per-query inputs; the sharded engine replicates
        them on its mesh so committed-device mixing never trips jit."""
        return x

    # Cached device-side constant inputs (avoid re-uploading per call).
    def _true_mask(self):
        if not hasattr(self, "_d_true_mask"):
            # Sized to the UNPADDED row count: the device bank may carry
            # zero-vector pad rows (Pallas tile alignment), and _topk_impl
            # masks out exactly the rows beyond the mask length.  An
            # all-ones mask over the padded bank would let pad rows win
            # with score 0.0 whenever the true top-k scores are negative.
            self._d_true_mask = jnp.ones((self._n_rows,), dtype=bool)
        return self._d_true_mask

    def _zeros_i32(self, b):
        cache = getattr(self, "_d_zero_i32", {})
        if b not in cache:
            cache[b] = jnp.zeros((b,), jnp.int32)
            self._d_zero_i32 = cache
        return cache[b]

    def _zeros_f32(self, b, k):
        cache = getattr(self, "_d_zero_f32", {})
        if (b, k) not in cache:
            cache[(b, k)] = jnp.zeros((b, k), jnp.float32)
            self._d_zero_f32 = cache
        return cache[(b, k)]

    def _zeros_bits(self, b):
        cache = getattr(self, "_d_zero_bits", {})
        w = self.index.vocab.num_words
        if (b, w) not in cache:
            cache[(b, w)] = jnp.zeros((b, w), jnp.uint32)
            self._d_zero_bits = cache
        return cache[(b, w)]

    def query_batch(
        self, query_embs, *, rerank: bool = False, **kwargs
    ) -> QueryBatchResult:
        """Blocking wrapper over `query_batch_device` returning host arrays.

        `rerank=True` applies the engine's learned re-ranker (set via
        `set_reranker`) as a final host-side stage over the k candidates.

        Retries once on transient runtime unavailability (this environment's
        remote-compile RPC can drop mid-compile; a retry re-enters the
        compile, usually against a healthier connection — NOTES.md)."""
        import time as _time

        attempts = 0
        while True:
            try:
                out = self.query_batch_device(query_embs, **kwargs)
                break
            except Exception as e:  # jax.errors.JaxRuntimeError
                msg = str(e)
                transient = any(
                    s in msg
                    for s in ("UNAVAILABLE", "transport", "remote_compile",
                              "Broken pipe", "HTTP 5")
                )
                attempts += 1
                if not transient or attempts > 3:
                    raise
                _time.sleep(5 * attempts)
        names = (
            "top_scores", "top_indices", "relevance", "combined",
            "expanded_nodes", "expanded_counts", "expanded_relevance",
        )
        res = QueryBatchResult(
            **{n: np.asarray(v) for n, v in zip(names, out)}
        )
        if rerank:
            res = self.rerank_result(
                res,
                intents=kwargs.get("intents"),
                entity_lists=kwargs.get("entity_lists"),
            )
        return res

    # ------------------------------------------------------------------
    # Learned re-ranking (optional final stage; see models/reranker.py)
    # ------------------------------------------------------------------
    def set_reranker(self, reranker) -> None:
        """Attach a trained `models.reranker.Reranker` as the optional final
        ranking stage (`query_batch(..., rerank=True)`).  Beyond-reference
        capability: the reranker distills judge-AWARE combined ranking
        (0.7*composite(sem, judge, ent, typ) + 0.3*cos) into an MLP over the
        judge-free metrics, so ordering approximates the LLM-judge blend
        with zero query-time LLM calls."""
        self.reranker = reranker

    def rerank_result(
        self, res: QueryBatchResult, intents=None, entity_lists=None
    ) -> QueryBatchResult:
        """Reorder a result's top-k by the learned re-ranker's scores."""
        reranker = getattr(self, "reranker", None)
        if reranker is None:
            return res
        from hcrag_tpu.models.reranker import engine_candidate_features

        feats = engine_candidate_features(
            self, res, intents=intents, entity_lists=entity_lists
        )
        scores = reranker.score(feats)  # [B, k]
        # Invalid candidate slots (padded merges) must stay at the bottom.
        invalid = (res.top_indices < 0) | (res.top_scores <= -1e29)
        scores = np.where(invalid, -np.inf, scores)
        order = np.argsort(-scores, axis=1, kind="stable")
        take = lambda a: np.take_along_axis(a, order, axis=1)  # noqa: E731
        return dataclasses.replace(
            res,
            top_scores=take(res.top_scores),
            top_indices=take(res.top_indices),
            relevance=take(res.relevance),
            combined=take(res.combined),
            rerank_scores=take(scores),
        )

    # ------------------------------------------------------------------
    # Reference-shaped host API
    # ------------------------------------------------------------------
    def find_similar_content(
        self,
        query_embedding: np.ndarray,
        top_k: int = cfg.DEFAULT_TOP_K,
        similarity_threshold: float = cfg.DEFAULT_SIMILARITY_THRESHOLD,
    ) -> List[Dict]:
        """Reference-identical result dicts (main.py:831-857)."""
        res = self.query_batch(query_embedding, top_k=top_k)
        results = []
        for score, idx in zip(res.top_scores[0], res.top_indices[0]):
            if score >= similarity_threshold:
                results.append(
                    {
                        "content": self.index.texts[int(idx)],
                        "metadata": self.index.metadata[int(idx)],
                        "similarity_score": float(score),
                    }
                )
        return results

    def process_query(
        self,
        query: str,
        top_k: int = cfg.DEFAULT_TOP_K,
        similarity_threshold: float = cfg.DEFAULT_SIMILARITY_THRESHOLD,
        parser=None,
        with_confidence: Optional[bool] = None,
    ) -> Dict:
        """End-to-end single query (main.py:790-829): parse -> embed ->
        retrieve -> summarize.  `parser` optionally supplies the LLM query
        parser; without one the raw query is the search text (the reference's
        fallback, main.py:786-788).

        `with_confidence` adds an `encoder_confidence` entry — the
        calibrated probability that the (distilled, corpus-supervised)
        encoder serves this query with golden-space fidelity
        (models/confidence.py; the reference's true checkpoint at
        embedding_generator.py:18-21 is unavailable in this environment, so
        off-domain queries get an honest signal instead of silent
        best-effort).  Default: on for trainable-encoder engines with banks
        small enough for the host-side feature pass (<=100k rows)."""
        from hcrag_tpu.utils.timing import GLOBAL_TIMER as _timer

        parsed = {"search_text": query}
        if parser is not None:
            with _timer.span("process_query/parse"):
                try:
                    parsed = parser.parse_query(query)
                except Exception:
                    parsed = {"search_text": query}
        search_text = parsed.get("search_text", query)
        with _timer.span("process_query/embed"):
            query_embedding = np.asarray(
                self.embedder.encode([search_text])[0]
            )
        with _timer.span("process_query/retrieve"):
            results = self.find_similar_content(
                query_embedding,
                top_k=top_k,
                similarity_threshold=similarity_threshold,
            )
        avg = (
            float(np.mean([r["similarity_score"] for r in results]))
            if results
            else 0.0
        )
        out = {
            "parsed_query": parsed,
            "search_text": search_text,
            "results": results,
            "summary": (
                f"Found {len(results)} results with average similarity: {avg:.3f}"
            ),
            "query_embedding": query_embedding,
        }
        want_conf = with_confidence
        if want_conf is None:
            # auto: trainable encoder + bank small enough for the host pass
            want_conf = (
                hasattr(self.embedder, "load_params")
                and self.index.n <= 100_000
            )
        if want_conf:
            with _timer.span("process_query/confidence"):
                from hcrag_tpu.models.confidence import encoder_confidence

                bank = np.asarray(self.index.emb, np.float32)
                bank_norm = bank / np.maximum(
                    np.linalg.norm(bank, axis=1, keepdims=True), 1e-12
                )
                out["encoder_confidence"] = encoder_confidence(
                    self.embedder, bank_norm, search_text,
                    query_emb=query_embedding[None, :],
                )
        return out

    def search_by_category(
        self,
        query: str,
        category_filter: Optional[str] = None,
        top_k: int = cfg.DEFAULT_TOP_K,
    ) -> Dict:
        """Type-masked search (main.py:859-905): no threshold, ranked dicts."""
        if category_filter and not self.index.type_mask(category_filter).any():
            return {"results": [], "summary": "No items match the filter criteria"}
        q_emb = np.asarray(self.embedder.encode([query])[0])
        res = self.query_batch(q_emb, top_k=top_k, category_filter=category_filter)
        # Masked-out rows come back as NEG_INF=-1e30 (finite) from the Pallas
        # kernels, and packed-int8 pad slots carry idx -1 — filter on both,
        # plus actual mask membership, so only true matches are returned
        # (reference search_by_category returns matching rows only,
        # main.py:859-905). Ranks are numbered over the RETURNED list, not
        # the raw top-k slots, so they are contiguous like the reference's.
        mask = (
            np.asarray(self.index.type_mask(category_filter))
            if category_filter
            else None
        )
        results = []
        for score, idx in zip(res.top_scores[0], res.top_indices[0]):
            idx = int(idx)
            if idx < 0 or not np.isfinite(score) or score <= -1e29:
                continue
            if mask is not None and not mask[idx]:
                continue
            results.append(
                {
                    "rank": len(results) + 1,
                    "similarity_score": float(score),
                    "content": self.index.texts[idx],
                    "metadata": self.index.metadata[idx],
                }
            )
        return {
            "results": results,
            "summary": (
                f"Found {len(results)} results in "
                f"{category_filter or 'all categories'}"
            ),
        }

    def create_query_input(self, query: str):
        """QueryInput assembly with real embeddings + keyword intent/entities
        (graph_relevance_integration.py:129-147)."""
        from hcrag_tpu.core.types import QueryInput

        return QueryInput(
            text=query,
            embeddings=np.asarray(self.embedder.encode([query])[0]),
            entities=extract_entities_from_content(query),
            intent=infer_query_intent(query),
        )

    def refresh_index(self) -> None:
        """Re-upload the device bank after `DenseIndex.append` (or other
        host-side index mutation) and drop compiled steps (shapes changed)."""
        index = self.index
        self._n_rows = np.asarray(index.emb).shape[0]
        self._init_emb_banks(self._padded_host_emb(), None)
        self.d_type_ids = jnp.asarray(index.type_ids)
        self.d_bits = jnp.asarray(index.entity_bits)
        self.d_counts = jnp.asarray(index.entity_counts)
        self.d_graph_ids = jnp.asarray(index.graph_ids)
        self._step_cache.clear()
        for cache_attr in ("_d_true_mask", "_d_zero_i32", "_d_zero_f32",
                           "_d_zero_bits"):
            if hasattr(self, cache_attr):
                delattr(self, cache_attr)

    def get_content_statistics(self) -> Dict:
        return self.index.content_statistics()

    def suggest_queries(self, limit: int = 8) -> List[str]:
        """Content-derived query suggestions (query_interface.py:364-393):
        samples product names, categories and documents from the graph and
        templates natural-language starters."""
        suggestions: List[str] = []
        if self.graph is not None:
            products = [
                str(self.graph.node_texts[i]).split(" |")[0]
                for i, lbl in enumerate(self.graph.node_labels)
                if lbl == "Product"
            ]
            categories = [
                str(self.graph.node_texts[i])
                for i, lbl in enumerate(self.graph.node_labels)
                if lbl == "Category"
            ]
            documents = [
                str(self.graph.node_texts[i])
                for i, lbl in enumerate(self.graph.node_labels)
                if lbl == "Document"
            ]
            if products:
                suggestions.append(f"Find products similar to {products[0]}")
                if len(products) > 1:
                    suggestions.append(
                        f"Compare {products[0]} and {products[1]}"
                    )
            if categories:
                suggestions.append(f"Show me {categories[0]} products")
            if documents:
                suggestions.append(f"Show me the {documents[0]} document")
                suggestions.append(
                    f"What does the {documents[0]} documentation say?"
                )
        suggestions.extend(
            [
                "What products are under $500?",
                "Show me technical specifications",
                "What documents are available?",
            ]
        )
        return suggestions[:limit]

    # ------------------------------------------------------------------
    # On-device query encoding (optional)
    # ------------------------------------------------------------------
    def attach_device_encoder(self, minilm_embedder) -> None:
        """Attach a FlaxMiniLM embedder so text queries are encoded on the
        same chips as retrieval (`models/minilm.py`).  `process_query` and
        `search_by_category` then tokenize on host and run the encoder
        forward pass on device."""
        self.embedder = minilm_embedder

    # ------------------------------------------------------------------
    # Graph-enriched lookups (knowledge_graph.py:449-512)
    # ------------------------------------------------------------------
    def query_similar_products(self, product_id, limit: int = 5) -> List[Dict]:
        """1-hop related products for a product id, ordered by price
        (knowledge_graph.py:449-462)."""
        if self.graph is None:
            return []
        from hcrag_tpu.core.types import EDGE_TYPES

        g = self.graph
        try:
            node = next(
                i
                for i, (lbl, key) in enumerate(zip(g.node_labels, g.node_keys))
                if lbl == "Product" and str(key) == str(product_id)
            )
        except StopIteration:
            return []
        nbrs, types = g.neighbors_of(node)
        out = []
        for nb, t in zip(nbrs, types):
            if g.node_labels[int(nb)] != "Product":
                continue
            text = g.node_texts[int(nb)]
            price = 0.0
            if "Price: $" in text:
                try:
                    price = float(text.split("Price: $")[1].split(" |")[0])
                except ValueError:
                    pass
            out.append(
                {
                    "product_name": text.split(" |")[0],
                    "product_id": g.node_keys[int(nb)],
                    "relationship_type": EDGE_TYPES[int(t)],
                    "price": price,
                }
            )
        out.sort(key=lambda r: r["price"])
        return out[:limit]

    @staticmethod
    def _parse_product_node_text(text: str):
        """(name, price, category) from a product graph-node text
        ("Name | Category: X | Price: $Y | Color: Z", the layout
        `ingest/adventureworks._product_text` assembles) — the analogue of
        the reference's `p.name / p.list_price / p.category_name` Cypher
        projection (knowledge_graph.py:489-494)."""
        parts = text.split(" | ")
        name = parts[0]
        price = None
        category = None
        for part in parts[1:]:
            if part.startswith("Price: $"):
                try:
                    price = float(part[len("Price: $"):])
                except ValueError:
                    pass
            elif part.startswith("Category: "):
                category = part[len("Category: "):]
        return name, price, category

    def hybrid_search(self, search_term: str, limit: int = 5) -> List[Dict]:
        """Dense search + per-hit graph enrichment with SAME_CATEGORY
        neighbors (hybrid_search_example, knowledge_graph.py:464-512).

        Result dicts carry the reference's exact fields: name (product
        name), price, category, similarity_score, related_products (<= 3
        SAME_CATEGORY neighbor names), embedding_text (first 100 chars +
        "...") — knowledge_graph.py:500-507.  Rows without an entity id are
        skipped (the reference's `if entity_id:` gate); with a graph
        attached, rows whose product node is missing are skipped too (the
        reference's `if record:` gate).  Graphless engines degrade to
        entity-id names with null price/category."""
        from hcrag_tpu.core.types import edge_type_id

        q_emb = np.asarray(self.embedder.encode([search_term])[0])
        res = self.query_batch(q_emb, top_k=limit * 2)
        items: List[Dict] = []
        et_same_cat = edge_type_id("SAME_CATEGORY")
        for score, row in zip(res.top_scores[0], res.top_indices[0]):
            meta = self.index.metadata[int(row)]
            if not (
                meta.get("type") == "database_table"
                and meta.get("table_name") == "Product"
            ):
                continue
            entity_id = meta.get("entity_id")
            if not entity_id:
                continue
            name, price, category = str(entity_id), None, None
            related: List[str] = []
            if self.graph is not None:
                gid = int(self.index.graph_ids[int(row)])
                if gid < 0:
                    continue  # no graph record for this product
                name, price, category = self._parse_product_node_text(
                    self.graph.node_texts[gid]
                )
                nbrs, types = self.graph.neighbors_of(gid)
                for nb, t in zip(nbrs, types):
                    if int(t) == et_same_cat and len(related) < 3:
                        related.append(
                            self.graph.node_texts[int(nb)].split(" |")[0]
                        )
            items.append(
                {
                    "name": name,
                    "price": price,
                    "category": category,
                    "similarity_score": float(score),
                    "related_products": related,
                    "embedding_text": self.index.texts[int(row)][:100] + "...",
                }
            )
            if len(items) >= limit:
                break
        return items
