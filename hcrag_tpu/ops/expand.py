"""k-hop subgraph expansion over padded (ELL) adjacency — jit-compatible.

Device-side replacement for `SubgraphExpander` (subgraph_expander.py:44-190)
and the agent's per-node expansion Cypher (neo4j_rag_langgraph.py:476-537).
The reference walks Neo4j one node at a time over the whitelisted
relationships {ANNOTATION, DESCRIBED_BY}; here the whitelist is applied when
lowering the graph to ELL (`CsrGraph.to_ell`), and expansion is a fixed-depth
breadth-first sweep with static shapes:

  * frontier gathers are `take` over the [G, M] neighbor table,
  * ordered dedup uses a scatter-min first-occurrence trick (O(C + G), no
    sort), preserving the reference's append-in-discovery-order semantics,
  * the `max_connected_nodes` cap keeps the FIRST discovered nodes, matching
    the reference's "stop adding once the cap is hit" loop
    (subgraph_expander.py:172-183).

Returns fixed-size [max_nodes] id buffers padded with -1 plus a count, so the
whole thing nests inside a jitted query step and vmaps over query batches.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _ordered_unique_mask(candidates: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Boolean mask keeping the first occurrence of each valid (>= 0) id.

    candidates: [C] int32 with -1 padding.

    Two lowerings: for small C an O(C^2) pairwise comparison (pure VPU work,
    no giant buffers — candidate lists are seeds*degree sized); for large C
    a SORT-based dedup: stable-sort by id carrying the position, flag run
    starts (the stable sort keeps positions ascending within an id run, so
    the run start IS the first occurrence), and stable-sort back by
    position.  Two O(C log C) bitonic sorts replace the previous
    scatter-min over a [G+1] buffer — vmapped scatters over
    num_nodes-sized scratch serialize on TPU and dominated the
    expansion-heavy configs (synthetic_1M_top100_depth3: C = 58k over a 1M
    buffer per query).
    """
    c = candidates.shape[0]
    positions = jnp.arange(c, dtype=jnp.int32)
    if c <= 4096 or c * c <= num_nodes:
        eq_earlier = (candidates[None, :] == candidates[:, None]) & (
            positions[None, :] < positions[:, None]
        )
        seen_before = eq_earlier.any(axis=1)
        return (candidates >= 0) & ~seen_before
    safe_ids = jnp.where(candidates >= 0, candidates, num_nodes)
    s_ids, s_pos = jax.lax.sort((safe_ids, positions), num_keys=1, is_stable=True)
    run_start = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (s_ids[1:] != s_ids[:-1]).astype(jnp.int32)]
    )
    _, keep = jax.lax.sort((s_pos, run_start), num_keys=1, is_stable=True)
    return (candidates >= 0) & (keep == 1)


def dedup_and_cap(
    candidates: jnp.ndarray,
    num_nodes: int,
    max_nodes: int,
    seeds: Optional[jnp.ndarray] = None,
    exclude_seeds: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discovery-order dedup + cap over a candidate id list (the tail of
    `expand_k_hop`, reusable by the sharded-graph expansion path where the
    hop gathers are hoisted out of the per-query function).

    Returns (connected [max_nodes] int32 padded with -1, count scalar)."""
    keep = _ordered_unique_mask(candidates, num_nodes)
    if exclude_seeds and seeds is not None:
        seed_hit = (candidates[:, None] == seeds[None, :]).any(axis=1)
        keep = keep & ~seed_hit

    # Cap: keep the first `max_nodes` surviving candidates
    # (subgraph_expander.py:172-183 semantics).
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep = keep & (rank < max_nodes)
    count = jnp.sum(keep.astype(jnp.int32))

    out = jnp.full((max_nodes,), -1, dtype=jnp.int32)
    safe_rank = jnp.where(keep, rank, max_nodes)
    out = out.at[safe_rank.clip(0, max_nodes)].set(
        jnp.where(keep, candidates, -1).astype(jnp.int32), mode="drop"
    )
    return out, count


@functools.partial(
    jax.jit, static_argnames=("depth", "max_nodes", "exclude_seeds")
)
def expand_k_hop(
    neighbors: jnp.ndarray,
    seeds: jnp.ndarray,
    *,
    depth: int = 1,
    max_nodes: int = 20,
    exclude_seeds: bool = False,
    hop2_neighbors: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand a seed set over whitelisted adjacency.

    Args:
      neighbors: [G, M] int32 padded neighbor table (-1 = no edge), already
        filtered to the expansion whitelist.
      seeds: [S] int32 seed node ids, -1 padding.
      depth: number of hops (1 or 2 in the reference,
        subgraph_expander.py:45).
      max_nodes: cap on returned connected nodes
        (max_connected_nodes, subgraph_expander.py:46).
      exclude_seeds: drop seed ids from the result (the agent path keeps
        duplicates of scored nodes, so the default is False).
      hop2_neighbors: optional [G, M2] table used for the SECOND hop.  The
        reference's depth-2 path is Product -> Document -> ANNOTATION only
        (subgraph_expander.py:216-218) — pass an ANNOTATION-only table here
        to replicate it; None reuses `neighbors` (generic BFS).

    Returns:
      (connected [max_nodes] int32 padded with -1, count scalar int32).
      Order = discovery order: hop-1 neighbors of seed 0, of seed 1, ...,
      then hop-2, deduplicated keeping first occurrence.
    """
    g, m = neighbors.shape
    s = seeds.shape[0]

    def gather_frontier(table: jnp.ndarray, frontier: jnp.ndarray) -> jnp.ndarray:
        """[F] -> [F*M] neighbor candidates in frontier-major order."""
        safe = jnp.where(frontier >= 0, frontier, 0)
        nbrs = table[safe]  # [F, M]
        nbrs = jnp.where((frontier >= 0)[:, None], nbrs, -1)
        return nbrs.reshape(-1)

    # Hop 1 over the whitelist table; hops >= 2 over `hop2_neighbors` when
    # given (the reference's ANNOTATION-only second leg) else the same table.
    table2 = neighbors if hop2_neighbors is None else hop2_neighbors
    frontier = seeds
    hops = []
    for hop in range(depth):
        table = neighbors if hop == 0 else table2
        cand = gather_frontier(table, frontier)  # [F * M_table]
        hops.append(cand)
        if hop + 1 < depth:
            # The next frontier keeps within-hop duplicates: every copy of a
            # node expands to the same neighbors, the final discovery-order
            # dedup keeps only the FIRST occurrence of each discovered id,
            # and the frontier's static shape is unchanged either way — so
            # masking duplicates here was a semantic no-op that cost a full
            # dedup pass per intermediate hop (the dominant cost at depth 3,
            # where hop-2 candidate lists hit the large-C dedup path).
            frontier = cand
    candidates = hops[0] if len(hops) == 1 else jnp.concatenate(hops)
    return dedup_and_cap(
        candidates, g, max_nodes, seeds=seeds, exclude_seeds=exclude_seeds
    )


def expand_batch(
    neighbors: jnp.ndarray,
    seed_batch: jnp.ndarray,
    *,
    depth: int = 1,
    max_nodes: int = 20,
    exclude_seeds: bool = False,
    hop2_neighbors: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmapped expansion for a batch of seed sets ([B, S] -> [B, max_nodes])."""
    fn = functools.partial(
        expand_k_hop,
        depth=depth,
        max_nodes=max_nodes,
        hop2_neighbors=hop2_neighbors,
        exclude_seeds=exclude_seeds,
    )
    return jax.vmap(lambda s: fn(neighbors, s))(seed_batch)


def expand_batch_early_exit(
    neighbors: jnp.ndarray,
    seed_batch: jnp.ndarray,
    *,
    depth: int = 1,
    max_nodes: int = 20,
    hop2_neighbors: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched expansion with per-hop EARLY EXIT — same results as
    `expand_batch`, usually a fraction of the work.

    The `max_connected_nodes` cap keeps the FIRST `max_nodes` discovered
    nodes (subgraph_expander.py:172-183), and hop-h candidates strictly
    precede hop-(h+1) candidates in discovery order — so once EVERY query in
    the batch has `max_nodes` unique nodes among the hops computed so far,
    deeper hops cannot change any result.  A batch-level `lax.cond` (a true
    conditional under jit: hop gathers + deduped cands for deeper hops are
    only executed when some query still needs them) makes the common case
    (top-100 seeds x degree-8: hop 1 alone yields ~800 candidates >> 20)
    skip the deep-hop gathers AND the wide [B, 58k] dedup that dominated
    the depth-3 config (ops/expand benchmarks: dedup 27.8 ms of the 32.3 ms
    expansion at 1M/B=64).

    Adversarial batches (any query short of the cap) fall through to the
    exact full computation.
    """
    b = seed_batch.shape[0]
    g = neighbors.shape[0]
    table2 = neighbors if hop2_neighbors is None else hop2_neighbors

    def gather_hop(table, cand):
        safe = jnp.where(cand >= 0, cand, 0)
        nb = table[safe]  # [B, F, M] one batched gather
        nb = jnp.where((cand >= 0)[..., None], nb, -1)
        return nb.reshape(b, -1)

    dedup = jax.vmap(lambda c: dedup_and_cap(c, g, max_nodes))

    # Precompute nothing beyond hop 1; deeper hops live inside cond branches.
    hop1 = gather_hop(neighbors, seed_batch)

    def level(hop_idx, cands_so_far):
        """Dedup what we have; recurse into hop_idx+1 only if needed."""
        out, cnt = dedup(cands_so_far)
        if hop_idx + 1 >= depth:
            return out, cnt

        def go_deeper(_):
            nxt = gather_hop(table2, cands_so_far[:, -hop_sizes[hop_idx]:])
            return level(
                hop_idx + 1, jnp.concatenate([cands_so_far, nxt], axis=1)
            )

        return jax.lax.cond(
            jnp.all(cnt >= max_nodes), lambda _: (out, cnt), go_deeper, None
        )

    # Track each hop's candidate width so the next frontier is exactly the
    # LAST hop's candidates (not the accumulated list).
    hop_sizes = []
    f = seed_batch.shape[1]
    for h in range(depth):
        m = (neighbors if h == 0 else table2).shape[1]
        f = f * m
        hop_sizes.append(f)

    return level(0, hop1)


def expansion_edges_host(
    graph, seeds, *, whitelist=("ANNOTATION", "DESCRIBED_BY"), max_nodes: int = 20
):
    """Host-side edge enumeration for visualization (discovery-ordered
    (src, dst, edge_type) triples), mirroring `_create_relationship_edge`
    output (subgraph_expander.py:321-352).  Small-set helper, not a kernel."""
    from hcrag_tpu.core.types import edge_type_id

    allowed = {edge_type_id(w) for w in whitelist}
    edges = []
    seen = set()
    count = 0
    for seed in seeds:
        if seed < 0:
            continue
        nbrs, types = graph.neighbors_of(int(seed))
        for nb, t in zip(nbrs, types):
            if int(t) not in allowed:
                continue
            if int(nb) not in seen and count < max_nodes:
                seen.add(int(nb))
                count += 1
            if int(nb) in seen:
                edges.append((int(seed), int(nb), int(t)))
    return edges
