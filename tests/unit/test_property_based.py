"""Property-based tests: device kernels vs pure-Python oracles.

Hypothesis generates random graphs / entity sets / score matrices; the
static-shape device ops must match straightforward Python reference
implementations on every draw.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from hcrag_tpu.core.types import (
    PRIORITY_MATRIX,
    CompositeWeights,
    ScorerType,
    scorer_spec,
)
from hcrag_tpu.core.vocab import EntityVocab
from hcrag_tpu.ops.expand import expand_k_hop
from hcrag_tpu.ops.scoring import combine_metrics, entity_match_scores

SETTINGS = settings(max_examples=25, deadline=None)


def python_bfs_reference(neighbors, seeds, depth, max_nodes):
    """Discovery-ordered BFS oracle matching expand_k_hop's contract."""
    discovered = []
    seen = set()
    frontier = [s for s in seeds if s >= 0]
    for _ in range(depth):
        next_frontier = []
        for node in frontier:
            for nb in neighbors[node]:
                if nb < 0:
                    continue
                if nb not in seen:
                    seen.add(nb)
                    discovered.append(nb)
                    next_frontier.append(nb)
                else:
                    # revisits don't re-enter the frontier (dedup) but the
                    # kernel's frontier dedup is per-hop over candidates:
                    pass
        frontier = next_frontier
    return discovered[:max_nodes]


class TestExpansionProperties:
    @SETTINGS
    @given(
        st.integers(min_value=5, max_value=40),  # nodes
        st.integers(min_value=1, max_value=4),   # degree
        st.integers(min_value=1, max_value=2),   # depth
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_matches_python_bfs(self, g, deg, depth, seed):
        rng = np.random.default_rng(seed)
        neighbors = rng.integers(-1, g, size=(g, deg)).astype(np.int32)
        seeds = np.full(4, -1, np.int32)
        n_seeds = rng.integers(1, 4)
        seeds[:n_seeds] = rng.integers(0, g, size=n_seeds)
        max_nodes = int(rng.integers(1, 16))

        out, count = expand_k_hop(
            jnp.asarray(neighbors), jnp.asarray(seeds),
            depth=int(depth), max_nodes=max_nodes,
        )
        got = np.asarray(out)[: int(count)].tolist()
        expected = python_bfs_reference(
            neighbors, seeds.tolist(), int(depth), max_nodes
        )
        assert got == expected

    @SETTINGS
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def test_count_matches_padding(self, seed):
        rng = np.random.default_rng(seed)
        g = 20
        neighbors = rng.integers(-1, g, size=(g, 3)).astype(np.int32)
        seeds = jnp.asarray(rng.integers(0, g, size=3).astype(np.int32))
        out, count = expand_k_hop(jnp.asarray(neighbors), seeds,
                                  depth=1, max_nodes=10)
        out = np.asarray(out)
        c = int(count)
        assert (out[:c] >= 0).all()
        assert (out[c:] == -1).all()


class TestCapBoundary:
    """Pin the reference's cap semantics at the boundary
    (subgraph_expander.py:172-183, round-5 VERDICT next-7): the node cap
    stops ADDING nodes, but edges to already-kept nodes keep accumulating
    after the cap; edges toward never-kept nodes do not appear."""

    def _line_graph(self):
        """Star: node 0 -> {1..6} via ANNOTATION; node 7 -> 1 (already-kept
        target) and 7 -> 8 (never-kept target), all whitelisted."""
        from hcrag_tpu.core.graph import CsrGraph
        from hcrag_tpu.core.types import edge_type_id

        t = edge_type_id("ANNOTATION")
        src = np.array([0, 0, 0, 0, 0, 0, 7, 7], np.int64)
        dst = np.array([1, 2, 3, 4, 5, 6, 1, 8], np.int64)
        et = np.full(8, t, np.int8)
        return CsrGraph.from_edges(
            9, src, dst, et,
            node_labels=["Product"] * 9,
            node_keys=[str(i) for i in range(9)],
            node_texts=[f"n{i}" for i in range(9)],
            symmetrize=False,
        )

    def test_edges_still_added_after_node_cap(self):
        from hcrag_tpu.ops.expand import expansion_edges_host

        g = self._line_graph()
        edges = expansion_edges_host(g, [0, 7], max_nodes=3)
        kept_nodes = {dst for _, dst, _ in edges[:3]}
        # first 3 discovered nodes (1, 2, 3) are the kept set
        assert kept_nodes == {1, 2, 3}
        all_dsts = [dst for _, dst, _ in edges]
        # post-cap: the edge 7->1 (already-kept target) IS present...
        assert (7, 1) in {(s, d) for s, d, _ in edges}
        # ...but neither a node nor an edge for the never-kept target 8,
        # nor edges to the capped-out nodes 4/5/6
        assert 8 not in all_dsts
        assert not {4, 5, 6} & set(all_dsts)

    def test_exact_cap_count_and_discovery_order(self):
        from hcrag_tpu.ops.expand import expand_k_hop

        g = self._line_graph()
        ell = g.to_ell(max_degree=8)
        out, count = expand_k_hop(
            jnp.asarray(ell.neighbors), jnp.asarray([0, 7], np.int32),
            depth=1, max_nodes=3,
        )
        assert int(count) == 3
        # FIRST discovered win; node 0's neighbors precede node 7's
        assert np.asarray(out)[:3].tolist() == [1, 2, 3]

    def test_early_exit_equals_plain_at_boundary(self):
        """expand_batch_early_exit must equal expand_batch both when the
        cap binds after hop 1 (exit taken) and when it never binds
        (fall-through to full depth)."""
        from hcrag_tpu.ops.expand import expand_batch, expand_batch_early_exit

        rng = np.random.default_rng(11)
        gsize = 64
        neighbors = rng.integers(-1, gsize, size=(gsize, 4)).astype(np.int32)
        seeds = rng.integers(0, gsize, size=(5, 6)).astype(np.int32)
        for max_nodes in (2, 8, 64):
            a_out, a_cnt = expand_batch(
                jnp.asarray(neighbors), jnp.asarray(seeds),
                depth=2, max_nodes=max_nodes,
            )
            b_out, b_cnt = expand_batch_early_exit(
                jnp.asarray(neighbors), jnp.asarray(seeds),
                depth=2, max_nodes=max_nodes,
            )
            np.testing.assert_array_equal(np.asarray(a_out), np.asarray(b_out))
            np.testing.assert_array_equal(np.asarray(a_cnt), np.asarray(b_cnt))


class TestEntityMatchProperties:
    @SETTINGS
    @given(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), max_size=5).map(
                lambda cs: ["".join([c]) for c in cs]
            ),
            min_size=1, max_size=8,
        ),
        st.lists(st.sampled_from("abcdefghij"), max_size=6).map(
            lambda cs: ["".join([c]) for c in cs]
        ),
    )
    def test_matches_set_arithmetic(self, node_entity_lists, query_entities):
        vocab = EntityVocab.build(node_entity_lists)
        nb, _ = vocab.encode_batch(node_entity_lists)
        qb, oov = vocab.encode(query_entities)
        out = np.asarray(
            entity_match_scores(
                jnp.asarray(qb), jnp.asarray(nb), query_oov=np.int32(oov)
            )
        )
        qset = set(e.strip().lower() for e in query_entities if e.strip())
        for score, entities in zip(out, node_entity_lists):
            nset = set(e.strip().lower() for e in entities if e.strip())
            if not qset:
                expected = 0.5 if not nset else 0.1
            else:
                expected = len(qset & nset) / len(qset)
            assert score == pytest.approx(expected, abs=1e-6)


class TestScorerProperties:
    @SETTINGS
    @given(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_all_strategies_bounded_and_consistent(self, n, seed):
        rng = np.random.default_rng(seed)
        metrics = rng.uniform(0, 1, (n, 4)).astype(np.float32)
        for scorer in ScorerType:
            w, reduction = scorer_spec(scorer, None)
            out = np.asarray(
                combine_metrics(jnp.asarray(metrics), jnp.asarray(w), reduction)
            )
            assert out.shape == (n,)
            assert (out >= -1e-6).all() and (out <= 1 + 1e-6).all()
            # PARALLEL dominates every weighted average with weights summing
            # to <= 1 over the same metrics.
            if scorer == ScorerType.PARALLEL:
                par = out
        comp = np.asarray(
            combine_metrics(
                jnp.asarray(metrics),
                jnp.asarray(scorer_spec(ScorerType.COMPOSITE, None)[0]),
                0,
            )
        )
        assert (par >= comp - 1e-6).all()

    @SETTINGS
    @given(
        st.floats(min_value=0.0, max_value=1.0),
        st.floats(min_value=0.0, max_value=1.0),
        st.floats(min_value=0.0, max_value=1.0),
    )
    def test_weight_validation_total(self, a, b, c):
        d = 1.0 - (a + b + c)
        if d < 0 or d > 1:
            return
        # any non-negative 4-tuple summing to 1 must validate
        CompositeWeights(a, b, c, d)


class TestEarlyExitExpansion:
    """`expand_batch_early_exit` must equal the vmapped `expand_k_hop` on
    every input — the batch-level cond is a pure work-skip, never a result
    change (hop-h candidates precede hop-(h+1) in discovery order, so a
    query that filled its cap early is final)."""

    @SETTINGS
    @given(
        st.integers(min_value=6, max_value=40),   # nodes
        st.integers(min_value=1, max_value=4),    # degree
        st.integers(min_value=1, max_value=3),    # depth
        st.integers(min_value=1, max_value=12),   # max_nodes
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_matches_vmapped_reference(self, g, deg, depth, max_nodes, seed):
        from hcrag_tpu.ops.expand import expand_batch, expand_batch_early_exit

        rng = np.random.default_rng(seed)
        neighbors = rng.integers(-1, g, size=(g, deg)).astype(np.int32)
        seeds = rng.integers(-1, g, size=(3, 4)).astype(np.int32)
        ref_out, ref_cnt = expand_batch(
            jnp.asarray(neighbors), jnp.asarray(seeds),
            depth=int(depth), max_nodes=int(max_nodes),
        )
        got_out, got_cnt = expand_batch_early_exit(
            jnp.asarray(neighbors), jnp.asarray(seeds),
            depth=int(depth), max_nodes=int(max_nodes),
        )
        np.testing.assert_array_equal(np.asarray(got_out), np.asarray(ref_out))
        np.testing.assert_array_equal(np.asarray(got_cnt), np.asarray(ref_cnt))

    def test_cap_filled_early_and_short(self):
        from hcrag_tpu.ops.expand import expand_batch, expand_batch_early_exit

        # dense graph: every query fills the cap at hop 1 (early path);
        # chain graph: counts stay short (deep path) — both must agree.
        for nbrs, seeds, cap in (
            (np.tile(np.arange(8, dtype=np.int32), (8, 1)),
             np.array([[0, 1], [2, 3]], np.int32), 4),
            (np.array([[i + 1] if i < 7 else [-1] for i in range(8)], np.int32),
             np.array([[0, -1], [3, -1]], np.int32), 8),
        ):
            ref = expand_batch(
                jnp.asarray(nbrs), jnp.asarray(seeds), depth=3, max_nodes=cap)
            got = expand_batch_early_exit(
                jnp.asarray(nbrs), jnp.asarray(seeds), depth=3, max_nodes=cap)
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
            np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
