"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

What the reference never had (SURVEY §2.3): the sharded path must be
bit-compatible with single-device brute force — shard-local top-k merged over
the mesh == global top-k, including deterministic tie-breaking.
"""

import jax
import numpy as np
import pytest

from hcrag_tpu.core.dense_index import DenseIndex
from hcrag_tpu.ingest.adventureworks import build_adventureworks
from hcrag_tpu.parallel.mesh import ROWS_AXIS, make_row_mesh
from hcrag_tpu.parallel.sharded_ops import pad_rows, sharded_row_gather, sharded_top_k
from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine
from hcrag_tpu.query.engine import QueryEngine

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must expose 8 virtual devices"
    return make_row_mesh()


@pytest.fixture(scope="module")
def bundle(reference_pickle_path):
    return build_adventureworks(DATA_DIR, reference_pickle=reference_pickle_path)


class TestShardedTopK:
    def test_matches_global_top_k(self, mesh, rng):
        n, d, b, k = 4096, 64, 4, 10
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        v, i = sharded_top_k(mesh, q, jax.device_put(emb), k)
        scores = q @ emb.T
        ref_i = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        np.testing.assert_array_equal(np.asarray(i), ref_i)
        np.testing.assert_allclose(
            np.asarray(v), np.take_along_axis(scores, ref_i, 1), atol=1e-5
        )

    def test_deterministic_tie_breaking_across_shards(self, mesh):
        # All rows identical -> every score ties; winner must be the lowest
        # global indices in order, regardless of shard boundaries.
        n, d, k = 64, 8, 6
        emb = np.tile(np.eye(1, d, dtype=np.float32), (n, 1))
        q = np.eye(1, d, dtype=np.float32)
        v, i = sharded_top_k(mesh, q, jax.device_put(emb), k)
        assert np.asarray(i)[0].tolist() == [0, 1, 2, 3, 4, 5]

    def test_mask_respected(self, mesh, rng):
        n, d, k = 256, 16, 5
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = emb[:1]
        mask = np.zeros(n, dtype=bool)
        mask[100:200] = True
        v, i = sharded_top_k(mesh, q, jax.device_put(emb), k, jax.device_put(mask))
        assert all(100 <= int(x) < 200 for x in np.asarray(i)[0])


class TestShardedRowGather:
    def test_gather_matches_direct(self, mesh, rng):
        n = 512
        table = rng.standard_normal((n, 7)).astype(np.float32)
        idx = np.array([0, 5, 511, 100, 255], dtype=np.int32)
        out = sharded_row_gather(mesh, jax.device_put(table), jax.device_put(idx))
        np.testing.assert_allclose(np.asarray(out), table[idx], atol=1e-6)

    def test_negative_index_yields_zero(self, mesh, rng):
        table = rng.standard_normal((64, 3)).astype(np.float32)
        idx = np.array([-1, 10], dtype=np.int32)
        out = np.asarray(
            sharded_row_gather(mesh, jax.device_put(table), jax.device_put(idx))
        )
        assert (out[0] == 0).all()
        np.testing.assert_allclose(out[1], table[10], atol=1e-6)


class TestPadRows:
    def test_padding(self):
        arr = np.ones((10, 3))
        padded, n = pad_rows(arr, 8)
        assert padded.shape == (16, 3) and n == 10
        assert (padded[10:] == 0).all()

    def test_no_padding_needed(self):
        arr = np.ones((16, 3))
        padded, n = pad_rows(arr, 8)
        assert padded.shape == (16, 3) and n == 16


class TestShardedEngineParity:
    """The full sharded engine vs the single-device engine on real data."""

    def test_query_batch_identical(self, mesh, bundle, rng):
        single = QueryEngine(bundle.index, bundle.graph)
        sharded = ShardedQueryEngine(bundle.index, bundle.graph, mesh=mesh)
        q = rng.standard_normal((3, 384)).astype(np.float32)
        r1 = single.query_batch(q, top_k=10)
        r2 = sharded.query_batch(q, top_k=10)
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
        np.testing.assert_allclose(r1.top_scores, r2.top_scores, atol=1e-5)
        np.testing.assert_allclose(r1.relevance, r2.relevance, atol=1e-5)
        np.testing.assert_array_equal(r1.expanded_nodes, r2.expanded_nodes)

    def test_category_filter_identical(self, mesh, bundle, rng):
        single = QueryEngine(bundle.index, bundle.graph)
        sharded = ShardedQueryEngine(bundle.index, bundle.graph, mesh=mesh)
        q = rng.standard_normal(384).astype(np.float32)
        r1 = single.query_batch(q, top_k=5, category_filter="pdf_document")
        r2 = sharded.query_batch(q, top_k=5, category_filter="pdf_document")
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)


class TestShardedKernelPaths:
    """The sharded engine must run the SAME kernel stack as the single
    engine — Pallas fused top-k (interpret mode on the CPU mesh), int8
    selection, merge-level exact-rescore — not a plain-XLA fallback
    (round-1 verdict item 2)."""

    def _parity(self, mesh, bundle, rng, **opts):
        single = QueryEngine(bundle.index, bundle.graph, **opts)
        sharded = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh, **opts
        )
        q = rng.standard_normal((4, 384)).astype(np.float32)
        r1 = single.query_batch(q, top_k=10)
        r2 = sharded.query_batch(q, top_k=10)
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
        np.testing.assert_allclose(r1.top_scores, r2.top_scores, atol=1e-5)
        return single, sharded, q, r2

    def test_pallas_path_matches_single(self, mesh, bundle, rng):
        single, sharded, q, r2 = self._parity(
            mesh, bundle, rng, use_pallas=True, pallas_interpret=True
        )
        assert sharded.use_pallas and sharded._pallas_interpret
        # and the Pallas path agrees with plain brute force on indices
        plain = QueryEngine(bundle.index, bundle.graph)
        r0 = plain.query_batch(q, top_k=10)
        np.testing.assert_array_equal(r0.top_indices, r2.top_indices)

    def test_pallas_exact_rescore_matches_single(self, mesh, bundle, rng):
        single, sharded, q, r2 = self._parity(
            mesh, bundle, rng,
            use_pallas=True, pallas_interpret=True, exact_rescore=16,
        )
        assert sharded.exact_rescore == 16
        assert sharded.d_emb_f32 is not None
        assert sharded.d_emb.dtype == jax.numpy.bfloat16
        # f32 rescoring of bf16-selected candidates == exact brute force
        plain = QueryEngine(bundle.index, bundle.graph)
        r0 = plain.query_batch(q, top_k=10)
        np.testing.assert_array_equal(r0.top_indices, r2.top_indices)

    def test_xla_exact_rescore_matches_single(self, mesh, bundle, rng):
        self._parity(mesh, bundle, rng, exact_rescore=16)

    def test_int8_matches_single(self, mesh, bundle, rng):
        _, sharded, _, _ = self._parity(
            mesh, bundle, rng, quantize_int8=True, pallas_interpret=True
        )
        assert sharded._int8_pallas
        assert sharded.d_emb_int8 is not None

    def test_int8_rescore_matches_single(self, mesh, bundle, rng):
        _, sharded, q, r2 = self._parity(
            mesh, bundle, rng,
            quantize_int8=True, pallas_interpret=True, int8_rescore=16,
        )
        assert sharded.int8_rescore == 16
        # bf16 rescore of int8-selected candidates: recall@10 vs exact
        plain = QueryEngine(bundle.index, bundle.graph)
        r0 = plain.query_batch(q, top_k=10)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10.0
            for a, b in zip(r0.top_indices, r2.top_indices)
        ])
        assert overlap >= 0.9

    def test_int8_only_runs_sharded(self, mesh, bundle, rng):
        sharded = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh,
            quantize_int8=True, int8_only=True, pallas_interpret=True,
        )
        assert sharded.d_emb is None  # no bf16 copy in max-density mode
        q = rng.standard_normal((2, 384)).astype(np.float32)
        r = sharded.query_batch(q, top_k=5, expansion_depth=1)
        assert r.top_indices.shape == (2, 5)
        assert (r.top_indices >= 0).all()


class TestShardedGraph:
    """Per-shard ELL (shard_graph=True): neighbor tables sharded over the
    rows axis instead of replicated — expansion and expanded-node scoring
    must stay identical to the replicated-graph engine (discovery order,
    caps, depth-2 ANNOTATION-only semantics included)."""

    def test_expansion_identical_to_replicated(self, mesh, bundle, rng):
        repl = ShardedQueryEngine(bundle.index, bundle.graph, mesh=mesh)
        shg = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh, shard_graph=True
        )
        q = rng.standard_normal((3, 384)).astype(np.float32)
        for depth in (1, 2):
            r1 = repl.query_batch(q, top_k=10, expansion_depth=depth)
            r2 = shg.query_batch(q, top_k=10, expansion_depth=depth)
            np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
            np.testing.assert_array_equal(r1.expanded_nodes, r2.expanded_nodes)
            np.testing.assert_array_equal(
                r1.expanded_counts, r2.expanded_counts
            )
            np.testing.assert_allclose(
                r1.expanded_relevance, r2.expanded_relevance, atol=1e-5
            )

    def test_matches_single_device_engine(self, mesh, bundle, rng):
        single = QueryEngine(bundle.index, bundle.graph)
        shg = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh, shard_graph=True
        )
        q = rng.standard_normal((2, 384)).astype(np.float32)
        r0 = single.query_batch(q, top_k=5, expansion_depth=2)
        r2 = shg.query_batch(q, top_k=5, expansion_depth=2)
        np.testing.assert_array_equal(r0.expanded_nodes, r2.expanded_nodes)
        np.testing.assert_allclose(r0.relevance, r2.relevance, atol=1e-5)

    def test_graph_tables_are_sharded(self, mesh, bundle):
        shg = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh, shard_graph=True
        )
        from hcrag_tpu.parallel.mesh import ROWS_AXIS
        from jax.sharding import PartitionSpec as P

        assert shg.d_neighbors.sharding.spec == P(ROWS_AXIS)
        assert shg.d_g_row.sharding.spec == P(ROWS_AXIS)
        assert shg.d_neighbors.shape[0] % mesh.shape[ROWS_AXIS] == 0


class TestBatchShardedQueries:
    """2-D (batch, rows) mesh with data-parallel query sharding."""

    def test_batch_sharded_matches_replicated(self, bundle, rng):
        from hcrag_tpu.parallel.mesh import make_batch_row_mesh

        mesh2d = make_batch_row_mesh(2, 4)
        repl = ShardedQueryEngine(bundle.index, bundle.graph, mesh=mesh2d)
        dp = ShardedQueryEngine(
            bundle.index, bundle.graph, mesh=mesh2d, shard_queries=True
        )
        assert dp.batch_axis == "batch"
        q = rng.standard_normal((4, 384)).astype(np.float32)
        r1 = repl.query_batch(q, top_k=7)
        r2 = dp.query_batch(q, top_k=7)
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
        np.testing.assert_allclose(r1.top_scores, r2.top_scores, atol=1e-5)
        single = QueryEngine(bundle.index, bundle.graph)
        r0 = single.query_batch(q, top_k=7)
        np.testing.assert_array_equal(r0.top_indices, r2.top_indices)


class TestCollectiveTraffic:
    """The docstring claims in sharded_ops.py, verified against the COMPILED
    program: the candidate merge all-gathers [s, B, m] values+indices
    (O(shards*m)/query) and the distributed rescore all-reduces one [B, m]
    f32 matrix — NOT the [B, m, D] rows (benchmarks/sharded_traffic.py
    measures the full 2/4/8 sweep)."""

    def test_compiled_collective_payloads_match_model(self):
        from benchmarks.sharded_traffic import (
            collective_bytes,
            lower_sharded_step,
        )

        b, k, m, s = 8, 10, 32, 4
        hlo = lower_sharded_step(s, b=b, k=k, m=m)
        colls = collective_bytes(hlo)
        gather = sum(c[3] for c in colls if c[0] == "all-gather")
        reduce_ = sum(c[3] for c in colls if c[0] == "all-reduce")
        assert gather == s * b * m * (4 + 4)  # f32 values + s32 indices
        assert reduce_ == b * m * 4  # [B, m] f32 psum, D-independent
        # nothing else rides the wire in this step
        others = [c for c in colls if c[0] not in ("all-gather", "all-reduce")]
        assert others == []


class TestShardedDynamicWeights:
    def test_dynamic_tensor_matches_single_device(self, bundle, rng):
        """The v0 dynamic weight tensor must flow through the sharded step
        (replicated like the flat weight vector) and give identical results
        to the single-device engine."""
        from hcrag_tpu.pipeline.scorer_designs import (
            canonical_dynamic_weight_tensor,
        )

        mesh = make_row_mesh(8)
        sh = ShardedQueryEngine(bundle.index, bundle.graph, mesh=mesh)
        single = QueryEngine(bundle.index, bundle.graph)
        q = rng.standard_normal((4, 384)).astype(np.float32)
        dyn = canonical_dynamic_weight_tensor()
        r1 = single.query_batch(q, top_k=7, dynamic_weight_tensor=dyn)
        r2 = sh.query_batch(q, top_k=7, dynamic_weight_tensor=dyn)
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
        np.testing.assert_allclose(r1.relevance, r2.relevance, atol=1e-5)
        np.testing.assert_allclose(r1.combined, r2.combined, atol=1e-5)
