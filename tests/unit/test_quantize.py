"""Int8 quantized-index retrieval tests."""

import numpy as np
import pytest

from hcrag_tpu.query.engine import QueryEngine
from hcrag_tpu.utils.synthetic import synthetic_dense_index


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        from hcrag_tpu.ops.quantize import quantize_rows

        rng = np.random.default_rng(0)
        emb = rng.standard_normal((100, 64)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q, scale = quantize_rows(emb)
        restored = q.astype(np.float32) * scale[:, None]
        assert np.abs(restored - emb).max() < 1.0 / 127

    def test_zero_row(self):
        from hcrag_tpu.ops.quantize import quantize_rows

        q, scale = quantize_rows(np.zeros((2, 8), np.float32))
        assert (q == 0).all() and (scale == 0).all()

    def test_engine_int8_matches_f32_ranking(self):
        idx = synthetic_dense_index(4000, 128, seed=3)
        e32 = QueryEngine(idx, None)
        e8 = QueryEngine(idx, None, quantize_int8=True)
        rng = np.random.default_rng(0)
        q = rng.standard_normal((6, 128)).astype(np.float32)
        r32 = e32.query_batch(q, top_k=10)
        r8 = e8.query_batch(q, top_k=10)
        overlap = np.mean(
            [
                len(set(r32.top_indices[i]) & set(r8.top_indices[i])) / 10
                for i in range(6)
            ]
        )
        assert overlap >= 0.9
        assert np.abs(r32.top_scores - r8.top_scores).max() < 0.01

    def test_streaming_int8_top_k(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.quantize import (
            quantize_rows,
            streaming_quantized_top_k,
        )

        emb = np.asarray(
            synthetic_dense_index(200_000, 64, seed=4).emb, np.float32
        )
        q = emb[:4]
        q8, s8 = quantize_rows(emb)
        v, i = streaming_quantized_top_k(
            jnp.asarray(q), jnp.asarray(q8), jnp.asarray(s8),
            jnp.ones((emb.shape[0],), bool), 10, chunk_rows=1 << 16,
        )
        assert (np.asarray(i)[:, 0] == np.arange(4)).all()  # self-hit

    def test_category_mask_respected_int8(self):
        idx = synthetic_dense_index(2000, 64, seed=5)
        e8 = QueryEngine(idx, None, quantize_int8=True)
        mask_rows = np.zeros(2000, bool)
        mask_rows[100:200] = True
        # drive through the public path: monkeypatch type_mask
        idx.type_mask = lambda t: mask_rows
        r = e8.query_batch(
            np.asarray(idx.emb[150], np.float32), top_k=5,
            category_filter="anything",
        )
        assert all(100 <= int(x) < 200 for x in r.top_indices[0])


class TestInt8Rescore:
    """Oversample + exact-rescore refinement (engine `int8_rescore=m`)."""

    def test_rescore_recovers_exact_ranking(self):
        idx = synthetic_dense_index(4000, 128, seed=7)
        e32 = QueryEngine(idx, None)
        e8r = QueryEngine(idx, None, quantize_int8=True, int8_rescore=40)
        rng = np.random.default_rng(1)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        r32 = e32.query_batch(q, top_k=10)
        r8 = e8r.query_batch(q, top_k=10)
        overlap = np.mean(
            [
                len(set(r32.top_indices[i]) & set(r8.top_indices[i])) / 10
                for i in range(8)
            ]
        )
        assert overlap >= 0.99
        # final scores are exact f32 dots of bf16 rows, not int8 estimates
        assert np.abs(r32.top_scores - r8.top_scores).max() < 4e-3

    def test_rescore_disabled_in_int8_only_mode(self):
        idx = synthetic_dense_index(512, 64, seed=8)
        e = QueryEngine(
            idx, None, quantize_int8=True, int8_only=True, int8_rescore=32
        )
        assert e.int8_rescore == 0  # no exact rows to rescore against
        q = np.asarray(idx.emb[5], np.float32)
        assert e.query_batch(q, top_k=5).top_indices[0][0] == 5

    def test_rescore_respects_category_mask(self):
        idx = synthetic_dense_index(2000, 64, seed=9)
        e = QueryEngine(idx, None, quantize_int8=True, int8_rescore=24)
        mask_rows = np.zeros(2000, bool)
        mask_rows[100:200] = True
        idx.type_mask = lambda t: mask_rows
        r = e.query_batch(
            np.asarray(idx.emb[150], np.float32), top_k=5,
            category_filter="anything",
        )
        assert all(100 <= int(x) < 200 for x in r.top_indices[0])


class TestInt8Residual:
    """Residual-refined max-density mode: int8 selection bank + int8
    residual bank; candidate rescoring reconstructs rows at ~3e-5 relative
    error, giving int8-only residency an exact-rescore source."""

    def test_reconstruction_error_tiny(self):
        from hcrag_tpu.ops.quantize import quantize_residual, quantize_rows

        rng = np.random.default_rng(2)
        emb = rng.standard_normal((256, 128)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q8, s = quantize_rows(emb)
        r8, rs = quantize_residual(emb, q8, s)
        recon = q8.astype(np.float32) * s[:, None] + (
            r8.astype(np.float32) * rs[:, None]
        )
        assert np.abs(recon - emb).max() < 1e-4

    def test_residual_rescore_recovers_exact_ranking(self):
        idx = synthetic_dense_index(4000, 128, seed=7)
        e32 = QueryEngine(idx, None)
        e8r = QueryEngine(
            idx, None, quantize_int8=True, int8_residual=True,
            int8_rescore=40,
        )
        assert e8r.int8_only and e8r.int8_rescore == 40
        assert e8r.d_emb is None and e8r.d_emb_res8 is not None
        rng = np.random.default_rng(1)
        q = rng.standard_normal((8, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        r32 = e32.query_batch(q, top_k=10)
        r8 = e8r.query_batch(q, top_k=10)
        overlap = np.mean(
            [
                len(set(r32.top_indices[i]) & set(r8.top_indices[i])) / 10
                for i in range(8)
            ]
        )
        assert overlap >= 0.99
        # final scores are near-exact reconstructions, closer than bf16
        assert np.abs(r32.top_scores - r8.top_scores).max() < 3e-4

    def test_residual_sharded_matches_single(self):
        import jax

        from hcrag_tpu.parallel.mesh import make_row_mesh
        from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine

        assert len(jax.devices()) == 8
        idx = synthetic_dense_index(2048, 128, seed=12)
        opts = dict(quantize_int8=True, int8_residual=True, int8_rescore=24)
        single = QueryEngine(idx, None, **opts)
        sharded = ShardedQueryEngine(idx, None, mesh=make_row_mesh(), **opts)
        rng = np.random.default_rng(3)
        q = rng.standard_normal((4, 128)).astype(np.float32)
        r1 = single.query_batch(q, top_k=10)
        r2 = sharded.query_batch(q, top_k=10)
        np.testing.assert_array_equal(r1.top_indices, r2.top_indices)
        np.testing.assert_allclose(r1.top_scores, r2.top_scores, atol=1e-5)


class TestInt8Only:
    def test_int8_only_mode_no_bf16_copy(self):
        idx = synthetic_dense_index(2000, 64, seed=3)
        e = QueryEngine(idx, None, quantize_int8=True, int8_only=True)
        assert e.d_emb is None
        q = np.asarray(idx.emb[5], np.float32)
        r = e.query_batch(q, top_k=5)
        assert r.top_indices[0][0] == 5

    def test_int8_only_with_graph_expansion(self):
        import jax.numpy as jnp

        from hcrag_tpu.core.graph import CsrGraph
        from hcrag_tpu.core.types import edge_type_id

        idx = synthetic_dense_index(512, 64, seed=4)
        src = np.arange(511)
        dst = np.arange(1, 512)
        g = CsrGraph.from_edges(
            512, src, dst, np.full(511, edge_type_id("DESCRIBED_BY")),
            node_labels=["Product"] * 512,
            node_keys=list(range(512)),
            node_texts=[f"n{i}" for i in range(512)],
            node_to_row=np.arange(512, dtype=np.int32),
        )
        idx.graph_ids = np.arange(512, dtype=np.int32)
        e = QueryEngine(idx, g, quantize_int8=True, int8_only=True)
        q = np.asarray(idx.emb[10], np.float32)
        r = e.query_batch(q, top_k=3, expansion_depth=1)
        count = int(r.expanded_counts[0])
        assert count > 0
        # expanded scores come from dequantized int8 gathers, bounded [0,1]
        scores = r.expanded_relevance[0][:count]
        assert ((scores >= 0) & (scores <= 1 + 1e-6)).all()


class TestExactRescoreFloatPath:
    """Float-path hybrid residency: bf16 kernel bank + f32 candidate rescore."""

    def test_recovers_exact_recall_over_bf16(self):
        idx = synthetic_dense_index(4000, 128, seed=31)
        emb_f32 = np.asarray(idx.emb, np.float32)
        e = QueryEngine(idx, None, exact_rescore=32)
        assert e.d_emb.dtype.name == "bfloat16"
        assert e.d_emb_f32 is not None
        rng = np.random.default_rng(2)
        q = rng.standard_normal((6, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        r = e.query_batch(q, top_k=10)
        ref = np.argsort(-(q @ emb_f32.T), axis=1, kind="stable")[:, :10]
        overlap = np.mean(
            [len(set(np.asarray(r.top_indices[i])) & set(ref[i])) / 10
             for i in range(6)]
        )
        assert overlap >= 0.99
        # final scores are f32-exact dots (bf16 row error only if any)
        ref_scores = np.take_along_axis(q @ emb_f32.T, ref, 1)
        assert np.abs(np.asarray(r.top_scores) - ref_scores).max() < 4e-3

    def test_mask_not_resurrected_by_rescore(self):
        # oversample (m) larger than the valid row count: the rescore must
        # not resurrect rows the type filter excluded
        idx = synthetic_dense_index(1000, 64, seed=32)
        e = QueryEngine(idx, None, exact_rescore=64)
        mask_rows = np.zeros(1000, bool)
        mask_rows[10:20] = True  # only 10 valid rows, m=64
        idx.type_mask = lambda t: mask_rows
        r = e.query_batch(
            np.asarray(idx.emb[15], np.float32), top_k=5,
            category_filter="x",
        )
        assert all(10 <= int(x) < 20 for x in r.top_indices[0])

    def test_disabled_on_bf16_source(self):
        import ml_dtypes

        idx = synthetic_dense_index(512, 64, seed=33)
        idx.emb = np.asarray(idx.emb, np.float32).astype(ml_dtypes.bfloat16)
        e = QueryEngine(idx, None, exact_rescore=32)
        assert e.exact_rescore == 0  # no f32 source to rescore against
        q = np.asarray(idx.emb[5], np.float32)
        assert e.query_batch(q, top_k=5).top_indices[0][0] == 5

    def test_refresh_rebuilds_f32_bank(self):
        idx = synthetic_dense_index(256, 64, seed=34)
        e = QueryEngine(idx, None, exact_rescore=16)
        rng = np.random.default_rng(3)
        new = rng.standard_normal((2, 64)).astype(np.float32)
        new /= np.linalg.norm(new, axis=1, keepdims=True)
        idx.append(new, [{"id": f"r{i}", "type": "database_table",
                          "table_name": "T"} for i in range(2)],
                   ["a", "b"])
        e.refresh_index()
        assert e.d_emb_f32.shape[0] == 258
        r = e.query_batch(new[1], top_k=1)
        assert r.top_indices[0][0] == 257
