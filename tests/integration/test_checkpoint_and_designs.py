"""Tests for sharded checkpointing and the class-based scorer framework."""

import numpy as np
import pytest

from hcrag_tpu.testing import create_sample_nodes, create_sample_query


class TestShardedCheckpoint:
    def test_roundtrip_on_mesh(self, tmp_path):
        import jax

        from hcrag_tpu.parallel.checkpoint import (
            restore_sharded_index,
            save_sharded_index,
        )
        from hcrag_tpu.parallel.mesh import make_row_mesh
        from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        mesh = make_row_mesh()
        index = synthetic_dense_index(512, 64, seed=3)
        engine = ShardedQueryEngine(index, None, mesh=mesh)
        before = np.asarray(engine.d_emb)
        save_sharded_index(engine, tmp_path / "ckpt")

        engine2 = ShardedQueryEngine(
            synthetic_dense_index(512, 64, seed=99), None, mesh=mesh
        )
        assert not np.allclose(np.asarray(engine2.d_emb), before)
        restore_sharded_index(engine2, tmp_path / "ckpt")
        np.testing.assert_array_equal(np.asarray(engine2.d_emb), before)
        # restored arrays keep their row sharding
        assert engine2.d_emb.sharding == engine.d_emb.sharding

    def test_query_results_identical_after_restore(self, tmp_path):
        from hcrag_tpu.parallel.checkpoint import (
            restore_sharded_index,
            save_sharded_index,
        )
        from hcrag_tpu.parallel.mesh import make_row_mesh
        from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        mesh = make_row_mesh()
        index = synthetic_dense_index(256, 64, seed=5)
        engine = ShardedQueryEngine(index, None, mesh=mesh)
        q = np.asarray(index.emb[7], np.float32)
        ref = engine.query_batch(q, top_k=5)
        save_sharded_index(engine, tmp_path / "ck2")
        engine2 = ShardedQueryEngine(
            synthetic_dense_index(256, 64, seed=77), None, mesh=mesh
        )
        restore_sharded_index(engine2, tmp_path / "ck2")
        # feature tables restored too -> identical scores end to end
        out = engine2.query_batch(q, top_k=5)
        np.testing.assert_array_equal(ref.top_indices, out.top_indices)
        np.testing.assert_allclose(ref.relevance, out.relevance, atol=1e-6)

    @pytest.mark.parametrize(
        "opts",
        [
            {"quantize_int8": True, "int8_rescore": 8},
            {"quantize_int8": True, "int8_only": True},
            {"exact_rescore": 8},
        ],
        ids=["int8+rescore", "int8_only", "exact_rescore"],
    )
    def test_quantized_and_rescore_banks_roundtrip(self, tmp_path, opts):
        """Engines that select/rescore against emb_int8/emb_scale/emb_f32
        must checkpoint those banks too — a restore that misses any of them
        would silently rank against stale tables (round-1 advisor finding)."""
        from hcrag_tpu.parallel.checkpoint import (
            restore_sharded_index,
            save_sharded_index,
        )
        from hcrag_tpu.parallel.mesh import make_row_mesh
        from hcrag_tpu.parallel.sharded_engine import ShardedQueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        mesh = make_row_mesh()
        index = synthetic_dense_index(512, 128, seed=3)
        engine = ShardedQueryEngine(index, None, mesh=mesh, **opts)
        q = np.asarray(index.emb[13], np.float32)
        ref = engine.query_batch(q, top_k=5)
        save_sharded_index(engine, tmp_path / "ck3")

        engine2 = ShardedQueryEngine(
            synthetic_dense_index(512, 128, seed=44), None, mesh=mesh, **opts
        )
        other = engine2.query_batch(q, top_k=5)
        assert not np.array_equal(ref.top_indices, other.top_indices)
        restore_sharded_index(engine2, tmp_path / "ck3")
        out = engine2.query_batch(q, top_k=5)
        np.testing.assert_array_equal(ref.top_indices, out.top_indices)
        np.testing.assert_allclose(ref.top_scores, out.top_scores, atol=1e-6)
        if engine.d_emb_int8 is not None:
            np.testing.assert_array_equal(
                np.asarray(engine2.d_emb_int8), np.asarray(engine.d_emb_int8)
            )
        if engine.d_emb_f32 is not None:
            np.testing.assert_array_equal(
                np.asarray(engine2.d_emb_f32), np.asarray(engine.d_emb_f32)
            )


class TestScorerDesigns:
    def test_v1_composite_and_explain(self):
        from hcrag_tpu.pipeline.scorer_designs import (
            CompositeScorer,
            GraphCentralityMetric,
        )

        query = create_sample_query()
        nodes = create_sample_nodes()
        for n in nodes:
            n.graph_relations["degree"] = 25
        scorer = CompositeScorer()
        scores = scorer.score_batch(query, nodes)
        assert len(scores) == 18 and all(0 <= s <= 1 for s in scores)
        trace = scorer.explain(query, nodes[:2])
        assert set(trace[0]) == {
            "semantic_similarity", "llm_judge", "entity_match",
            "node_type_priority", "graph_centrality", "composite",
        }
        assert trace[0]["graph_centrality"] == pytest.approx(0.5)

    def test_custom_metric_plugs_in(self):
        from hcrag_tpu.pipeline.scorer_designs import (
            CompositeScorer,
            RelevanceMetric,
            SemanticSimilarityMetric,
        )

        class ConstantMetric(RelevanceMetric):
            name = "constant"

            def score_batch(self, query, nodes):
                return [0.42] * len(nodes)

        scorer = CompositeScorer(
            metrics=[SemanticSimilarityMetric(), ConstantMetric()],
            weights={"semantic_similarity": 0.5, "constant": 0.5},
        )
        q = create_sample_query()
        nodes = create_sample_nodes()[:3]
        out = scorer.score_batch(q, nodes)
        assert len(out) == 3

    def test_weight_validation(self):
        from hcrag_tpu.pipeline.scorer_designs import CompositeScorer

        with pytest.raises(ValueError):
            CompositeScorer(weights={"semantic_similarity": 0.4})
