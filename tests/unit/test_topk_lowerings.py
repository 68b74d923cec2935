"""Parity tests across the three top-k lowerings (small / chunked / streaming)."""

import numpy as np
import pytest


def _data(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, d)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q, e


class TestStreamingTopK:
    def test_matches_brute_force_with_mask(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.similarity import streaming_masked_top_k

        q, e = _data(300_000, 32, 4)
        mask = np.ones(300_000, bool)
        mask[:1000] = False
        v, i = streaming_masked_top_k(
            jnp.asarray(q), jnp.asarray(e), jnp.asarray(mask), 10,
            chunk_rows=1 << 16,
        )
        s = q @ e.T
        s[:, :1000] = -np.inf
        ref = np.argsort(-s, axis=1, kind="stable")[:, :10]
        np.testing.assert_array_equal(np.asarray(i), ref)

    def test_ragged_chunk_padding(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.similarity import streaming_masked_top_k

        q, e = _data(70_001, 16, 2, seed=1)  # not a chunk multiple
        v, i = streaming_masked_top_k(
            jnp.asarray(q), jnp.asarray(e), jnp.ones((70_001,), bool), 5,
            chunk_rows=1 << 15,
        )
        assert (np.asarray(i) < 70_001).all()
        ref = np.argsort(-(q @ e.T), axis=1, kind="stable")[:, :5]
        np.testing.assert_array_equal(np.asarray(i), ref)

    def test_tie_break_lowest_chunk(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.similarity import streaming_masked_top_k

        d = 16
        e = np.tile(np.eye(1, d, dtype=np.float32), (40_000, 1))
        q = np.eye(1, d, dtype=np.float32)
        v, i = streaming_masked_top_k(
            jnp.asarray(q), jnp.asarray(e), jnp.ones((40_000,), bool), 4,
            chunk_rows=1 << 14,
        )
        assert np.asarray(i)[0].tolist() == [0, 1, 2, 3]


class TestChunkedTopK:
    def test_k_larger_than_n(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.similarity import chunked_top_k

        s = np.array([[3.0, 1.0, 2.0]], np.float32)
        v, i = chunked_top_k(jnp.asarray(s), 10)
        assert np.asarray(i)[0].tolist() == [0, 2, 1]

    def test_engine_switches_to_streaming_past_threshold(self):
        # Shape-only check: a >2^18-row engine compiles the streaming path.
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(1 << 18 | 1024, 32, seed=2)
        engine = QueryEngine(idx, None)
        q = np.asarray(idx.emb[3], np.float32)
        r = engine.query_batch(q, top_k=3)
        assert r.top_indices[0][0] == 3


class TestPadRowMask:
    """Pad rows (Pallas tile alignment) must never be retrievable.

    Regression: `_true_mask` was sized to the PADDED device bank, so
    zero-vector pad rows scored 0.0 and beat real rows whenever a query's
    true top-k scores were all negative (seen as indices >= n on the real
    585-row index through tools/verify_parity.py)."""

    def test_true_mask_sized_to_unpadded_rows(self):
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(585, 128, seed=44)
        e = QueryEngine(idx, None, use_pallas=True, pallas_tile_n=512)
        assert e.d_emb.shape[0] == 1024      # bank padded to tile multiple
        assert e._n_rows == 585
        assert e._true_mask().shape[0] == 585  # mask must NOT cover pads


class TestResolvedKernelConfig:
    """`resolved_kernel_config` must faithfully report the strategy flags
    the engine's `_step`/`_local_select` will actually use (round-4 bench
    attribution; VERDICT #9)."""

    def _idx(self, n=4096, d=128):
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        return synthetic_dense_index(n, d, seed=5)

    def test_bf16_exact_rescore_path(self):
        from hcrag_tpu.query.engine import QueryEngine

        e = QueryEngine(self._idx(), None, use_pallas=True,
                        pallas_interpret=True, exact_rescore=32)
        c = e.resolved_kernel_config(batch=1024, top_k=10)
        assert c["kernel"] == "pallas_float"
        assert c["packed_select"] and c["two_level"]  # <=> exact_rescore>0
        assert c["sub_batch"] == 512                  # packed batch split
        assert c["rescore_bank"] == "f32"
        assert c["merge_k"] == 32 and c["rescore_oversample"] == 32
        assert 512 <= c["tile_n"] <= 2048

    def test_plain_pallas_no_rescore(self):
        from hcrag_tpu.query.engine import QueryEngine

        e = QueryEngine(self._idx(), None, use_pallas=True,
                        pallas_interpret=True)
        c = e.resolved_kernel_config(batch=1024, top_k=10)
        assert c["kernel"] == "pallas_float"
        assert not c["packed_select"] and not c["two_level"]
        assert c["sub_batch"] == 1024
        assert c["rescore_bank"] == ""

    def test_int8_paths(self):
        from hcrag_tpu.query.engine import QueryEngine

        e = QueryEngine(self._idx(), None, quantize_int8=True,
                        int8_rescore=32, pallas_interpret=True)
        c = e.resolved_kernel_config(batch=512, top_k=10)
        assert c["kernel"] == "pallas_int8"
        assert c["two_level"] and c["select_bank"] == "int8"
        assert c["rescore_bank"] == "bf16"
        r = QueryEngine(self._idx(), None, quantize_int8=True, int8_only=True,
                        int8_residual=True, int8_rescore=32,
                        pallas_interpret=True)
        cr = r.resolved_kernel_config(batch=512, top_k=10)
        assert cr["rescore_bank"] == "int8_residual"
        o = QueryEngine(self._idx(), None, quantize_int8=True, int8_only=True,
                        pallas_interpret=True)
        co = o.resolved_kernel_config(batch=512, top_k=10)
        assert not co["two_level"] and co["rescore_bank"] == ""
        assert co["rescore_oversample"] == 0

    def test_int8_f32_rescore_mode(self):
        """Round-5 throughput mode: int8 selection + f32 exact rescore —
        reported as rescore_bank 'f32' and top-k equal to f32 brute force
        (the recall-1.0 contract the headline gates on)."""
        import numpy as np

        from hcrag_tpu.query.engine import QueryEngine

        idx = self._idx(n=4096, d=128)
        e = QueryEngine(idx, None, quantize_int8=True, int8_rescore=32,
                        int8_f32_rescore=True, pallas_interpret=True)
        c = e.resolved_kernel_config(batch=512, top_k=10)
        assert c["kernel"] == "pallas_int8" and c["two_level"]
        assert c["rescore_bank"] == "f32"
        emb = np.asarray(idx.emb, np.float32)
        embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        rng = np.random.default_rng(0)
        q = rng.standard_normal((4, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        res = e.query_batch(q, top_k=10)
        for b in range(4):
            brute = np.argsort(-(embn @ q[b]), kind="stable")[:10]
            assert set(res.top_indices[b].tolist()) == set(brute.tolist())
        # int8_only forbids the f32 bank (density mode) -> flag drops
        o = QueryEngine(idx, None, quantize_int8=True, int8_only=True,
                        int8_f32_rescore=True, pallas_interpret=True)
        assert not o.int8_f32_rescore

    def test_xla_fallback_reported(self):
        from hcrag_tpu.query.engine import QueryEngine

        e = QueryEngine(self._idx(d=100), None)  # dim % 128 != 0 -> XLA
        c = e.resolved_kernel_config(batch=64, top_k=10)
        assert c["kernel"].startswith("xla_streaming")


class TestSuperTiles:
    """Round-5 supertile selection: level-2 picks + candidate writes once
    per supertile (up to 8192 rows) instead of once per tile — the
    rescore-gated packed paths only.  Pinned here: kernel-level top-k
    containment across supertile factors, the engine auto-resolution, and
    the tiny-index / small-batch clamps."""

    def _qe(self, n=5000, d=128, b=16, seed=0):
        rng = np.random.default_rng(seed)
        e = rng.standard_normal((n, d)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return q, e

    def test_kernel_containment_all_factors(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k

        q, e = self._qe()
        n, k = e.shape[0], 10
        mask = np.ones(n, bool)
        mask[100:200] = False
        s = q @ e.T
        s[:, 100:200] = -np.inf
        ref = np.argsort(-s, axis=1, kind="stable")[:, :k]
        for spt in (1, 2, 4, 8):
            v, i = pallas_cosine_top_k(
                jnp.asarray(q), jnp.asarray(e), jnp.asarray(mask), k,
                tile_n=512, interpret=True, packed_select=True, merge_k=32,
                two_level=True, super_tiles=spt,
            )
            pool = np.asarray(i)
            for r in range(q.shape[0]):
                assert set(ref[r]) <= set(pool[r].tolist()), (spt, r)
                assert not (set(pool[r].tolist()) & set(range(100, 200)))

    def test_int8_supertile_containment(self):
        import jax.numpy as jnp

        from hcrag_tpu.ops.quantize import quantize_rows
        from hcrag_tpu.ops.topk_pallas import pallas_cosine_top_k_int8

        q, e = self._qe(seed=2)
        e8, sc = quantize_rows(e)
        n, k = e.shape[0], 10
        mask = np.ones(n, bool)
        ref = np.argsort(-(q @ e.T), axis=1, kind="stable")[:, :k]
        for spt in (1, 8):
            v, i = pallas_cosine_top_k_int8(
                jnp.asarray(q), jnp.asarray(e8), jnp.asarray(sc),
                jnp.asarray(mask), k, tile_n=512, interpret=True,
                packed_select=True, merge_k=32, two_level=True,
                super_tiles=spt,
            )
            pool = np.asarray(i)
            hits = np.mean(
                [len(set(pool[r]) & set(ref[r])) / k for r in range(q.shape[0])]
            )
            assert hits >= 0.95, (spt, hits)  # int8 selection noise only

    def test_engine_super_and_recall(self):
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        idx = synthetic_dense_index(20000, 128, seed=3)
        emb = np.asarray(idx.emb, np.float32)
        rng = np.random.default_rng(1)
        q = rng.standard_normal((128, 128)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        ref = np.argsort(-(q @ emb.T), axis=1, kind="stable")[:, :10]
        # Auto only engages at >= 2M rows (measured: loses below that);
        # explicit pallas_super forces it for this small-index parity check.
        e = QueryEngine(idx, None, use_pallas=True, exact_rescore=32,
                        pallas_super=8, pallas_interpret=True)
        c = e.resolved_kernel_config(128, 10)
        assert c["super_tiles"] > 1
        # bank pre-padded to the supertile width (no per-call jnp.pad copy)
        assert e.d_emb.shape[0] % (c["super_tiles"] * c["tile_n"]) == 0
        res = e.query_batch(q, top_k=10)
        for r in range(128):
            assert set(res.top_indices[r].tolist()) == set(ref[r].tolist())

    def test_super_clamps(self):
        from hcrag_tpu.ops.topk_pallas import _resolve_super_tiles
        from hcrag_tpu.query.engine import QueryEngine
        from hcrag_tpu.utils.synthetic import synthetic_dense_index

        # non-two-level / non-packed paths never supertile
        assert _resolve_super_tiles(8, 1024, 100, False, True) == 1
        assert _resolve_super_tiles(8, 1024, 100, True, False) == 1
        # lbits cap: spt * tile_n <= 8192
        assert _resolve_super_tiles(8, 2048, 100, True, True) == 4
        # tile-count clamp
        assert _resolve_super_tiles(8, 1024, 2, True, True) == 2
        # tiny index: engine reports spt 1 and does not inflate the bank
        idx = synthetic_dense_index(585, 128, seed=4)
        e = QueryEngine(idx, None, use_pallas=True, exact_rescore=32,
                        pallas_interpret=True)
        assert e.resolved_kernel_config(512, 10)["super_tiles"] == 1
        assert e.d_emb.shape[0] <= 2048
        # small batches skip the supertile layout (b pads to 128 lanes)
        big = synthetic_dense_index(20000, 128, seed=5)
        eb = QueryEngine(big, None, use_pallas=True, exact_rescore=32,
                         pallas_interpret=True)
        assert eb.resolved_kernel_config(8, 10)["super_tiles"] == 1
