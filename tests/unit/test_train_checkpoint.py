"""Training-state checkpoint/resume (utils/train_checkpoint.py).

Resume must be bit-exact: params + optimizer moments + step all round-trip,
so an interrupted training run continues identically to an uninterrupted
one (the training-side analogue of the index/workflow resume surfaces,
SURVEY §5.4)."""

import numpy as np
import pytest

from hcrag_tpu.models.reranker import NUM_FEATURES, Reranker
from hcrag_tpu.utils.train_checkpoint import (
    restore_train_state,
    save_train_state,
)


def _batches(seed=0, n=6):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.standard_normal((4, 8, NUM_FEATURES)).astype(np.float32),
            rng.uniform(size=(4, 8)).astype(np.float32),
        )
        for _ in range(n)
    ]


class TestRerankerResume:
    def test_resume_is_bit_exact(self, tmp_path):
        import jax

        batches = _batches()
        # Uninterrupted run
        full = Reranker(seed=1)
        for f, l in batches:
            full.train_step(f, l)

        # Interrupted at step 3 + checkpoint + fresh process + resume
        first = Reranker(seed=1)
        for f, l in batches[:3]:
            first.train_step(f, l)
        ckpt = tmp_path / "reranker.npz"
        first.save(ckpt, step=3)

        resumed = Reranker(seed=999)  # different init — must not matter
        assert resumed.restore(ckpt) == 3
        for f, l in batches[3:]:
            resumed.train_step(f, l)

        for a, b in zip(
            jax.tree_util.tree_leaves(full.state.params),
            jax.tree_util.tree_leaves(resumed.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer moments too
        for a, b in zip(
            jax.tree_util.tree_leaves(full.state.opt_state),
            jax.tree_util.tree_leaves(resumed.state.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scores_round_trip(self, tmp_path):
        r = Reranker(seed=2)
        f, l = _batches(seed=5, n=1)[0]
        r.train_step(f, l)
        r.save(tmp_path / "c.npz")
        r2 = Reranker(seed=3)
        r2.restore(tmp_path / "c.npz")
        np.testing.assert_array_equal(r.score(f), r2.score(f))


class TestDriftDetection:
    def test_shape_mismatch_raises(self, tmp_path):
        r64 = Reranker(hidden=64)
        r64.save(tmp_path / "c.npz")
        r32 = Reranker(hidden=32)
        with pytest.raises(ValueError, match="shape"):
            r32.restore(tmp_path / "c.npz")

    def test_leaf_count_mismatch_raises(self, tmp_path):
        import optax

        params = {"w": np.zeros((2, 2), np.float32)}
        tx_a = optax.sgd(0.1)
        save_train_state(tmp_path / "c.npz", params, tx_a.init(params), 1)
        tx_b = optax.adam(0.1)  # more state leaves than sgd
        with pytest.raises(ValueError, match="leaves"):
            restore_train_state(
                tmp_path / "c.npz", params, tx_b.init(params)
            )

    def test_step_round_trips(self, tmp_path):
        import optax

        params = {"w": np.ones((3,), np.float32)}
        tx = optax.adam(0.1)
        save_train_state(tmp_path / "c.npz", params, tx.init(params), 41)
        _, _, step = restore_train_state(
            tmp_path / "c.npz", params, tx.init(params)
        )
        assert step == 41
