"""Micro-attribution: the cross-tile candidate merge vs alternatives.

The fused kernel's final stage is an XLA `lax.top_k` over the per-tile
candidate pool ([B, num_tiles*k] = [512, 4890] at 1M/k=10, keep merge_k=32).
This times (scan-folded, one device call per variant — NOTES.md dispatch
floor):

  xla_topk        lax.top_k(v, 32) + take_along_axis   (production today)
  packed_pallas   pack value+position, per-2048-tile two-level select via
                  the production kernel machinery, tiny final top_k over
                  3*32 survivors
  argmax32        32 unrolled max+mask passes in plain XLA

Usage (TPU): python benchmarks/merge_micro.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    B, NT, K, M = 512, 489, 10, 32
    C = NT * K  # 4890 candidates
    rng = np.random.default_rng(0)
    vals = rng.standard_normal((B, C)).astype(np.float32)
    idxs = rng.integers(0, 1_000_000, size=(B, C)).astype(np.int32)
    d_v = jax.device_put(jnp.asarray(vals))
    d_i = jax.device_put(jnp.asarray(idxs))

    def folded(fn, reps=20):
        @jax.jit
        def run(v, i):
            def body(carry, r):
                ov, oi = fn(v + r.astype(jnp.float32) * 1e-6, i)
                return carry + ov.sum() + oi.sum(), 0
            s, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(reps)
            )
            return s

        # warm
        np.asarray(run(d_v, d_i))
        t0 = time.time()
        np.asarray(run(d_v, d_i))
        return (time.time() - t0) / reps

    def xla_topk(v, i):
        ov, pos = jax.lax.top_k(v, M)
        return ov, jnp.take_along_axis(i, pos, axis=1)

    def argmax32(v, i):
        col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        outs_v, outs_p = [], []
        for _ in range(M):
            best = jnp.max(v, axis=1)
            first = jnp.argmax(v == best[:, None], axis=1)
            outs_v.append(best)
            outs_p.append(first)
            v = jnp.where(col == first[:, None], -jnp.inf, v)
        pos = jnp.stack(outs_p, axis=1)
        return jnp.stack(outs_v, axis=1), jnp.take_along_axis(i, pos, axis=1)

    def approx_max(v, i):
        ov, pos = jax.lax.approx_max_k(v, M, recall_target=0.95)
        return ov, jnp.take_along_axis(i, pos, axis=1)

    res = {}
    res["xla_topk_ms"] = round(1e3 * folded(xla_topk), 3)
    log(f"xla_topk: {res['xla_topk_ms']} ms")
    res["argmax32_ms"] = round(1e3 * folded(argmax32), 3)
    log(f"argmax32: {res['argmax32_ms']} ms")
    res["approx_max_k_ms"] = round(1e3 * folded(approx_max), 3)
    log(f"approx_max_k: {res['approx_max_k_ms']} ms")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
