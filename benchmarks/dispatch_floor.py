"""Quantify the relay's per-dispatch overhead vs true device kernel time.

Times the production fused kernel (packed two-level + exact-rescore merge
oversample) at several index sizes in ONE process, then fits
t(N) = a + d*N.  `a` is the fixed per-dispatch cost (host + relay + launch,
NOT device work); `d*N` is the true device time.  Writes the fit to
results.json so kernel numbers can be read with the overhead explicit.

Round-4 motivation: every single-call timing (kernel_sweep, DMA probes)
bottoms out at ~6 ms regardless of work — solving the line shows ~5.7 ms
of that is dispatch, which no kernel change can touch.  See NOTES.md
"Round-4 findings".

Usage (TPU): python benchmarks/dispatch_floor.py
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
    import ml_dtypes

    import hcrag_tpu.ops.topk_pallas as tp
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    D, B, K = 384, 512, 10
    sizes = [131072, 262144, 524288, 1048576]
    rng = np.random.default_rng(7)
    Q = rng.standard_normal((B, D)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    d_q = jax.device_put(jnp.asarray(Q))

    fn = functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=2048,
        packed_select=True, merge_k=32, two_level=True,
    )

    pts = []
    for n in sizes:
        E = rng.standard_normal((n, D)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        d_e = jax.device_put(jnp.asarray(E.astype(ml_dtypes.bfloat16)))
        d_m = jax.device_put(jnp.ones(n, bool))
        np.asarray(jnp.sum(d_e[:, -1].astype(jnp.float32)))  # residency
        v, i = fn(d_q, d_e, d_m)
        jax.block_until_ready((v, i)); np.asarray(v)  # warm + force
        steps = 10
        t0 = time.time()
        outs = [fn(d_q, d_e, d_m) for _ in range(steps)]
        jax.block_until_ready(outs); _ = np.asarray(outs[-1][0])
        dt = (time.time() - t0) / steps
        log(f"N={n}: {1e3*dt:.2f} ms/call")
        pts.append((n, dt))
        del d_e, d_m

    ns = np.array([p[0] for p in pts], np.float64)
    ts = np.array([p[1] for p in pts], np.float64) * 1e3  # ms
    d_slope, a = np.polyfit(ns, ts, 1)
    device_1m_ms = d_slope * 1_048_576
    read_bw = 1_048_576 * D * 2 / (device_1m_ms / 1e3) / 2**30
    out = {
        "per_call_ms": {str(n): round(t, 3) for n, t in zip(ns, ts)},
        "fit_dispatch_overhead_ms": round(float(a), 3),
        "fit_device_ms_per_1M_rows": round(float(device_1m_ms), 3),
        "implied_min_read_gib_s_if_dma_bound": round(float(read_bw), 1),
        "note": (
            "t(N) = a + d*N over the production packed two-level kernel "
            "(B=512, merge_k=32).  'a' is relay/host dispatch cost no "
            "kernel change can reduce; device work is the slope."
        ),
    }
    print(json.dumps(out))
    res = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results.json")
    if os.path.exists(res):
        data = json.load(open(res))
        data["dispatch_floor_fit"] = out
        json.dump(data, open(res, "w"), indent=2)


if __name__ == "__main__":
    main()
