"""Isolated HBM bandwidth probe — prove or break the "63 GiB/s ceiling".

`docs/ROUND2.md` inferred an environment HBM ceiling from the fused kernel's
own throughput (circular).  This measures raw device-local bandwidth in
isolation over the SAME bank shapes the retrieval kernels stream:

  * xla_reduce:    jnp.sum(bank, dtype=f32) — one full read, no writes
  * folded_reduce: 16 full-bank reads inside ONE device call (lax.scan,
                   pass-dependent scalars defeat CSE) — removes the
                   per-dispatch relay floor from the measurement
  * xla_copy:      bank * (1 + eps) -> new buffer — read + write (2x bytes)

over the bf16 [1M, 384] bank (734 MiB) and the int8 bank (367 MiB), with
the round-2 residency-forcing discipline (NOTES.md: block_until_ready
under-blocks through the relay; force residency with readbacks BEFORE any
timing, warm up twice).

If these measure ~63 GiB/s, the ceiling is real and the packed kernel is at
speed-of-light for this environment.  If they measure well above, the kernel
has headroom and float-path tuning is back on the table.

Usage (TPU): python benchmarks/hbm_bandwidth.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.session import log, timed


def time_op(fn, *args, steps=20):
    import jax

    for _ in range(2):  # compile + drain queued work, forced readback
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    outs = [fn(*args) for _ in range(steps)]
    jax.block_until_ready(outs)
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.time() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    N, D = 1_000_000, 384
    n_pad = ((N + 2047) // 2048) * 2048
    rng = np.random.default_rng(7)
    with timed("gen"):
        E = rng.standard_normal((n_pad, D)).astype(np.float32)
    d_bf16 = jax.device_put(jnp.asarray(E.astype(ml_dtypes.bfloat16)))
    d_int8 = jax.device_put(
        jnp.asarray((E * 16).clip(-127, 127).astype(np.int8))
    )
    # Residency BEFORE timing (NOTES.md round-2 finding).
    with timed("residency readbacks"):
        for bank in (d_bf16, d_int8):
            np.asarray(jnp.sum(bank[:, -1].astype(jnp.float32)))

    results = {}

    def bw(label, fn, bank, bytes_moved, steps=20):
        dt = time_op(fn, bank, steps=steps)
        gibs = bytes_moved / dt / 2**30
        log(f"[{label}] {1000 * dt:.2f} ms -> {gibs:.1f} GiB/s")
        results[label] = round(gibs, 1)

    reduce_f32 = jax.jit(lambda e: jnp.sum(e, dtype=jnp.float32))
    copy_op = jax.jit(lambda e: e * jnp.asarray(1.0009765625, e.dtype))

    # Scan-folded multi-pass reduce: 16 full-bank reads inside ONE device
    # call (each pass multiplies by a distinct scalar so XLA cannot CSE the
    # reads away) — removes any per-dispatch relay floor from the
    # measurement.  16 reads of the same bank cannot be cached: the bank is
    # ~50x VMEM.
    PASSES = 16

    @jax.jit
    def folded_reduce(e):
        def one(carry, s):
            return carry + jnp.sum(e * s.astype(e.dtype), dtype=jnp.float32), ()

        total, _ = jax.lax.scan(
            one, jnp.float32(0), jnp.arange(1, PASSES + 1, dtype=jnp.int32)
        )
        return total

    bf16_bytes = n_pad * D * 2
    int8_bytes = n_pad * D
    bw("xla_reduce_bf16_734MiB", reduce_f32, d_bf16, bf16_bytes)
    bw("xla_reduce_int8_367MiB", reduce_f32, d_int8, int8_bytes)
    bw(f"folded_reduce_bf16_{PASSES}x", folded_reduce, d_bf16,
       PASSES * bf16_bytes, steps=4)
    bw(f"folded_reduce_int8_{PASSES}x", folded_reduce, d_int8,
       PASSES * int8_bytes, steps=4)
    bw("xla_copy_bf16_rw", copy_op, d_bf16, 2 * bf16_bytes, steps=4)

    # Optional profiler trace of one reduce + one fused-kernel step.
    trace_dir = os.environ.get("BW_TRACE_DIR")
    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                jax.block_until_ready(reduce_f32(d_bf16))
            log(f"profiler trace written to {trace_dir}")
            results["trace_dir"] = trace_dir
        except Exception as e:  # the relay may not support profiling
            log(f"profiler trace failed: {e}")
            results["trace_error"] = str(e)[:200]

    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["hbm_bandwidth"] = dict(
        results,
        note=(
            "Isolated device-local bandwidth: full-bank streaming reductions "
            "(read-only) over the exact retrieval bank shapes, "
            "residency-forced.  folded_reduce (16 reads per device call) is "
            "the cleanest number — single-dispatch rows carry a ~3.4 ms "
            "relay dispatch floor, and the copy row is fresh-allocation "
            "dominated (each step allocates a 734 MiB output through the "
            "relay), not a bandwidth measurement.  Decides whether the "
            "fused kernel's effective GiB/s is the environment ceiling or "
            "kernel headroom."
        ),
    )
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
