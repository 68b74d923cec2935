"""Attribute the fused top-k kernel's time and sweep variants.

hbm_bandwidth.py showed raw read bandwidth far above the kernel's 63 GiB/s
effective — so the fused kernel is COMPUTE- or WRITE-bound, not
bandwidth-bound.  This sweep isolates the stages with stripped-down kernels
over the same [1M, 384] bf16 bank at B=512:

  matmul_only_acc    MXU matmul, accumulate max into one [B,128] block
                     (1 MB of writes)  -> the read+matmul floor
  matmul_only_wide   same matmul, write [B,128] per tile (the production
                     output layout, 256 MiB of writes) -> + write cost
  encode_level1      + packed encode + per-lane top-2 reduction, one
                     accumulated output block -> + level-1 cost
  full_two_level     the production kernel (encode + level-1 + per-tile
                     level-2 k picks + wide writes)
  full_kpass         the production k-pass packed kernel

plus sub-batch variants (B block 256/512) of the production kernel.  The
deltas attribute time to matmul/read, writes, level-1, and level-2, and
decide where optimization effort goes.

Usage (TPU): python benchmarks/kernel_sweep.py
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


def time_op(fn, *args, steps=10):
    import jax

    for _ in range(2):
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    outs = [fn(*args) for _ in range(steps)]
    jax.block_until_ready(outs)
    np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
    return (time.time() - t0) / steps


def _matmul(q_ref, e_ref):
    import jax
    import jax.numpy as jnp

    return jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype), e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_matmul_only_acc(b, d, tile_n, num_tiles):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, e_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.full_like(out_ref, -1e30)

        scores = _matmul(q_ref, e_ref)
        # cheap per-tile fold so nothing is dead: running max of the first
        # 128 columns
        out_ref[:] = jnp.maximum(out_ref[:], scores[:, :128])

    @jax.jit
    def run(q, e):
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 128), jnp.float32),
        )(q, e)

    return run


def make_matmul_only_wide(b, d, tile_n, num_tiles):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, e_ref, out_ref):
        scores = _matmul(q_ref, e_ref)
        out_ref[:] = scores[:, :128]

    @jax.jit
    def run(q, e):
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 128), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, num_tiles * 128), jnp.float32),
        )(q, e)

    return run


def make_encode_level1(b, d, tile_n, num_tiles):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = 128
    groups = tile_n // lanes

    def kernel(q_ref, e_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        scores = _matmul(q_ref, e_ref)
        # round-4 3-pass encode (matches _topk_tile_kernel_packed): shift
        # add + lane-clear AND + row-broadcast OR; no [B, TILE] iota.
        lane_row = (
            jnp.int32(2047)
            - jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
        )
        shifted = scores + 2.0
        bits = pltpu.bitcast(shifted, jnp.int32) & jnp.int32(~0x7FF)
        packed = bits | lane_row
        m1 = packed[:, :lanes]
        m2 = jnp.zeros_like(m1)
        for g in range(1, groups):
            s = packed[:, g * lanes : (g + 1) * lanes]
            m2 = jnp.maximum(m2, jnp.minimum(m1, s))
            m1 = jnp.maximum(m1, s)
        red = jnp.concatenate([m1, m2], axis=1)  # [B, 256]
        out_ref[:] = jnp.maximum(out_ref[:], red)  # fold so nothing is dead

    @jax.jit
    def run(q, e):
        return pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 256), jnp.int32),
        )(q, e)

    return run


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    import hcrag_tpu.ops.topk_pallas as tp
    from hcrag_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"backend={jax.default_backend()}")

    N, D, B, K = 1_000_000, 384, 512, 10
    TILE = 2048
    n_pad = ((N + TILE - 1) // TILE) * TILE
    num_tiles = n_pad // TILE
    rng = np.random.default_rng(7)
    with timed("gen"):
        E = rng.standard_normal((n_pad, D)).astype(np.float32)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        Q = rng.standard_normal((B, D)).astype(np.float32)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    d_e = jax.device_put(jnp.asarray(E.astype(ml_dtypes.bfloat16)))
    d_q = jax.device_put(jnp.asarray(Q))
    d_mask = jax.device_put(jnp.ones(n_pad, bool))
    with timed("residency"):
        np.asarray(jnp.sum(d_e[:, -1].astype(jnp.float32)))
        np.asarray(jnp.sum(d_q))

    results = {}

    def run(label, fn, *args, steps=10):
        dt = time_op(fn, *args, steps=steps)
        results[label] = round(1000 * dt, 3)
        log(f"[{label}] {1000*dt:.2f} ms ({B/dt:.0f} QPS-equivalent)")

    run("matmul_only_acc", make_matmul_only_acc(B, D, TILE, num_tiles),
        d_q, d_e)
    run("matmul_only_wide", make_matmul_only_wide(B, D, TILE, num_tiles),
        d_q, d_e)
    run("encode_level1", make_encode_level1(B, D, TILE, num_tiles),
        d_q, d_e)
    run("full_two_level", functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=TILE, packed_select=True,
        merge_k=32, two_level=True), d_q, d_e, d_mask)
    run("full_kpass", functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=TILE, packed_select=True,
        merge_k=32, two_level=False), d_q, d_e, d_mask)
    run("full_exact_kernel", functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=TILE, packed_select=False,
        merge_k=32), d_q, d_e, d_mask)

    # sub-batch variant: two 256-query blocks
    half = B // 2
    two_level_half = functools.partial(
        tp.pallas_cosine_top_k, top_k=K, tile_n=TILE, packed_select=True,
        merge_k=32, two_level=True)

    @jax.jit
    def run_half(q, e, m):
        v1, i1 = two_level_half(q[:half], e, m)
        v2, i2 = two_level_half(q[half:], e, m)
        return jnp.concatenate([v1, v2]), jnp.concatenate([i1, i2])

    run("two_level_2x256", run_half, d_q, d_e, d_mask)

    print(json.dumps(results))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results.json")
    data = json.load(open(out)) if os.path.exists(out) else {}
    data["kernel_stage_attribution_1M_B512"] = dict(
        results,
        note=(
            "ms/step over the 734 MiB bf16 bank.  matmul_only_acc = "
            "read+MXU floor (1 MB writes); matmul_only_wide adds the "
            "production per-tile [B,128] output writes (256 MiB); "
            "encode_level1 adds packed encode + per-lane top-2; the full "
            "kernels add per-tile level-2 selection.  Deltas attribute the "
            "gap between the kernel's 63 GiB/s effective and the measured "
            "raw bandwidth."
        ),
    )
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
