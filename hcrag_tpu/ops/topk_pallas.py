"""Pallas TPU kernel: fused cosine-scores + per-tile top-k.

The hot retrieval kernel (BASELINE.json north star).  One `pallas_call`
fuses, per index tile:

  1. the MXU matmul  scores = q @ E_tile.T   (bf16 inputs, f32 accumulation)
  2. the row-validity mask (category filter / shard padding)
  3. an in-VMEM iterative top-k over the tile (k max+mask passes on the VPU)

writing only [num_tiles, B, k] candidates back to HBM — the full [B, N]
score matrix never materializes, so HBM traffic is E (read once) plus the
tiny candidate tensor, instead of E + 4*B*N bytes for the unfused
matmul->top_k pipeline.  A final `lax.top_k` over the `num_tiles * k`
survivors (XLA, negligible) produces the global result.

Tiling: index rows padded to TILE_N (2048 default; E tile bf16 = 1.5 MB,
scores f32 B x TILE_N), D must be a multiple of 128 (384 = 3 x 128 for
MiniLM).  Tie-breaking matches the rest of the framework: lowest global
index wins (argmax returns the first maximum; tiles are scanned in
ascending-row order and the final merge is position-stable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _topk_tile_kernel(
    q_ref, e_ref, mask_ref, vals_ref, idxs_ref, *, k: int, k_pad: int
):
    """One grid step: score a [TILE_N, D] tile against q [B, D] and emit the
    tile's top-k per query into a lane-aligned [B, k_pad] candidate block."""
    tile = pl.program_id(0)
    tile_n = e_ref.shape[0]
    b = q_ref.shape[0]

    # MXU: [B, D] x [D, TILE_N] -> [B, TILE_N] with f32 accumulation.  For an
    # f32 index, HIGHEST precision (3-pass bf16 decomposition) makes scores
    # bit-exact vs f32 brute force; Mosaic rejects HIGHEST for bf16 operands,
    # where default single-pass precision is already input-exact.
    precision = (
        jax.lax.Precision.HIGHEST
        if e_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # Row-masking as a broadcast ADD instead of compare+select: one VPU pass
    # over [B, TILE] against two, and the [1, TILE] offset row is a
    # negligible row op.  NEG_INF + score (|score| <= 1) stays ~NEG_INF, so
    # ordering and the NEG_INF filler contract are unchanged.
    offs_row = jnp.where(mask_ref[0, :] != 0, 0.0, NEG_INF)[None, :]
    scores = scores + offs_row

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    base = tile * tile_n

    # k static max+mask selection passes (unrolled; k is small); each pick
    # stores its column directly into the output refs (fillers written
    # once) — where-accumulator chains pile up Mosaic stack temporaries at
    # large k (see _packed_two_level_select).
    vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
    idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
    for j in range(k):
        best = jnp.max(scores, axis=1)  # [B]
        # First-occurrence argmax for deterministic lowest-index ties.
        is_best = scores == best[:, None]
        first_best = jnp.min(jnp.where(is_best, col_ids, tile_n), axis=1)
        vals_ref[:, j] = best
        idxs_ref[:, j] = first_best + base
        # Mask out the chosen column.
        scores = jnp.where(col_ids == first_best[:, None], NEG_INF, scores)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lane_depth(k: int) -> int:
    """Per-lane candidates kept by the two-level reduction.  A slot is lost
    only when > lane_depth of a tile's true top-k share one 128-lane column;
    expected collisions ~ C(k, T+1)/128^T stay negligible with T=2 up to
    k=16, T=4 to k=48, T=8 to k=128."""
    if k <= 16:
        return 2
    if k <= 48:
        return 4
    return 8


def _plane_picks(m, base, vals_ref, idxs_ref, *, k: int, t: int):
    """Level-2 picks over per-lane reduction planes `m` (t x [B, 128] int32,
    per-lane sorted: m[0] >= m[1] >= ...).  Shared by the packed two-level
    and fused-encode selects — see `_packed_two_level_select` for the
    exactness story.  Writes picks as direct column stores."""
    vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
    idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
    for j in range(k):
        best = jnp.max(m[0], axis=1)
        lane = jnp.int32(2047) - (best & jnp.int32(0x7FF))
        val = pltpu.bitcast(
            (best & jnp.int32(~0x7FF))[:, None], jnp.float32
        )[:, 0] - 2.0
        # > 0, not != 0: masked-out columns pack to NEGATIVE int32 (their
        # shifted score is negative — see the encode), empty slots to 0.
        valid = best > 0
        vals_ref[:, j] = jnp.where(valid, val, NEG_INF)
        idxs_ref[:, j] = jnp.where(valid, lane + base, -1)
        picked = m[0] == best[:, None]
        for i in range(t - 1):
            m[i] = jnp.where(picked, m[i + 1], m[i])
        m[t - 1] = jnp.where(picked, jnp.int32(0), m[t - 1])


def _fused_two_level_select(
    group_packed, groups: int, base, vals_ref, idxs_ref, *, k: int, t: int
):
    """Fused encode + two-level selection (round 5).

    `group_packed(g)` returns the PACKED int32 [B, 128] scores of lane
    group `g` — the encode happens per group INSIDE the streaming
    reduction, so the full-width [B, TILE_N] packed copy of
    `_packed_two_level_select` never materializes.  That removes an int32
    VMEM buffer the size of the score matrix (4 bytes/element — the
    difference between tile 1024 and tile 2048 for the int8 kernel, whose
    footprint also drops the full-width f32 rescale copy) and the
    corresponding full-width write+read VPU traffic.

    `t` is the per-lane candidate depth (`_lane_depth(k)` by default).
    t=1 keeps only the best row per 128-lane column per tile — safe
    exactly like the t=2 path is safe, just with tighter odds: a TRUE
    top-k row is lost only when a better same-tile row shares its lane
    (expected ~(rows better than it in its tile)/128; for a globally
    top-k row on exchangeable data that count is << 1 at many tiles).
    Callers must gate t < _lane_depth(k) on an exact rescore + a recall
    gate, same contract as `two_level` itself (`_resolve_two_level`)."""
    m = [group_packed(0)] + [
        jnp.zeros(vals_ref.shape[:1] + (128,), jnp.int32)
        for _ in range(t - 1)
    ]
    for g in range(1, groups):
        s = group_packed(g)
        for i in range(t):
            hi = jnp.maximum(m[i], s)
            s = jnp.minimum(m[i], s)
            m[i] = hi
    _plane_picks(m, base, vals_ref, idxs_ref, k=k, t=t)


def _packed_two_level_select(
    packed_scores, base, vals_ref, idxs_ref, *, k: int
):
    """Two-level selection over a packed [B, TILE_N] score matrix.

    Level 1 (one streamed pass over the tile): per-lane top-T across the
    TILE_N/128 column groups (T = `_lane_depth(k)`) — a 2T-op bubble insert
    per group over [B, 128], independent of k.  Level 2: the k picks run
    over the T [B, 128] reduction planes via plane promotion, instead of k
    full-width max+mask passes.

    Exactness: packed values carry (score bits | 2047-lane), so per-lane
    maxima preserve scores, original column ids, and lowest-index
    tie-breaking.  The reduction keeps at most T candidates per lane
    column; a result slot is wrong only when > T of the tile's true top-k
    share one lane (~C(k, T+1)/128^T per tile on exchangeable data — e.g.
    ~1e-3 at k=10/T=2, ~3e-5 at k=100/T=8, and only affects the global
    result when the lost candidate was globally top-k).  Callers gate this
    path on a following exact rescore; the non-packed kernels remain the
    bit-exact option.

    Level-2 picks run over plane 0 ONLY ([B, 128]): the per-lane sorted
    invariant m[0] >= m[1] >= ... makes max(m[0]) the global max, packed
    lane bits make cross-lane ties impossible (the pick hits exactly one
    lane), and shifting the lane's remaining planes up restores the
    invariant — 1/groups of the per-pick VPU work of full-width masking.

    Results are written DIRECTLY to the output refs, one column store per
    pick (round 4): the old [B, k_pad] where-accumulator chain both cost 2
    extra VPU passes per pick and — at k=100, B=512 — blew Mosaic's scoped
    VMEM stack (57 MB of unreused unroll temporaries; compile error).
    """
    b, tile_n = packed_scores.shape
    lanes = 128
    groups = tile_n // lanes
    t = _lane_depth(k)
    _fused_two_level_select(
        lambda g: packed_scores[:, g * lanes : (g + 1) * lanes],
        groups, base, vals_ref, idxs_ref, k=k, t=t,
    )


def _super_insert(
    packed, m_refs, *, t: int
):
    """Streaming per-lane top-T bubble insert of one subtile's packed scores
    into the supertile's VMEM accumulator planes (`m_refs`, T x [B, 128]
    int32 scratch that persists across the sequential inner grid axis)."""
    b, tile_n = packed.shape
    lanes = 128
    m = [r[:] for r in m_refs]
    for g in range(tile_n // lanes):
        s = packed[:, g * lanes : (g + 1) * lanes]
        for i in range(t):
            hi = jnp.maximum(m[i], s)
            s = jnp.minimum(m[i], s)
            m[i] = hi
    for i, r in enumerate(m_refs):
        r[:] = m[i]


def _super_finalize(
    m_refs, base, vals_ref, idxs_ref, *, k: int, lbits: int, t: int
):
    """Level-2 picks over the supertile's accumulator planes, writing the
    supertile's top-k as ROW-major candidates (vals_ref/idxs_ref are
    [k_sub, B] — each pick is one contiguous sublane-row store, and the
    output block is ~k/128 the size of the lane-padded [B, 128] layout).
    Same promotion scheme as `_packed_two_level_select`, with an
    `lbits`-wide lane field (supertiles span up to 8192 rows -> 13 bits;
    score quantization 2^-10 relative, nullified by the exact rescore).

    `k` here is the PICK count — callers pass the full padded block height
    (k_sub = round_up(true_k, 8)): the extra picks are free write-wise (the
    block rows exist anyway) and give the merge pool a safety margin
    against packed-quantization ties at the per-supertile top-k boundary
    (a true top-k row that quantizes equal to >= (k_sub - true_k + 1)
    lower-index rows of its supertile would otherwise drop).

    Plane promotion goes through the SCRATCH REFS (read-modify-write per
    pick) rather than SSA value chains: unrolled where-chains over live
    values pile up Mosaic stack temporaries (the round-4 k=100 OOM), and
    the refs bound the live set to the planes themselves."""
    vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
    idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
    for j in range(k):
        m0 = m_refs[0][:]
        best = jnp.max(m0, axis=1)  # [B]
        lane = jnp.int32(lbits - 1) - (best & jnp.int32(lbits - 1))
        val = pltpu.bitcast(
            (best & jnp.int32(~(lbits - 1)))[:, None], jnp.float32
        )[:, 0] - 2.0
        valid = best > 0
        vals_ref[j, :] = jnp.where(valid, val, NEG_INF)
        idxs_ref[j, :] = jnp.where(valid, lane + base, -1)
        picked = m0 == best[:, None]
        for i in range(t - 1):
            m_refs[i][:] = jnp.where(picked, m_refs[i + 1][:], m_refs[i][:])
        m_refs[t - 1][:] = jnp.where(picked, jnp.int32(0), m_refs[t - 1][:])


def _super_lane_depth(k: int, spt: int) -> int:
    """Accumulator planes for the supertile path: one more than the
    single-tile bound when the supertile spans >= 4 tiles.  A row drops only
    when > T better rows share its 128-lane column WITHIN ONE SUPERTILE;
    wider supertiles hold more same-lane rows (64 at the 8192 maximum), so
    the extra plane cubes the collision odds for ~2 extra VPU ops/group."""
    return _lane_depth(k) + (1 if spt >= 4 else 0)


def _super_select_step(
    scores, mask_ref, vals_ref, idxs_ref, m_refs, *, k: int, spt: int,
    lbits: int,
):
    """Shared supertile body (float + int8 kernels): encode this subtile's
    f32 scores into packed (score | lane) ints, fold them into the
    accumulator planes, and on the supertile's LAST subtile run the level-2
    picks + the single per-supertile candidate write.

    Why: per-tile level-2 picks and the lane-padded [B, 128] candidate
    writes are the dominant non-matmul cost at large N (round-4
    `kernel_stage_attribution_1M_B512`; at 10M rows the per-tile candidate
    blocks alone are ~5 GB of HBM writes per 512-query sub-batch).  Grouping
    `spt` subtiles into one supertile divides both by `spt` at the cost of a
    wider lane field (coarser packed-score quantization — rescore-gated
    paths only)."""
    j = pl.program_id(1)
    sup = pl.program_id(0)
    b, tile_n = scores.shape
    t = len(m_refs)

    @pl.when(j == 0)
    def _init():
        for r in m_refs:
            r[:] = jnp.zeros(r.shape, jnp.int32)

    # Encode: same 3-pass scheme as `_topk_tile_kernel_packed`, with the
    # lane field widened to the SUPERTILE column (j * tile_n + iota).
    offs_row = jnp.where(mask_ref[0, :] != 0, 2.0, -3.0)[None, :]
    lane_row = (
        jnp.int32(lbits - 1)
        - j * tile_n
        - jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    )
    shifted = scores + offs_row
    bits = pltpu.bitcast(shifted, jnp.int32) & jnp.int32(~(lbits - 1))
    packed = bits | lane_row
    _super_insert(packed, m_refs, t=t)

    @pl.when(j == spt - 1)
    def _fin():
        _super_finalize(
            m_refs, sup * lbits, vals_ref, idxs_ref, k=k, lbits=lbits, t=t
        )


def _topk_tile_kernel_packed_super(
    q_ref, e_ref, mask_ref, vals_ref, idxs_ref, *m_refs, k: int, spt: int,
    lbits: int,
):
    """Supertile variant of `_topk_tile_kernel_packed`: grid is
    (num_supertiles, spt); E subtiles stream on the inner axis while the
    per-lane top-T planes accumulate in scratch; selection + candidate
    writes happen once per supertile (see `_super_select_step`)."""
    precision = (
        jax.lax.Precision.HIGHEST
        if e_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    _super_select_step(
        scores, mask_ref, vals_ref, idxs_ref, m_refs, k=k, spt=spt,
        lbits=lbits,
    )


def _topk_tile_kernel_int8_super(
    q_ref, q_scale_ref, e_ref, e_scale_ref, mask_ref, vals_ref, idxs_ref,
    *m_refs, k: int, spt: int, lbits: int,
):
    """Supertile variant of the packed int8 kernel."""
    int_scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = (
        int_scores.astype(jnp.float32)
        * q_scale_ref[:, 0][:, None]
        * e_scale_ref[0, :][None, :]
    )
    _super_select_step(
        scores, mask_ref, vals_ref, idxs_ref, m_refs, k=k, spt=spt,
        lbits=lbits,
    )


def _merge_super_candidates(vals_t, idxs_t, b, num_super, k_sub, k, merge_k,
                            *, interpret: bool = False):
    """Cross-supertile merge of ROW-major candidate blocks.

    Inputs are [num_super * k_sub, b_pad]; every block row is a live pick
    (the kernel fills the full k_sub block — see `_super_finalize`).
    Transposes slot-major ([b, k_sub, num_super] — same lane-spread
    argument as `_merge_tile_candidates`) and runs the packed candidate
    merge for large pools / `lax.top_k` for small ones."""
    v = vals_t.reshape(num_super, k_sub, -1)   # [S, k_sub, b_pad]
    i = idxs_t.reshape(num_super, k_sub, -1)
    v = jnp.transpose(v, (2, 1, 0))[:b].reshape(b, -1)  # [b, k_sub * S]
    i = jnp.transpose(i, (2, 1, 0))[:b].reshape(b, -1)
    out_k = min(max(k, merge_k), num_super * k_sub)
    # Packed-merge threshold is LOWER than `_merge_tile_candidates`' (2*2048):
    # supertile pools are ~num_tiles*k/8 the per-tile pool, and the XLA sort
    # over even a [512, ~2k] pool costs ~2 ms/sub-batch — the packed VPU
    # merge does the same selection in a fraction.
    if out_k <= 128 and b <= 512 and num_super * k_sub >= 1024:
        return _packed_candidate_merge(v, i, out_k, interpret)
    out_v, pos = jax.lax.top_k(v, out_k)
    out_i = jnp.take_along_axis(i, pos, axis=1)
    return out_v, out_i


def _resolve_super_tiles(super_tiles: int, tile_n: int, n_pad_tiles: int,
                         two_level: bool, packed_select: bool) -> int:
    """Clamp a requested supertile factor to a legal, useful power of two.

    Supertiles require the packed two-level path (the accumulator planes ARE
    the level-1 reduction) and an lbits = spt * tile_n lane field <= 8192
    (13 bits stolen from the f32 mantissa -> 2^-10 relative score
    quantization, acceptable only under an exact rescore — callers gate).
    Also clamped to the tile count so tiny indexes don't pay padding."""
    if super_tiles <= 1 or not (two_level and packed_select):
        return 1
    spt = 1 << (int(super_tiles).bit_length() - 1)  # floor power of two
    while spt > 1 and spt * tile_n > 8192:
        spt //= 2
    while spt > 1 and spt > n_pad_tiles:
        spt //= 2
    return spt


def _use_two_level(k: int, tile_n: int) -> bool:
    """Two-level selection pays off while k x full-width passes dominate the
    streamed per-lane reduction, and stays accurate while k <= 128 at the
    `_lane_depth(k)` candidates/lane (see `_packed_two_level_select`)."""
    return k <= 128 and tile_n >= 256 and tile_n % 128 == 0


def _resolve_two_level(two_level, k: int, tile_n: int) -> bool:
    """Resolve the caller's `two_level` request against the shape guard.

    `two_level` is a STATIC kernel-selection argument (it changes the traced
    program, so monkeypatching `_use_two_level` after a jit cache fill has no
    effect — the strategy must flow through the jit signature).  Semantics:
    None = auto (shape-feasible), True = request (still shape-guarded),
    False = force the exhaustive k-pass loop.  Callers that do NOT follow the
    selection with an exact rescore must pass False: the per-lane top-2
    reduction can drop a true top-k row when >=3 of a tile's top-k share one
    128-lane column.  Note the rescore does NOT recover such a drop — it
    only re-ranks the fetched candidate pool (nullifying the packed
    encoding's ~2^-11 score rounding); a row dropped at tile level is gone.
    Safety against drops is probabilistic (the >=3-per-lane collision odds
    are tiny at tile_n>=256) and ENFORCED by the bench recall gate, so
    two-level stays restricted to rescored paths where the gate watches it.
    """
    feasible = _use_two_level(k, tile_n)
    if two_level is None:
        return feasible
    return bool(two_level) and feasible


def _topk_tile_kernel_packed(
    q_ref, e_ref, mask_ref, vals_ref, idxs_ref, *, k: int, k_pad: int,
    two_level: bool, lane_t: int = 0,
):
    """Packed-select variant: score bits and the lane index share one uint32,
    so each selection pass is a single max-reduce + one mask op (vs
    max + eq + min-index + mask in the exact kernel) — ~2x fewer VPU passes.

    Encoding: scores lie in [-1-eps, 1+eps]; score+2 is positive, so its f32
    bit pattern is monotone.  The low 11 bits are replaced by (2047 - lane),
    making ties resolve to the LOWEST index under max.  Costs ~2^-11 relative
    score quantization (comparable to bf16 input rounding); use the exact
    kernel when bit-exact scores matter.
    """
    tile = pl.program_id(0)
    tile_n = e_ref.shape[0]
    b = q_ref.shape[0]

    precision = (
        jax.lax.Precision.HIGHEST
        if e_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jax.lax.dot_general(
        q_ref[:].astype(e_ref.dtype),
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # int32 packing: VALID packed values are positive (score+2 in [1, 3.2]
    # has a zero sign bit), and Mosaic reduces int32 natively (uint32
    # reductions are unimplemented).
    #
    # The encode is the round-4 hot spot (it runs over every [B, TILE]
    # element), so it is exactly three full-width VPU passes:
    #   1. `scores + offs_row`  — the +2 positivity shift AND the validity
    #      mask in one broadcast add: invalid columns get -3, landing in
    #      [-4, -2], whose f32 bit pattern bitcasts to a NEGATIVE int32 —
    #      below every valid packed value under signed max, no
    #      compare+select pass needed.  (Validity checks are `best > 0`:
    #      invalid columns are negative, empty two-level slots are 0.)
    #   2. the AND clearing the 11 lane bits (bitcast is a free type pun);
    #   3. the OR of the [1, TILE] lane row — broadcast of a row iota, so
    #      no [B, TILE] iota is ever materialized.
    base = tile * tile_n
    if two_level:
        # Round-5 fused path: encode PER 128-LANE GROUP inside the
        # streaming reduction — the full-width [B, TILE] packed int32 copy
        # never materializes (see `_fused_two_level_select`).  Mosaic
        # layout rule learned the hard way: a [1, 128] SLICE of a computed
        # full-width value cannot be re-broadcast (vpad layout error), but
        # a FRESH [1, 128] value loaded from the mask ref broadcasts fine,
        # and the lane ids come from a [B, 128] iota per group.

        def group_packed(g):
            sl = slice(g * 128, (g + 1) * 128)
            offs = jnp.where(mask_ref[0, sl] != 0, 2.0, -3.0)[None, :]
            s = scores[:, sl] + offs
            bits = pltpu.bitcast(s, jnp.int32) & jnp.int32(~0x7FF)
            lane = jnp.int32(2047 - g * 128) - jax.lax.broadcasted_iota(
                jnp.int32, (b, 128), 1
            )
            return bits | lane

        _fused_two_level_select(
            group_packed, tile_n // 128, base, vals_ref, idxs_ref,
            k=k, t=(lane_t or _lane_depth(k)),
        )
        return

    offs_full = jnp.where(mask_ref[0, :] != 0, 2.0, -3.0)[None, :]
    lane_row = (
        jnp.int32(2047)
        - jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    )
    shifted = scores + offs_full
    bits = pltpu.bitcast(shifted, jnp.int32) & jnp.int32(~0x7FF)
    packed = bits | lane_row

    vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
    idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
    for j in range(k):
        best = jnp.max(packed, axis=1)  # [b] single reduce
        lane = jnp.int32(2047) - (best & jnp.int32(0x7FF))
        val = pltpu.bitcast(
            (best & jnp.int32(~0x7FF))[:, None], jnp.float32
        )[:, 0] - 2.0
        valid = best > 0  # masked columns are negative, empty slots 0
        vals_ref[:, j] = jnp.where(valid, val, NEG_INF)
        idxs_ref[:, j] = jnp.where(valid, lane + base, -1)
        packed = jnp.where(packed == best[:, None], jnp.int32(0), packed)


def _topk_tile_kernel_int8(
    q_ref,        # [B, D] int8
    q_scale_ref,  # [B, 1] f32
    e_ref,        # [TILE, D] int8
    e_scale_ref,  # [1, TILE] f32
    mask_ref,     # [1, TILE] int32
    vals_ref,
    idxs_ref,
    *,
    k: int,
    k_pad: int,
    packed: bool = False,
    two_level: bool = False,
    lane_t: int = 0,
):
    """Int8 variant: MXU int8xint8->int32 matmul + rank-1 rescale + the same
    in-VMEM iterative top-k.  Index bytes halve vs bf16 (the E read is the
    throughput floor at large N)."""
    tile = pl.program_id(0)
    tile_n = e_ref.shape[0]
    b = q_ref.shape[0]

    int_scores = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, TILE]
    base = tile * tile_n
    qs_col = q_scale_ref[:, 0][:, None]

    if packed and two_level:
        # Round-5 fused path: the rank-1 rescale AND the packed encode run
        # per 128-lane group inside the streaming reduction — neither the
        # full-width f32 score copy nor the packed int32 copy materializes,
        # so the kernel's per-element VMEM need drops from 8 to 4 bytes
        # (int_scores only) and the tile can stay at 2048 (vs 1024)
        # — half the per-tile fixed cost and half the merge pool at 10M.
        def group_packed(g):
            # Fresh [1, 128] loads from the scale/mask refs per group —
            # slices of computed full-width values cannot be re-broadcast
            # (Mosaic vpad layout error; see _topk_tile_kernel_packed).
            sl = slice(g * 128, (g + 1) * 128)
            offs = jnp.where(mask_ref[0, sl] != 0, 2.0, -3.0)[None, :]
            s = (
                int_scores[:, sl].astype(jnp.float32)
                * qs_col
                * e_scale_ref[0, sl][None, :]
                + offs
            )
            bits = pltpu.bitcast(s, jnp.int32) & jnp.int32(~0x7FF)
            lane = jnp.int32(2047 - g * 128) - jax.lax.broadcasted_iota(
                jnp.int32, (b, 128), 1
            )
            return bits | lane

        _fused_two_level_select(
            group_packed, tile_n // 128, base, vals_ref, idxs_ref,
            k=k, t=(lane_t or _lane_depth(k)),
        )
        return

    scores = (
        int_scores.astype(jnp.float32)
        * qs_col
        * e_scale_ref[0, :][None, :]
    )

    if packed:
        # Packed selection (see _topk_tile_kernel_packed, incl. the 3-pass
        # encode: mask folded into the positivity shift, lane bits OR'd from
        # a [1, TILE] row): the int8 scores already carry >=
        # quantization-level noise, so the 2^-11 packed rounding is free
        # here and selection halves to one reduce per pick.
        offs_row = jnp.where(mask_ref[0, :] != 0, 2.0, -3.0)[None, :]
        lane_row = (
            jnp.int32(2047)
            - jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
        )
        shifted = scores + offs_row
        bits = pltpu.bitcast(shifted, jnp.int32) & jnp.int32(~0x7FF)
        packed_scores = bits | lane_row
        vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
        idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
        for j in range(k):
            best = jnp.max(packed_scores, axis=1)
            lane = jnp.int32(2047) - (best & jnp.int32(0x7FF))
            val = pltpu.bitcast(
                (best & jnp.int32(~0x7FF))[:, None], jnp.float32
            )[:, 0] - 2.0
            valid = best > 0  # masked columns negative, empty slots 0
            vals_ref[:, j] = jnp.where(valid, val, NEG_INF)
            idxs_ref[:, j] = jnp.where(valid, lane + base, -1)
            packed_scores = jnp.where(
                packed_scores == best[:, None], jnp.int32(0), packed_scores
            )
        return

    # Mask as a broadcast add (see _topk_tile_kernel): one pass, not two.
    scores = scores + jnp.where(mask_ref[0, :] != 0, 0.0, NEG_INF)[None, :]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
    vals_ref[:] = jnp.full(vals_ref.shape, NEG_INF, jnp.float32)
    idxs_ref[:] = jnp.full(idxs_ref.shape, -1, jnp.int32)
    for j in range(k):
        best = jnp.max(scores, axis=1)
        is_best = scores == best[:, None]
        first_best = jnp.min(jnp.where(is_best, col_ids, tile_n), axis=1)
        vals_ref[:, j] = best
        idxs_ref[:, j] = first_best + base
        scores = jnp.where(col_ids == first_best[:, None], NEG_INF, scores)


@functools.partial(
    jax.jit,
    static_argnames=(
        "top_k", "tile_n", "interpret", "packed_select", "merge_k",
        "two_level", "super_tiles", "lane_t",
    ),
)
def pallas_cosine_top_k_int8(
    query_emb: jnp.ndarray,   # [B, D] f32 (normalized)
    e_int8: jnp.ndarray,      # [N, D] int8
    e_scale: jnp.ndarray,     # [N] f32
    valid_mask: jnp.ndarray,  # [N] bool
    top_k: int,
    *,
    tile_n: int = 2048,
    interpret: bool = False,
    packed_select: bool = False,
    merge_k: int = 0,
    two_level: bool | None = None,
    super_tiles: int = 1,
    lane_t: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused int8 cosine + top-k (see `_topk_tile_kernel_int8`).

    `merge_k > top_k` oversamples at the FINAL MERGE only: each tile still
    selects `top_k` candidates (the in-kernel unrolled selection is linear in
    k, so oversampling there is expensive), but the cross-tile merge keeps
    the best `merge_k` of the `num_tiles * top_k` candidate pool.  Used by
    the engine's exact-rescore refinement; surplus slots beyond the candidate
    pool come back as (NEG_INF, -1) fillers.

    `two_level` selects the approximate per-lane top-2 tile reduction
    (see `_resolve_two_level`): None = auto when shape-feasible, False =
    exhaustive k-pass loop.  Callers without a following exact rescore MUST
    pass False — two-level can drop a true top-k row on >=3-per-lane
    collisions, and a drop is permanent (the rescore only re-ranks the
    fetched pool; see `_resolve_two_level` for the actual safety story)."""
    from hcrag_tpu.ops.quantize import quantize_queries

    b, d = query_emb.shape
    n = e_int8.shape[0]
    assert d % 128 == 0
    assert not (packed_select and tile_n > 2048), "packed lane field is 11 bits"
    k = min(top_k, n)
    assert k <= 128, (
        f"per-tile candidate blocks are 128-wide (k={k}); selection"
        " beyond 128 per tile would silently truncate — raise tile"
        " candidate width or use the streaming XLA path"
    )

    tl = _resolve_two_level(two_level, k, tile_n)
    spt = _resolve_super_tiles(
        super_tiles, tile_n, -(-n // tile_n), tl, packed_select
    )
    if spt > 1:
        lbits = spt * tile_n
        n_pad = _round_up(n, lbits)
        if n_pad != n:
            e_int8 = jnp.pad(e_int8, ((0, n_pad - n), (0, 0)))
            e_scale = jnp.pad(e_scale, (0, n_pad - n))
            valid_mask = jnp.pad(valid_mask, (0, n_pad - n))
        num_super = n_pad // lbits
        mask_2d = valid_mask.astype(jnp.int32).reshape(1, n_pad)
        scale_2d = e_scale.astype(jnp.float32).reshape(1, n_pad)
        b_pad = _round_up(b, 128)  # candidate blocks are [k_sub, B]: B lanes
        if b_pad != b:
            query_emb = jnp.pad(query_emb, ((0, b_pad - b), (0, 0)))
        qi, qs = quantize_queries(query_emb.astype(jnp.float32))
        k_sub = _round_up(k, 8)
        if merge_k > num_super * k_sub:  # small-pool oversample (see below)
            k_sub = min(128, _round_up(-(-merge_k // num_super), 8))
        kernel = functools.partial(
            _topk_tile_kernel_int8_super, k=k_sub, spt=spt, lbits=lbits,
        )
        vals, idxs = pl.pallas_call(
            kernel,
            grid=(num_super, spt),
            in_specs=[
                pl.BlockSpec((b_pad, d), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i, j: (i * spt + j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, i * spt + j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, i * spt + j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k_sub, b_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_sub, b_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_super * k_sub, b_pad), jnp.float32),
                jax.ShapeDtypeStruct((num_super * k_sub, b_pad), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_pad, 128), jnp.int32)
                for _ in range(_super_lane_depth(k, spt))
            ],
            interpret=interpret,
        )(qi, qs.reshape(b_pad, 1), e_int8, scale_2d, mask_2d)
        return _merge_super_candidates(
            vals, idxs, b, num_super, k_sub, k, merge_k, interpret=interpret
        )

    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        e_int8 = jnp.pad(e_int8, ((0, n_pad - n), (0, 0)))
        e_scale = jnp.pad(e_scale, (0, n_pad - n))
        valid_mask = jnp.pad(valid_mask, (0, n_pad - n))
    num_tiles = n_pad // tile_n
    mask_2d = valid_mask.astype(jnp.int32).reshape(1, n_pad)
    scale_2d = e_scale.astype(jnp.float32).reshape(1, n_pad)
    k_pad = 128
    b_pad = _round_up(b, 32)  # int8 sublane multiple
    if b_pad != b:
        query_emb = jnp.pad(query_emb, ((0, b_pad - b), (0, 0)))
    qi, qs = quantize_queries(query_emb.astype(jnp.float32))

    if packed_select and merge_k > k and num_tiles * k < merge_k:
        # Small-pool oversample (see the float wrapper): packed quantization
        # ties at the top-k boundary need rescore-pool coverage >= merge_k.
        k = min(k_pad, tile_n, -(-merge_k // num_tiles))
    kernel = functools.partial(
        _topk_tile_kernel_int8, k=k, k_pad=k_pad, packed=packed_select,
        two_level=tl, lane_t=lane_t,
    )
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    vals, idxs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(qi, qs.reshape(b_pad, 1), e_int8, scale_2d, mask_2d)

    return _merge_tile_candidates(
        vals, idxs, b, num_tiles, k_pad, k, merge_k,
        packed_merge=packed_select, interpret=interpret,
    )


def _merge_vals_kernel(v_ref, vals_ref, idxs_ref, *, k: int, k_pad: int):
    """Per-2048-column tile of the CANDIDATE matrix: pack value+position and
    run the two-level select.  Fillers arrive as NEG_INF values, whose
    shifted bit pattern is negative — they lose every signed max and decode
    back to (NEG_INF, -1) via the `best > 0` validity check."""
    tile = pl.program_id(0)
    tile_n = v_ref.shape[1]
    lane_row = (
        jnp.int32(2047)
        - jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    )
    shifted = v_ref[:] + 2.0
    bits = pltpu.bitcast(shifted, jnp.int32) & jnp.int32(~0x7FF)
    packed = bits | lane_row
    _packed_two_level_select(packed, tile * tile_n, vals_ref, idxs_ref, k=k)


def _packed_candidate_merge(v, i, out_k, interpret):
    """Pallas replacement for the `lax.top_k` candidate merge on the PACKED
    path (round-4: the XLA merge sort measured 2.5 ms of the 10 ms fused
    step at 1M/B=512 — benchmarks/merge_micro.py; this kernel does the same
    selection in VPU passes).

    Selects candidate POSITIONS by packed two-level reduction over
    2048-wide column tiles of the value matrix, then one tiny `lax.top_k`
    over the <= num_tiles*out_k survivors, then gathers the true global
    indices.  Carries the packed path's 2^-11 value rounding (ties may
    resolve differently than a bit-exact sort), which is why only
    `packed_select` callers — whose selection already quantizes scores and
    whose engine paths follow with an exact rescore — route here."""
    b, c = v.shape
    # 1024-wide merge tiles: at B=512 a 2048 tile OOMs scoped VMEM (double-
    # buffered f32 input tile 8 MB + packed int32 copy 4 MB + candidate
    # blocks pushed 16.68 MB > the 16 MB limit — Mosaic compile error,
    # round 4).  1024 halves the input-tile and packed-copy footprint; the
    # selection work is the same total columns.
    tile_n = 1024
    c_pad = _round_up(c, tile_n)
    if c_pad != c:
        v = jnp.pad(v, ((0, 0), (0, c_pad - c)), constant_values=NEG_INF)
    num_tiles = c_pad // tile_n
    k_pad = 128
    b_pad = _round_up(b, 8)
    if b_pad != b:
        v = jnp.pad(v, ((0, b_pad - b), (0, 0)), constant_values=NEG_INF)
    kernel = functools.partial(_merge_vals_kernel, k=out_k, k_pad=k_pad)
    mv, mp = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((b_pad, tile_n), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((b_pad, k_pad), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((b_pad, k_pad), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(v)
    sv = mv[:b].reshape(b, num_tiles, k_pad)[:, :, :out_k].reshape(b, -1)
    sp = mp[:b].reshape(b, num_tiles, k_pad)[:, :, :out_k].reshape(b, -1)
    out_v, opos = jax.lax.top_k(sv, min(out_k, sv.shape[1]))
    pos = jnp.take_along_axis(sp, opos, axis=1)  # position in padded v, -1 pad
    out_i = jnp.where(
        pos >= 0, jnp.take_along_axis(i, jnp.maximum(pos, 0), axis=1), -1
    )
    return out_v, out_i


def _merge_tile_candidates(
    vals, idxs, b, num_tiles, k_pad, k, merge_k,
    *, packed_merge: bool = False, interpret: bool = False,
):
    """Cross-tile merge of the per-tile candidate blocks.

    Each tile's [B, k_pad=128] block holds its top-k in slots 0..k-1 and
    (NEG_INF, -1) fillers beyond — so the merge only needs the first k slots
    of each block.  Slicing before `lax.top_k` shrinks the XLA merge from
    [B, num_tiles*128] to [B, num_tiles*k] (12.8x less sort work at k=10,
    a measurable share of the fused step at 1M rows / 489 tiles).

    `packed_merge` (packed-select callers only): route large candidate
    pools through `_packed_candidate_merge` instead of the XLA sort.  Small
    pools and the bit-exact kernels keep `lax.top_k`."""
    v = vals[:b].reshape(b, num_tiles, k_pad)[:, :, :k]
    i = idxs[:b].reshape(b, num_tiles, k_pad)[:, :, :k]
    out_k = min(max(k, merge_k), num_tiles * k)
    if (
        packed_merge
        and out_k <= 128
        and b <= 512           # VMEM: [512, 2048] f32 + packed copy
        and num_tiles * k >= 2 * 2048  # below this the XLA sort is cheap
    ):
        # Lay candidates out SLOT-MAJOR ([b, k, num_tiles]) before the
        # packed merge: tile-major order strides lanes by k, so whenever
        # gcd(k, 128) is large the per-tile MAXIMA (the population actually
        # competing for the global top) alias onto 128/gcd lanes and blow
        # the per-lane depth bound.  Slot-major puts same-slot candidates
        # in consecutive columns — spread over all 128 lanes.
        vt = v.transpose(0, 2, 1).reshape(b, -1)
        it = i.transpose(0, 2, 1).reshape(b, -1)
        return _packed_candidate_merge(vt, it, out_k, interpret)
    out_v, pos = jax.lax.top_k(v.reshape(b, -1), out_k)
    out_i = jnp.take_along_axis(i.reshape(b, -1), pos, axis=1)
    return out_v, out_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "top_k", "tile_n", "interpret", "packed_select", "merge_k",
        "two_level", "super_tiles", "lane_t",
    ),
)
def pallas_cosine_top_k(
    query_emb: jnp.ndarray,
    index_emb: jnp.ndarray,
    valid_mask: jnp.ndarray,
    top_k: int,
    *,
    tile_n: int = 2048,
    interpret: bool = False,
    packed_select: bool = False,
    merge_k: int = 0,
    two_level: bool | None = None,
    super_tiles: int = 1,
    lane_t: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused cosine + top-k over a (normalized) index.

    Args:
      query_emb: [B, D] L2-normalized queries (f32 or bf16).
      index_emb: [N, D] L2-normalized rows; N is padded internally to a
        multiple of `tile_n` (pad rows are masked out).
      valid_mask: [N] bool row filter.
      top_k: static k (<= tile_n).
      interpret: run in the Pallas interpreter (CPU testing).
      merge_k: if > top_k, the cross-tile merge keeps `merge_k` of the
        per-tile candidates (per-tile selection stays at `top_k` passes —
        the in-kernel selection is linear in k, so oversample HERE, not in
        the kernel).  Surplus slots beyond the candidate pool come back as
        (NEG_INF, -1) fillers.  Used by the engine's exact-rescore path.
      two_level: packed-path tile-reduction strategy (None = auto when
        shape-feasible; False = exhaustive k-pass loop).  Pass False unless
        an exact rescore follows — see `_resolve_two_level`.
      super_tiles: group this many tiles into one SUPERTILE (packed
        two-level paths only; auto-clamped, see `_resolve_super_tiles`).
        Level-2 picks + candidate writes run once per supertile instead of
        once per tile — the dominant non-matmul cost at large N — at the
        cost of a wider packed lane field (2^-10 relative score rounding at
        the 8192-row maximum).  Only for rescore-gated callers.

    Returns (values [B, k] f32, indices [B, k] int32), descending, ties to
    the lowest index.
    """
    b, d = query_emb.shape
    n = index_emb.shape[0]
    assert d % 128 == 0, f"embedding dim {d} must be a multiple of 128"
    k = min(top_k, n)
    assert k <= 128, (
        f"per-tile candidate blocks are 128-wide (k={k}); selection"
        " beyond 128 per tile would silently truncate — raise tile"
        " candidate width or use the streaming XLA path"
    )

    tl_super = _resolve_two_level(two_level, k, tile_n)
    spt = _resolve_super_tiles(
        super_tiles, tile_n, -(-n // tile_n), tl_super, packed_select
    )
    if spt > 1:
        lbits = spt * tile_n
        n_pad = _round_up(n, lbits)
        if n_pad != n:
            index_emb = jnp.pad(index_emb, ((0, n_pad - n), (0, 0)))
            valid_mask = jnp.pad(valid_mask, (0, n_pad - n))
        num_super = n_pad // lbits
        mask_2d = valid_mask.astype(jnp.int32).reshape(1, n_pad)
        b_pad = _round_up(b, 128)  # candidate blocks are [k_sub, B]: B lanes
        if b_pad != b:
            query_emb = jnp.pad(query_emb, ((0, b_pad - b), (0, 0)))
        if index_emb.dtype == jnp.bfloat16:
            query_emb = query_emb.astype(jnp.bfloat16)
        k_sub = _round_up(k, 8)
        if merge_k > num_super * k_sub:
            # Small-pool oversample: packed quantization ties at the top-k
            # boundary need rescore-pool coverage >= merge_k (see the
            # non-super packed branch).
            k_sub = min(128, _round_up(-(-merge_k // num_super), 8))
        kernel = functools.partial(
            _topk_tile_kernel_packed_super, k=k_sub, spt=spt, lbits=lbits,
        )
        vals, idxs = pl.pallas_call(
            kernel,
            grid=(num_super, spt),
            in_specs=[
                pl.BlockSpec((b_pad, d), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, d), lambda i, j: (i * spt + j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, i * spt + j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((k_sub, b_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k_sub, b_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_super * k_sub, b_pad), jnp.float32),
                jax.ShapeDtypeStruct((num_super * k_sub, b_pad), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((b_pad, 128), jnp.int32)
                for _ in range(_super_lane_depth(k, spt))
            ],
            interpret=interpret,
        )(query_emb, index_emb, mask_2d)
        return _merge_super_candidates(
            vals, idxs, b, num_super, k_sub, k, merge_k, interpret=interpret
        )

    n_pad = _round_up(n, tile_n)
    if n_pad != n:
        index_emb = jnp.pad(index_emb, ((0, n_pad - n), (0, 0)))
        valid_mask = jnp.pad(valid_mask, (0, n_pad - n))
    num_tiles = n_pad // tile_n
    # Mosaic wants >=2-D, lane-aligned blocks: carry the mask as [1, N] int32
    # and pad the per-tile candidate lane dim to 128.
    mask_2d = valid_mask.astype(jnp.int32).reshape(1, n_pad)
    k_pad = 128
    b_pad = _round_up(b, 8)
    if b_pad != b:
        query_emb = jnp.pad(query_emb, ((0, b_pad - b), (0, 0)))
    if index_emb.dtype == jnp.bfloat16:
        # Cast the query block ONCE outside the kernel: the in-kernel
        # `.astype(e_ref.dtype)` becomes a no-op, instead of a per-grid-step
        # conversion, and the VMEM q block halves.
        query_emb = query_emb.astype(jnp.bfloat16)

    assert not (packed_select and tile_n > 2048), "packed lane field is 11 bits"
    if packed_select:
        # Packed scores quantize (~2^-12 relative): a top-k-boundary near-tie
        # can resolve by index order instead of true score.  The exact
        # rescore absorbs that ONLY if the candidate pool oversamples — at
        # few tiles (small indexes) num_tiles*k can undercut merge_k, so
        # raise the per-tile pick count until the pool covers merge_k
        # (cheap exactly where tiles are few).
        k_tile = k
        if merge_k > k and num_tiles * k < merge_k:
            k_tile = min(k_pad, tile_n, -(-merge_k // num_tiles))
        kernel = functools.partial(
            _topk_tile_kernel_packed, k=k_tile, k_pad=k_pad,
            two_level=tl_super, lane_t=lane_t,
        )
        k = k_tile
    else:
        kernel = functools.partial(_topk_tile_kernel, k=k, k_pad=k_pad)
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (b_pad, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_pad, k_pad), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
    )
    flops = 2 * b_pad * n_pad * d + 3 * b_pad * n_pad * k
    vals, idxs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, num_tiles * k_pad), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_pad * d * index_emb.dtype.itemsize
            + b_pad * d * 4
            + 2 * b_pad * num_tiles * k_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(query_emb, index_emb, mask_2d)

    # Final merge over the per-tile candidates (slots >= k are fillers and
    # are sliced away first; packed callers route large pools through the
    # Pallas packed merge — see _merge_tile_candidates).
    return _merge_tile_candidates(
        vals, idxs, b, num_tiles, k_pad, k, merge_k,
        packed_merge=packed_select, interpret=interpret,
    )

