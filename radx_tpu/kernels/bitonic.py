"""Bitonic merge-sort in Pallas — the flagship single-chip sort pipeline.

Why bitonic and not a literal port of RadX's scatter-based radix passes
(RadX2-SM7-DEV/scattering.comp:125-127): TPUs have no random-access scatter —
the measured XLA scatter/gather/sort primitives (tools/probe_one.py) run well
under 1 G keys/s because they serialize.  A bitonic network's data movement
is *static*: every exchange is a cyclic roll (lane/sublane rotate) or a
block-pair exchange with compile-time index maps, which Mosaic lowers to
full-rate vector ops and DMA.  Compare-exchange is pure VPU.

Structure (network over flat element index, length padded to a power of two):

  1. `_chunk_sort_kernel` — grid over chunks of C = chunk_rows*128 elements
     held in VMEM; runs bitonic stages 1..log2(C).  The final stage's
     direction depends on bit log2(C) of the *global* flat index, i.e. chunk
     parity, so chunks emerge sorted in alternating directions — exactly
     what the cross-chunk merge expects.
  2. per merge level kk (span 2^kk > C):
     a. `_cross_stage_kernel` / `_cross_stage2_kernel` for distances
        d = 2^(kk-1) .. 2C — the partner lives in a different chunk.  The
        array is viewed as (A, {2,4}, J, c_rows, 128) so the chunks of every
        pair (or fused pair-of-pairs at consecutive distances) form one
        rectangular block; grid over (A, J); no rolls at all.
     b. `_finish2_kernel` — one call fusing the final distance-C exchange
        with all remaining distances C/2 .. 1 of this level inside VMEM.

Direction rule (standard bitonic): element e ascends at level kk iff bit kk
of its global flat index is 0.  Inside kernels the global index is
g*C + local_flat (i32 — total length is capped well below 2^31 per chip), so
one formula covers both the intra-chunk and chunk-parity bits.  Partner of e
at distance d is e ^ d; cyclic rolls realise the XOR because spans are powers
of two, so the roll each lane selects never wraps for that lane.

Mask discipline: Mosaic cannot lower scalar-bool broadcasts or bool==bool at
wide shapes ("unsupported target bitwidth for truncation"), so all selection
logic here is i32 {0,1} arithmetic; booleans only ever appear as the final
`!= 0` feeding a jnp.where.

Sort order: ascending by i32 planes[0]; callers pre-bias uint32 keys by
XOR 0x80000000 (ops/sort.py) so unsigned order maps to signed order.
Stability: `num_cmp=2` compares (planes[0], planes[1]) lexicographically —
callers pass the original index as plane 1 to make the sort stable (the
property RadX never tests, SURVEY §4); further planes (payload) ride along
through the exchanges untouched.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _log2(x: int) -> int:
    assert x > 0 and (x & (x - 1)) == 0, f"{x} not a power of two"
    return x.bit_length() - 1


def _flat_iota(rows):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return r * LANES + l


def _substage(planes, dj, up_i, flat, num_cmp, axis=None, gather=True,
              unique=True):
    """One compare-exchange at distance d = 2^dj; up_i is the i32 {0,1}
    ascending mask for the current level.

    `unique=False` (required when num_cmp == 1 planes carry riders and the
    compare keys may TIE): each lane decides one-sidedly from its own
    compare, and the default formula reads as y<=x on one slot of the pair
    — on a tie both slots resolve to the SAME element, duplicating one
    rider and dropping the other (found on HW via groupby value
    corruption).  The fix computes the strict comparison for each side
    (one extra vector compare), so tied pairs keep their own elements.
    Comparators that cannot tie (unique keys, or an iota tiebreak plane)
    keep the cheaper formula.

    Single-roll formulation: roll every plane by -d so each *pair leader*
    (bit d clear) sees its partner; sort the pair locally (min/max or one
    lexicographic compare), pick which value belongs to the low/high slot
    from the direction mask, then roll the high-slot values back by +d and
    select by position.  ~9 vector ops/plane vs ~15 for the two-roll
    partner-select formulation.

    dj may be a Python int (fully static network — static rotate amounts
    lower to the cheapest Mosaic form) or a traced i32.

    axis: 0 → d is a multiple of 128 (sublane roll only), 1 → d < 128
    (lane roll only), None → composite roll (d may straddle; used by tests).

    Lane-distance exchanges (axis=1) use the XOR-partner dynamic-gather
    formulation instead of rolls: tpu.dynamic_gather along lanes is
    measured at HBM rate on v5e (tools/probe_gather2.py: 49 G elems/s,
    substage 517 G elem-substages/s ≈ 2.3x the roll form) — each lane
    reads its partner lane^d directly, one gather + one select per plane.
    `gather=False` keeps the roll form — used in interpret mode, where the
    CPU emulation of a per-lane gather is far slower than a roll.
    """
    static = isinstance(dj, int)
    d = (1 << dj) if static else (jnp.int32(1) << dj)

    tie_riders = (not unique) and num_cmp == 1 and len(planes) > 1

    if axis == 1 and gather:
        lane = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 1)
        idx = lane ^ d
        ys = [jnp.take_along_axis(x, idx, axis=1) for x in planes]
        x0, y0 = planes[0], ys[0]
        is_high_i = (flat & d != 0).astype(jnp.int32)
        if tie_riders:
            y_lt_i = (y0 < x0).astype(jnp.int32)
            y_gt_i = (x0 < y0).astype(jnp.int32)
            use_lt = up_i ^ is_high_i  # i32 {0,1}; up_i may be scalar
            take_y = (use_lt * y_lt_i + (1 - use_lt) * y_gt_i) != 0
            return [jnp.where(take_y, y, x) for x, y in zip(planes, ys)]
        if num_cmp == 1:
            y_lt_i = (y0 < x0).astype(jnp.int32)
        else:
            x1, y1 = planes[1], ys[1]
            y_lt_i = (y0 < x0).astype(jnp.int32) | (
                (y0 == x0).astype(jnp.int32) & (y1 < x1).astype(jnp.int32)
            )
        take_y = (1 - (y_lt_i ^ up_i ^ is_high_i)) != 0
        return [jnp.where(take_y, y, x) for x, y in zip(planes, ys)]

    def roll(x, sh, ax):
        if isinstance(sh, int):
            sh %= x.shape[ax]  # static negative shifts are rejected
        return pltpu.roll(x, sh, ax)

    def fwd(x):
        if axis == 0:
            return roll(x, -(d >> 7), 0)
        if axis == 1:
            return roll(x, -d, 1)
        return roll(roll(x, -(d & (LANES - 1)), 1), -(d >> 7), 0)

    def bwd(x):
        if axis == 0:
            return roll(x, d >> 7, 0)
        if axis == 1:
            return roll(x, d, 1)
        return roll(roll(x, d & (LANES - 1), 1), d >> 7, 0)

    ys = [fwd(x) for x in planes]
    x0, y0 = planes[0], ys[0]
    if num_cmp == 1:
        y_lt_i = (y0 < x0).astype(jnp.int32)
    else:
        x1, y1 = planes[1], ys[1]
        y_lt_i = (y0 < x0).astype(jnp.int32) | (
            (y0 == x0).astype(jnp.int32) & (y1 < x1).astype(jnp.int32)
        )

    # At each pair leader: the low slot takes the rolled-in partner iff the
    # comparison agrees with the direction; the high slot takes the other.
    # chosen_low = y iff (y_lt == up); chosen_high = y iff (y_lt != up).
    # (The roll form is tie-safe as-is: BOTH slots are decided at the pair
    # leader from one comparison, so the choices are complementary by
    # construction — on a tie low keeps x and high keeps y.  Only the
    # per-lane one-sided gather form above needs the tie_riders fix.)
    low_takes_y = (y_lt_i ^ (1 - up_i)) != 0
    high_takes_y = (y_lt_i ^ up_i) != 0
    is_high = (flat & d) != 0
    out = []
    for x, y in zip(planes, ys):
        chosen_low = jnp.where(low_takes_y, y, x)
        chosen_high = jnp.where(high_takes_y, y, x)
        out.append(jnp.where(is_high, bwd(chosen_high), chosen_low))
    return out


def _chunk_network(planes, gflat, flat, log_c, num_cmp, gather, invert=0,
                   unique=True):
    """The full intra-chunk bitonic network (stages 1..log_c) on VMEM-resident
    planes.  Fully static: every roll distance is a compile-time constant.
    invert=1 flips every direction bit: a descending sort at identical cost."""
    planes = list(planes)
    for kk in range(1, log_c + 1):
        up_i = (1 - ((gflat >> kk) & 1)) ^ invert
        for dj in range(kk - 1, -1, -1):
            # Distances >= 128 need sublane rolls only; < 128 lane rolls only.
            planes = _substage(
                planes, dj, up_i, flat, num_cmp,
                axis=0 if dj >= 7 else 1, gather=gather, unique=unique,
            )
    return planes


def _chunk_sort_kernel(num_cmp, log_c, gather, ascending, invert, unique,
                       _scalar_ref, *refs):
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    rows = in_refs[0].shape[1]
    flat = _flat_iota(rows)
    # Alternating directions come from the chunk-parity bit of the global
    # flat index; `ascending` drops it so every chunk sorts ascending
    # independently (the MSD engine's phase-1/phase-C contract).  `invert`
    # flips every direction (native descending sort, zero extra cost).
    gflat = flat if ascending else flat + pl.program_id(0) * (rows * LANES)
    planes = _chunk_network(
        [r[0] for r in in_refs], gflat, flat, log_c, num_cmp, gather,
        invert, unique,
    )
    for o, x in zip(out_refs, planes):
        o[0] = x


def _chunk_sort_cyclic_kernel(num_cmp, log_c, gather, unique,
                              _scalar_ref, *refs):
    """Ascending chunk sort whose input block is the block-cyclic view
    (n_groups, 1, t_rows, 128) — chunk c owns every n_chunks-th tile of the
    flat array, so locally-ordered inputs (presorted/reverse/clustered)
    spread evenly over all chunks and the MSD engine's per-(chunk,bucket)
    runs stay balanced.  Output is written contiguously (c_rows, 128)."""
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    shp = in_refs[0].shape  # (n_groups, 1, t_rows, LANES)
    rows = shp[0] * shp[2]
    flat = _flat_iota(rows)
    planes = [r[:, 0].reshape(rows, LANES) for r in in_refs]
    planes = _chunk_network(planes, flat, flat, log_c, num_cmp, gather,
                            0, unique)
    for o, x in zip(out_refs, planes):
        o[0] = x


def _reverse_slots(planes, rows, log_slot):
    """x[i] -> x[i ^ (S-1)] within every slot of S = 2^log_slot elements:
    a full element reversal per slot (i ^ (S-1) flips every index bit).
    Lane bits reverse with ONE static lane gather (lane ^ 127); each row
    bit b reverses with an XOR-distance exchange built from two static
    sublane rolls + a select — only proven-fast Mosaic primitives, no
    lax.rev.  log_slot >= 7 (slots are whole rows)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx = lane ^ (LANES - 1)
    planes = [jnp.take_along_axis(p, idx, axis=1) for p in planes]
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    for b in range(log_slot - 7):
        d = 1 << b
        hi = ((rowi >> b) & 1) != 0
        planes = [
            jnp.where(
                hi,
                pltpu.roll(p, d % rows, 0),
                pltpu.roll(p, (-d) % rows, 0),
            )
            for p in planes
        ]
    return planes


def _slot_merge_kernel(num_cmp, log_c, log_slot, gather, unique,
                       _scalar_ref, *refs):
    """Merge the C-elem block's alternating sorted slots into one ascending
    sequence, entirely in VMEM.  Precondition handled here: the caller's
    slots are ALL ascending (the pack kernel emits ascending runs with
    sentinel tails); odd slots are first reversed in-register, giving the
    standard bitonic level invariant (block of 2^log_slot sorted ascending
    iff bit log_slot of the flat index is 0), then merge levels
    log_slot+1 .. log_c run with the within-block direction rule — the top
    level's bit is always 0, so the block emerges ascending."""
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    rows = in_refs[0].shape[1]
    flat = _flat_iota(rows)
    planes = [r[0] for r in in_refs]
    odd = ((flat >> log_slot) & 1) != 0
    rev = _reverse_slots(planes, rows, log_slot)
    planes = [jnp.where(odd, rv, p) for p, rv in zip(planes, rev)]
    for kk in range(log_slot + 1, log_c + 1):
        up_i = 1 - ((flat >> kk) & 1)
        for dj in range(kk - 1, -1, -1):
            planes = _substage(
                planes, dj, up_i, flat, num_cmp,
                axis=0 if dj >= 7 else 1, gather=gather, unique=unique,
            )
    for o, x in zip(out_refs, planes):
        o[0] = x


def merge_slots_ascending(planes, slot_rows, chunk_rows, num_cmp,
                          interpret=False, unique=True):
    """Merge, independently for every block of chunk_rows*128 elements, its
    chunk_rows/slot_rows ascending sorted slots (slot_rows*128 elements
    each) into one ascending sequence — the radix distribution sort's
    phase-C: O(C·log(n_slots)·log C) merge work instead of a full
    O(C·log²C) re-sort of packed runs.  Pads (sentinel tails inside every
    slot) end at each block's tail.  One grid step per block, VMEM
    resident, outputs aliased onto inputs."""
    rows = planes[0].shape[0]
    n_planes = len(planes)
    c_rows = min(chunk_rows, rows)
    log_c = _log2(c_rows * LANES)
    log_slot = _log2(slot_rows * LANES)
    assert c_rows % slot_rows == 0 and rows % c_rows == 0
    n_chunks = rows // c_rows
    alias = {1 + i: i for i in range(n_planes)}
    spec = pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[spec] * n_planes,
        out_specs=[spec] * n_planes,
    )
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    out = pl.pallas_call(
        functools.partial(
            _slot_merge_kernel, num_cmp, log_c, log_slot, not interpret,
            unique,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), p.dtype)
            for p in planes
        ],
        input_output_aliases=alias,
        compiler_params=params,
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32),
      *[p.reshape(n_chunks, c_rows, LANES) for p in planes])
    return [o.reshape(rows, LANES) for o in out]


def _cross_pair(lo, hi, up_i, num_cmp):
    """Compare-exchange two chunk-resident block lists; returns (lo, hi)."""
    if num_cmp == 1:
        hi_lt = (hi[0] < lo[0]).astype(jnp.int32)
    else:
        eq = (hi[0] == lo[0]).astype(jnp.int32)
        hi_lt = (hi[0] < lo[0]).astype(jnp.int32) | (
            eq & (hi[1] < lo[1]).astype(jnp.int32)
        )
    swap = (hi_lt ^ (1 - up_i)) != 0
    new_lo = [jnp.where(swap, b, a) for a, b in zip(lo, hi)]
    new_hi = [jnp.where(swap, a, b) for a, b in zip(lo, hi)]
    return new_lo, new_hi


def _cross_stage2_kernel(num_cmp, up_ref, *refs):
    """Two fused cross substages at consecutive chunk distances 2J and J.

    Block view per plane: (1, 4, 1, c_rows, 128) — the 2-bit field indexes
    chunks g with bits (j+1, j); exchange (b0,b2),(b1,b3) at distance 2J,
    then (b0,b1),(b2,b3) at distance J.  One read+write of the array instead
    of two.  Direction bit (the level bit kk) is the same for both.
    """
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    a = pl.program_id(0)
    up_i = up_ref[a]
    b = [[r[0, i, 0] for r in in_refs] for i in range(4)]
    b[0], b[2] = _cross_pair(b[0], b[2], up_i, num_cmp)
    b[1], b[3] = _cross_pair(b[1], b[3], up_i, num_cmp)
    b[0], b[1] = _cross_pair(b[0], b[1], up_i, num_cmp)
    b[2], b[3] = _cross_pair(b[2], b[3], up_i, num_cmp)
    for i in range(4):
        for o, x in zip(out_refs, b[i]):
            o[0, i, 0] = x


def _cross_stage3_kernel(num_cmp, up_ref, *refs):
    """Three fused cross substages at consecutive chunk distances 4J/2J/J.

    Block view per plane: (1, 8, 1, c_rows, 128) — the 3-bit field indexes
    chunks g by bits (j+2, j+1, j); exchanges at distance 4J, then 2J, then
    J — one read+write of the array instead of three.  Same direction bit
    (the level bit kk) for all three.
    """
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    a = pl.program_id(0)
    up_i = up_ref[a]
    b = [[r[0, i, 0] for r in in_refs] for i in range(8)]
    for i in range(4):
        b[i], b[i + 4] = _cross_pair(b[i], b[i + 4], up_i, num_cmp)
    for i in (0, 1, 4, 5):
        b[i], b[i + 2] = _cross_pair(b[i], b[i + 2], up_i, num_cmp)
    for i in (0, 2, 4, 6):
        b[i], b[i + 1] = _cross_pair(b[i], b[i + 1], up_i, num_cmp)
    for i in range(8):
        for o, x in zip(out_refs, b[i]):
            o[0, i, 0] = x


def _cross_stage4_kernel(num_cmp, up_ref, *refs):
    """Four fused cross substages at consecutive chunk distances 8J/4J/2J/J.

    Block view per plane: (1, 16, 1, c_rows, 128) — the 4-bit field
    indexes chunks g by bits (j+3, j+2, j+1, j); exchanges at distance 8J,
    then 4J, 2J, J — one read+write of the array instead of four.  Same
    direction bit (the level bit kk) for all four.  VMEM: 16 blocks ×
    c_rows·128·4 B × ~2 live copies per plane — within the 100 MB scoped
    limit at c_rows=1024 single-plane (the same budget _finishw_kernel
    already proves at w=16).
    """
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    a = pl.program_id(0)
    up_i = up_ref[a]
    b = [[r[0, i, 0] for r in in_refs] for i in range(16)]
    for i in range(8):
        b[i], b[i + 8] = _cross_pair(b[i], b[i + 8], up_i, num_cmp)
    for i in (0, 1, 2, 3, 8, 9, 10, 11):
        b[i], b[i + 4] = _cross_pair(b[i], b[i + 4], up_i, num_cmp)
    for i in (0, 1, 4, 5, 8, 9, 12, 13):
        b[i], b[i + 2] = _cross_pair(b[i], b[i + 2], up_i, num_cmp)
    for i in range(0, 16, 2):
        b[i], b[i + 1] = _cross_pair(b[i], b[i + 1], up_i, num_cmp)
    for i in range(16):
        for o, x in zip(out_refs, b[i]):
            o[0, i, 0] = x


def _finishw_kernel(num_cmp, log_c, gather, unique, m, scal_ref, *refs):
    """Fused tail of a merge level over W = 2^m chunks: the last m cross
    exchanges (chunk distances W/2 .. 1) plus all intra-chunk substages for
    every chunk in the block — one read+write of the W-chunk slab instead
    of m cross passes + a finish pass.

    Block view per plane: (1, W, 1, c_rows, 128) — chunks a*W .. a*W+W-1.
    Precondition: the level's merge-group span is >= W chunks, so the whole
    block shares one direction bit — scal_ref[0] holds kk - log_c - m (the
    shift mapping block id a to that bit), scal_ref[1] the global direction
    inversion ({0,1}).
    """
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    rows = in_refs[0].shape[3]
    flat = _flat_iota(rows)
    a = pl.program_id(0)
    up = (1 - ((a >> scal_ref[0]) & 1)) ^ scal_ref[1]

    w = 1 << m
    b = [[r[0, i, 0] for r in in_refs] for i in range(w)]
    for s in range(m - 1, -1, -1):
        j = 1 << s
        for i in range(w):
            if not i & j:
                b[i], b[i | j] = _cross_pair(b[i], b[i | j], up, num_cmp)

    for h in range(w):
        planes = b[h]
        for dj in range(log_c - 1, -1, -1):
            planes = _substage(
                planes, dj, up, flat, num_cmp,
                axis=0 if dj >= 7 else 1, gather=gather, unique=unique,
            )
        for o, x in zip(out_refs, planes):
            o[0, h, 0] = x


def _cross_stage_kernel(num_cmp, up_ref, *refs):
    """Exchange chunk pairs at chunk distance J = 2^j_chunks.

    Block view per plane: (1, 2, 1, c_rows, 128) — [*, 0, *] is the low
    chunk (bit j_chunks of the chunk id clear), [*, 1, *] the high chunk.
    up_ref is a scalar-prefetch (A,) i32 table: 1 where pair-group `a`
    merges ascending — computed on the host per level, so one compiled
    kernel per chunk-distance serves every level.
    """
    n = len(refs) // 2
    in_refs, out_refs = refs[:n], refs[n:]
    a = pl.program_id(0)
    up_i = up_ref[a]

    lo = [r[0, 0, 0] for r in in_refs]
    hi = [r[0, 1, 0] for r in in_refs]
    if num_cmp == 1:
        hi_lt = (hi[0] < lo[0]).astype(jnp.int32)
    else:
        eq = (hi[0] == lo[0]).astype(jnp.int32)
        hi_lt = (hi[0] < lo[0]).astype(jnp.int32) | (
            eq & (hi[1] < lo[1]).astype(jnp.int32)
        )
    # ascending: low side keeps the min; descending: low side keeps the max.
    swap = (hi_lt ^ (1 - up_i)) != 0
    for o, x, y in zip(out_refs, lo, hi):
        o[0, 0, 0] = jnp.where(swap, y, x)
        o[0, 1, 0] = jnp.where(swap, x, y)


FINISH_WIDTH = 16  # chunks fused per finish pass (VMEM-bounded; power of 2)
QUAD_FUSION = True  # allow 4-distance (16-block) cross passes; A/B handle
# measured on v5e (NOTES.md): 16 beats 8 by +2.4% at 2^23, +0.7% at 2^26


def merge_sorted_chunks(planes, chunk_rows, num_cmp, interpret=False):
    """Merge pre-sorted chunks into one ascending sequence.

    Precondition: chunk g (of chunk_rows*128 elements, flat row-major) is
    sorted ascending for even g and descending for odd g — the standard
    bitonic level invariant.  Runs only the cross/finish merge levels
    (log2(n_chunks) of them) instead of a full sort: this is the D-way
    merge of already-sorted all_to_all runs in the distributed pipeline
    (each source device pre-sorts in its parity's direction, so no flip
    pass is needed).
    """
    return _sort_pipeline(
        planes, chunk_rows, num_cmp, interpret, presorted=True
    )


def merge_sorted_runs(
    planes, log_run, num_cmp, chunk_rows, descending=False, interpret=False
):
    """Merge alternating-direction sorted runs of 2^log_run elements each.

    Precondition: run r (flat row-major) is sorted ascending for even r,
    descending for odd r.  Runs the log2(n_runs) merge levels above
    `log_run` only — a true multi-way merge, O(N · log(n_runs) · log_run)
    instead of a full O(N log²N) sort.  `descending=True` inverts every
    direction bit so the final sequence comes out descending (used by the
    pairwise merge tree in parallel/dist_sort to feed parent merges
    without materialized flips).  2^log_run must be a multiple of the
    chunk size (chunk_rows·128, clamped down to the run length).
    """
    run = 1 << log_run
    chunk_rows = min(chunk_rows, run // LANES)
    return _sort_pipeline(
        planes, chunk_rows, num_cmp, interpret,
        presorted=True, presorted_log=log_run, invert=descending,
    )


def merge_bitonic_ascending(planes, chunk_rows, num_cmp, interpret=False,
                            descending=False):
    """Bitonic merge of ONE bitonic sequence of pow2 length: the top merge
    level of the pipeline with every direction forced ascending — or all
    inverted (`descending=True`).  O(N·log(N/C)) cross passes + one finish
    pass — not a full sort."""
    rows = planes[0].shape[0]
    log_n = _log2(rows * LANES)
    return _sort_pipeline(
        planes, chunk_rows, num_cmp, interpret,
        presorted=True, presorted_log=log_n - 1, invert=descending,
        finish_width=16,
    )


def _cx_directed(lo, hi, num_cmp, descending):
    """Elementwise directed compare-exchange between two plane lists:
    ascending keeps the min on the low side, descending the max."""
    if num_cmp == 1:
        swap = hi[0] < lo[0]
    else:
        swap = (hi[0] < lo[0]) | ((hi[0] == lo[0]) & (hi[1] < lo[1]))
    if descending:
        swap = ~swap
    new_lo = [jnp.where(swap, b, a) for a, b in zip(lo, hi)]
    new_hi = [jnp.where(swap, a, b) for a, b in zip(lo, hi)]
    return new_lo, new_hi


def merge_valley_ascending(planes, chunk_rows, num_cmp, interpret=False,
                           descending=False):
    """Sort a bitonic sequence of ARBITRARY chunk-multiple length — the
    arbitrary-N primitive (the reference handles any N via validity
    ballots, RadX2-SM7-DEV/includes.glsl:171-182 + counting.comp:50-66; we
    handle it via virtual network wires).

    The input (a "valley" — descending run ++ ascending run — or a
    "mountain"; any bitonic sequence) is merged on a virtual
    2^ceil(log2 L)-wire directed bitonic network whose tail wires hold
    +inf (ascending) or -inf (descending).  A compare-exchange whose high
    wire is virtual is then a no-op — ascending takes the min onto the
    physical low wire, and min(x, +inf) = x; descending takes the max, and
    max(x, -inf) = x — so the tail is never materialized.  Per level:

      1. the top half-cleaner touches only the physical overhang
         (L - V/2 elements) — one contiguous elementwise compare-exchange;
      2. the low V/2 wires are now fully physical and bitonic → complete
         pow2 directed merge (merge_bitonic_ascending, existing kernels);
      3. every low element <= (ascending; >= descending) every high
         element (half-cleaner lemma), and the high remainder is itself
         bitonic → iterate on it with a re-tightened virtual size.

    Work: Σ over halving levels = O(L·log(L/C)) — same order as one pow2
    merge of size L, with zero physical padding.  Returns sorted planes of
    the SAME (unpadded) length.
    """
    rows = planes[0].shape[0]
    c_rows = min(chunk_rows, rows)
    assert rows % c_rows == 0, (rows, c_rows)
    segments: list[list] = []  # sorted prefixes, in output order
    cur = list(planes)
    while True:
        r = cur[0].shape[0]
        v_rows = 1 << (r - 1).bit_length()  # tight virtual size (rows)
        if r == v_rows:
            segments.append(
                merge_bitonic_ascending(
                    cur, c_rows, num_cmp, interpret, descending
                )
            )
            break
        half = v_rows // 2  # > 0, < r by tightness; multiple of c_rows
        npair = r - half
        lo, hi = _cx_directed(
            [p[:npair] for p in cur], [p[half:] for p in cur], num_cmp,
            descending,
        )
        low = [
            jnp.concatenate([a, p[npair:half]], axis=0)
            for a, p in zip(lo, cur)
        ]
        segments.append(
            merge_bitonic_ascending(
                low, c_rows, num_cmp, interpret, descending
            )
        )
        cur = hi
    return [
        jnp.concatenate([seg[i] for seg in segments], axis=0)
        for i in range(len(planes))
    ]


def sort_planes(planes, chunk_rows, num_cmp, interpret=False,
                descending=False, unique=True):
    """Sort i32 planes (each shape (rows, 128)) ascending by planes[0]
    (then planes[1] if num_cmp == 2) in flat row-major order —
    or descending (`descending=True`): every network direction bit is
    flipped, so the reversed order costs exactly the same passes.

    rows*128 must be a power of two; chunk_rows*128 is the VMEM working-set
    size per grid step (clamped to the total).  Returns the sorted planes.
    All pallas_calls alias outputs onto inputs, so the sort is in-place at
    the buffer level (the ping-pong the reference gets from its keys/swap
    descriptor pair, radx_implement.inl:371-386, falls out of XLA buffer
    donation).
    """
    return _sort_pipeline(
        planes, chunk_rows, num_cmp, interpret, presorted=False,
        invert=descending, unique=unique,
    )


def sort_chunks_ascending(planes, chunk_rows, num_cmp, interpret=False,
                          unique=True):
    """Sort every chunk of chunk_rows*128 elements ascending, independently
    (no cross-chunk merging).  The MSD engine's phase-1 local sort and
    phase-C bucket sort: one compiled kernel serves both roles."""
    rows = planes[0].shape[0]
    n_planes = len(planes)
    c_rows = min(chunk_rows, rows)
    log_c = _log2(c_rows * LANES)
    n_chunks = rows // c_rows
    alias = {1 + i: i for i in range(n_planes)}
    spec = pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[spec] * n_planes,
        out_specs=[spec] * n_planes,
    )
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    out = pl.pallas_call(
        functools.partial(
            _chunk_sort_kernel, num_cmp, log_c, not interpret, True, 0,
            unique,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), p.dtype)
            for p in planes
        ],
        input_output_aliases=alias,
        compiler_params=params,
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32),
      *[p.reshape(n_chunks, c_rows, LANES) for p in planes])
    return [o.reshape(rows, LANES) for o in out]


def sort_chunks_ascending_cyclic(
    planes, chunk_rows, num_cmp, t_rows: int = 8, interpret=False,
    unique=True,
):
    """Like sort_chunks_ascending, but chunk c is the *block-cyclic* tile set
    {tile g*n_chunks + c} of t_rows-row tiles rather than a contiguous slab.
    The MSD engine's phase-1 entry: any locally-correlated input (presorted,
    reverse-sorted, value-clustered segments) lands evenly in every chunk,
    so sample splitters stay balanced.  No aliasing (the strided input view
    and contiguous output view overlap across grid steps)."""
    rows = planes[0].shape[0]
    n_planes = len(planes)
    c_rows = min(chunk_rows, rows)
    log_c = _log2(c_rows * LANES)
    n_chunks = rows // c_rows
    assert c_rows % t_rows == 0
    n_groups = c_rows // t_rows
    in_spec = pl.BlockSpec(
        (n_groups, 1, t_rows, LANES), lambda i, s: (0, i, 0, 0)
    )
    out_spec = pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[in_spec] * n_planes,
        out_specs=[out_spec] * n_planes,
    )
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    out = pl.pallas_call(
        functools.partial(
            _chunk_sort_cyclic_kernel, num_cmp, log_c, not interpret, unique
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), p.dtype)
            for p in planes
        ],
        compiler_params=params,
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32),
      *[p.reshape(n_groups, n_chunks, t_rows, LANES) for p in planes])
    return [o.reshape(rows, LANES) for o in out]


def _sort_pipeline(
    planes, chunk_rows, num_cmp, interpret, presorted,
    presorted_log=None, invert=False, finish_width=None, unique=True,
):
    if finish_width is None:
        finish_width = FINISH_WIDTH
    rows = planes[0].shape[0]
    n_planes = len(planes)
    total = rows * LANES
    c = min(chunk_rows * LANES, total)
    c_rows = c // LANES
    log_c, log_n = _log2(c), _log2(total)
    if presorted_log is None:
        presorted_log = log_c
    # presorted_log == log_c - 1 means "chunks are merely bitonic, run the
    # intra-chunk merge" — only meaningful for a single chunk (the
    # merge_bitonic_ascending base case); multi-chunk callers must have
    # sorted chunks.
    assert presorted_log >= log_c or (
        presorted_log == log_c - 1 and total == c
    ), (presorted_log, log_c, total, c)
    n_chunks = total // c
    # indices include the scalar-prefetch operand, hence the +1 shift
    alias = {1 + i: i for i in range(n_planes)}

    chunk_spec = pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))
    chunk_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[chunk_spec] * n_planes,
        out_specs=[chunk_spec] * n_planes,
    )
    chunk_shapes = [
        jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), p.dtype)
        for p in planes
    ]

    # The unrolled networks keep many chunk-sized temporaries live; the
    # default 16 MiB scoped-vmem budget is too small for 1 MiB chunks.
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )

    def chunked_call(kernel_fn, scalar):
        out = pl.pallas_call(
            kernel_fn,
            grid_spec=chunk_grid,
            out_shape=chunk_shapes,
            input_output_aliases=alias,
            compiler_params=params,
            interpret=interpret,
        )(scalar, *[p.reshape(n_chunks, c_rows, LANES) for p in planes])
        return [o.reshape(rows, LANES) for o in out]

    if not presorted:
        zero = jnp.zeros((1,), jnp.int32)
        planes = chunked_call(
            functools.partial(
                _chunk_sort_kernel, num_cmp, log_c, not interpret, False,
                int(invert), unique,
            ),
            zero,
        )

    cross = functools.partial(_cross_stage_kernel, num_cmp)
    cross2 = functools.partial(_cross_stage2_kernel, num_cmp)
    cross3 = functools.partial(_cross_stage3_kernel, num_cmp)
    cross4 = functools.partial(_cross_stage4_kernel, num_cmp)
    # quad fusion needs 16 chunk-blocks resident; bound by the same VMEM
    # budget as the finish width (2 live copies per plane per block)
    quad_ok = QUAD_FUSION and c_rows * n_planes <= 1024

    def cross_call(kernel, width, j_low, up_bit):
        """One cross-stage pallas_call; width = 2 (single) or 4 (fused)."""
        J = 1 << j_low
        A = n_chunks // (width * J)
        up_tab = jnp.asarray(
            (1 - ((np.arange(A, dtype=np.int32) >> up_bit) & 1))
            ^ int(invert),
            jnp.int32,
        )
        spec = pl.BlockSpec(
            (1, width, 1, c_rows, LANES), lambda a, r, s: (a, 0, r, 0, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(A, J),
            in_specs=[spec] * n_planes,
            out_specs=[spec] * n_planes,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((A, width, J, c_rows, LANES), p.dtype)
                for p in planes
            ],
            input_output_aliases=alias,
            compiler_params=params,
            interpret=interpret,
        )(up_tab, *[p.reshape(A, width, J, c_rows, LANES) for p in planes])
        return [o.reshape(rows, LANES) for o in out]

    def finish_call(m, kk):
        """One fused finish pass over W = 2^m chunks at level kk."""
        w = 1 << m
        kern = functools.partial(
            _finishw_kernel, num_cmp, log_c, not interpret, unique, m
        )
        spec = pl.BlockSpec(
            (1, w, 1, c_rows, LANES), lambda a, s: (a, 0, 0, 0, 0)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks // w,),
            in_specs=[spec] * n_planes,
            out_specs=[spec] * n_planes,
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (n_chunks // w, w, 1, c_rows, LANES), p.dtype
                )
                for p in planes
            ],
            input_output_aliases=alias,
            compiler_params=params,
            interpret=interpret,
        )(
            jnp.asarray([kk - log_c - m, int(invert)], jnp.int32),
            *[p.reshape(n_chunks // w, w, 1, c_rows, LANES) for p in planes],
        )
        return [o.reshape(rows, LANES) for o in out]

    start_kk = (presorted_log if presorted else log_c) + 1
    for kk in range(start_kk, log_n + 1):
        kk_chunks = kk - log_c
        # The finish pass absorbs the last m cross exchanges (chunk
        # distances W/2..1) plus the intra-chunk tails; wider W = fewer
        # full-array HBM passes per level, bounded by VMEM (finish_width).
        # VMEM-bound the fused width: the finish block is
        # w × c_rows × 128 × 4 B per plane and the kernel keeps ~2 copies
        # live PER PLANE — w·c_rows·n_planes > 16384 exceeds the 100 MB
        # scoped-vmem limit (measured: chunk 2048 × w 16 1-plane = 113 MB
        # compile OOM; chunk 1024 × w 16 2-plane = 106.9 MB OOM).
        fw = min(finish_width, max(2, 16384 // (c_rows * n_planes)))
        fw = 1 << (fw.bit_length() - 1)  # pow2 floor (m = log2(fw))
        m = min(kk_chunks, _log2(fw))
        # cross distances down to chunk-distance W; everything below is
        # fused into the finish pass.  Greedy fusion: 4 consecutive
        # distances per pass (16-block view, VMEM permitting), then 3
        # (8-block), then 2, then 1.
        djs = list(range(kk - 1, log_c + m - 1, -1))  # consecutive, desc.
        i = 0
        while i < len(djs):
            rem = len(djs) - i
            if rem >= 4 and quad_ok:
                j0 = djs[i + 3] - log_c
                planes = cross_call(cross4, 16, j0, kk_chunks - j0 - 4)
                i += 4
            elif rem >= 3:
                j0 = djs[i + 2] - log_c
                planes = cross_call(cross3, 8, j0, kk_chunks - j0 - 3)
                i += 3
            elif rem >= 2:
                # fuse distances djs[i] = djs[i+1]+1 into one 4-block pass
                j0 = djs[i + 1] - log_c
                planes = cross_call(cross2, 4, j0, kk_chunks - j0 - 2)
                i += 2
            else:
                j_chunks = djs[i] - log_c
                planes = cross_call(cross, 2, j_chunks, kk_chunks - j_chunks - 1)
                i += 1
        planes = finish_call(m, kk)

    return planes
