"""MSD split sort — the TPU-native production radix path (strategy="radix").

The reference's core algorithm is a per-digit rank-and-scatter
(RadX2-SM7-DEV/scattering.comp:125-127 — stable subgroup-ranked scatter;
pipeline loop include/radx/radx_implement.inl:421-447).  TPUs have no
random-access scatter, so a literal port is the wrong design; this module
realises the same counting -> partition -> scattering structure at *chunk*
granularity with only TPU-fast primitives (static block DMA, contiguous
dynamic slices, lane gathers, one-hot MXU matmuls):

  1. **local sort** — block-cyclic chunks of C = chunk_rows*128 elements are
     sorted ascending in VMEM (kernels/bitonic chunk network).  The cyclic
     tile assignment spreads locally-correlated inputs (presorted, reverse,
     clustered) evenly over chunks, so bucket loads stay balanced.
  2. **counting/partition analogue** — splitters come from regular samples
     of every sorted chunk (sample sort): balanced under any distribution,
     unlike the reference's fixed blocks.  Each chunk's per-bucket run
     boundaries are the splitters' ranks, computed by `_rank_kernel`: a
     two-level search over the sorted chunk where the row lookup is a
     one-hot bf16 matmul on the MXU (byte-plane exact) — no XLA
     searchsorted (measured pathological on TPU, NOTES.md).
  3. **scattering analogue** — `_pack_kernel`: per chunk, every bucket's
     run is a *contiguous* window of the sorted chunk; the kernel reads it
     with a dynamic sublane slice + two lane-gathers (the lane-remainder
     alignment), sentinel-pads it to a fixed slot, and writes it through a
     scalar-prefetch output index map straight into bucket-major layout —
     the global scatter becomes per-chunk block DMA.
  4. buckets (padded runs, sentinels interleaved) are sorted by the same
     compiled ascending chunk network — sentinels sort to each bucket's
     tail, so no compaction pass is needed.  `_concat_kernel` then copies
     each bucket's valid prefix to its exact global offset (grid over
     C-sized output blocks; ascending-overwrite stores in VMEM scratch) —
     bit-exact output, no padding in the result.

Geometry: slot = C / n_chunks and nb ≈ 1.44·n_chunks, so every padded
bucket region is exactly C elements and BOTH sort phases reuse one
compiled chunk kernel.  Cost: two VMEM chunk sorts of ~N and ~1.44·N
elements + ~3 bandwidth passes, independent of N — vs the bitonic
pipeline's log²(N/C) merge passes; measured there is NO crossover on
v5e (the chunk sorts are comparison networks too — substage
conservation, NOTES.md rounds 4-5), so this is the parity/skew path.

Skew: sample splitters bound bucket sizes, but adversarial duplicate-heavy
inputs can overflow a run's slot or crowd too many buckets into one output
block; the sort returns an `overflow` flag and callers fall back
(ops.sort wraps this in lax.cond with the bitonic path) — same contract
as parallel/dist_sort.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radx_tpu.kernels import bitonic

LANES = 128
_PAD = 0x7FFFFFFF  # i32 sentinel: sign-biased uint32 max — sorts last
_PAD_IDX = 0x7FFFFFFF  # tiebreak-plane fill: pads lose every tiebreak
_HEADROOM = 1.44  # slot/bucket capacity over the mean load
_K = 8  # max buckets overlapping one output block (concat window)
_U = 8  # pack-kernel bucket-loop unroll factor
_NS = 512  # splitter samples per chunk


class Plan(NamedTuple):
    C: int
    n_chunks: int
    c_rows: int
    slot_rows: int
    nb: int
    nb_pad: int
    s_pad: int
    t_rows: int


def _log2(x: int) -> int:
    assert x > 0 and (x & (x - 1)) == 0, f"{x} not a power of two"
    return x.bit_length() - 1


def plan(n: int, chunk_rows: int) -> Plan | None:
    """Static geometry for an MSD sort of n (pow2) elements, or None when
    the MSD pipeline doesn't apply (callers use the bitonic pipeline)."""
    c_rows = chunk_rows
    C = c_rows * LANES
    if n % C or n < 4 * C:
        return None
    n_chunks = n // C
    if n_chunks > c_rows or c_rows % max(8, n_chunks) != 0:
        return None
    if c_rows < 8 * n_chunks:
        # slot_rows < 8: the pack kernel's sublane windows degenerate
        # (measured: Mosaic compile crash at 2^26/chunk1024 slot_rows=2 and
        # shape mismatch at 2^27/chunk1024 slot_rows=1) — fall back.
        return None
    slot_rows = c_rows // n_chunks  # padded bucket region == C exactly
    nb = int(_HEADROOM * n_chunks) + 1
    nb_pad = max(2 * _K, -(-nb // _U) * _U)
    s_pad = -(-(nb - 1) // 8) * 8
    return Plan(C, n_chunks, c_rows, slot_rows, nb, nb_pad, s_pad, 8)


def _fill(i: int, num_cmp: int) -> int:
    if i == 0:
        return _PAD
    if i == 1 and num_cmp == 2:
        return _PAD_IDX
    return 0


def _rank_kernel(c_rows, s_pad, x_ref, h_ref, s_ref, out_ref):
    """ranks[j] = #elements of the sorted chunk < splitter j.

    Two-level search, everything dense: (1) count rows whose head (first
    lane) is < s — rows strictly before that are entirely < s; (2) fetch
    the one boundary row with a one-hot bf16 matmul (byte planes keep the
    i32 bit pattern exact, NOTES.md Mosaic pitfalls) and count within it.

    x_ref: (1, c_rows, 128) sorted chunk (i32, sign-biased).
    h_ref: (1, hr, 128) the chunk's lane-0 column, row-major, tail-padded
           with the _PAD sentinel (never < any splitter).
    s_ref: (s_pad, 128) splitter j broadcast along lanes of row j.
    out_ref: (1, s_pad, 128) rank j broadcast along lanes of row j.
    """
    hr = h_ref.shape[1]
    heads = h_ref[0]  # (hr, 128)
    sv = s_ref[...]  # (s_pad, 128)
    s_col = sv[:, 0:1]  # (s_pad, 1)
    rstar = jnp.zeros((s_pad, 1), jnp.int32)
    for t in range(hr):
        cmp = (heads[t : t + 1, :] < s_col).astype(jnp.int32)  # (s_pad, 128)
        rstar = rstar + jnp.sum(cmp, axis=1, keepdims=True)
    q = jnp.maximum(rstar - 1, 0)  # boundary row index, (s_pad, 1)

    lane_c = jax.lax.broadcasted_iota(jnp.int32, (s_pad, c_rows), 1)
    oh = (lane_c == q).astype(jnp.int32).astype(jnp.bfloat16)
    x = x_ref[0]  # (c_rows, 128)
    row = jnp.zeros((s_pad, LANES), jnp.int32)
    for k in range(4):
        byte = (
            jax.lax.shift_right_logical(x, jnp.int32(8 * k)) & 0xFF
        ).astype(jnp.bfloat16)
        got = jax.lax.dot_general(
            oh,
            byte,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        row = row | (got << (8 * k))
    within = jnp.sum((row < sv).astype(jnp.int32), axis=1, keepdims=True)
    rank = jnp.where(rstar == 0, 0, q * LANES + within)
    out_ref[0] = jnp.broadcast_to(rank, (s_pad, LANES))


def _splitter_ranks(x3, splitters, p: Plan, interpret):
    """(n_chunks, nb-1) i32 ranks of each splitter in each sorted chunk."""
    n_chunks, c_rows, _ = x3.shape
    hr = -(-c_rows // LANES)
    heads = x3[:, :, 0]
    if hr * LANES != c_rows:
        heads = jnp.concatenate(
            [
                heads,
                jnp.full((n_chunks, hr * LANES - c_rows), _PAD, jnp.int32),
            ],
            axis=1,
        )
    heads = heads.reshape(n_chunks, hr, LANES)
    s_b = jnp.broadcast_to(splitters[:, None], (p.s_pad, LANES))
    grid_spec = pl.GridSpec(
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, c_rows, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, hr, LANES), lambda c: (c, 0, 0)),
            pl.BlockSpec((p.s_pad, LANES), lambda c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, p.s_pad, LANES), lambda c: (c, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_rank_kernel, c_rows, p.s_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, p.s_pad, LANES), jnp.int32),
        interpret=interpret,
    )(x3, heads, s_b)
    return out[:, : p.nb - 1, 0]


def _pack_kernel(c_rows, slot_rows, nb_pad, num_cmp, bounds_ref, *refs):
    """Pack one sorted chunk's per-bucket runs into sentinel-padded slots,
    written bucket-major (the output index map holds the transpose).

    bounds_ref: (1, 1, nb_pad+1) i32 SMEM block — THIS chunk's splitter
    ranks.  (A per-chunk-blocked SMEM input, not scalar prefetch: the
    whole (n_chunks, nb_pad+1) table is prefetched into SMEM under
    scalar prefetch, and at 2^28 geometry — 512×721 ints ≈ 1.5 MB — that
    exceeds the 1 MB SMEM, the r4 compile failure.  Only this chunk's
    row is ever read, so a blocked SMEM window is exact.)
    refs: n_planes inputs (1, c_rows, L) + n_planes outputs
          (nb_pad, 1, slot_rows, L) + n_planes VMEM scratch
          (c_rows + slot_rows + 8, L) — the scratch tail past c_rows is
          never valid (reads of it are masked by `count`).
    """
    n = len(refs) // 3
    x_refs = refs[:n]
    out_refs, scratch_refs = refs[n : 2 * n], refs[2 * n :]
    for x, s in zip(x_refs, scratch_refs):
        s[:c_rows] = x[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (slot_rows, LANES), 1)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (slot_rows, LANES), 0) * LANES
        + lane
    )

    def one_bucket(b):
        o = bounds_ref[0, 0, b]
        count = bounds_ref[0, 0, b + 1] - o
        r0 = o >> 7
        d = o & 127
        idx = (lane + d) & 127
        sel_lo = (lane + d) < 128
        for i, (s, out) in enumerate(zip(scratch_refs, out_refs)):
            win = s[pl.ds(r0, slot_rows + 1)]
            ga = jnp.take_along_axis(win[:slot_rows], idx, axis=1)
            gb = jnp.take_along_axis(win[1:], idx, axis=1)
            w = jnp.where(sel_lo, ga, gb)
            w = jnp.where(flat < count, w, jnp.int32(_fill(i, num_cmp)))
            out[b, 0] = w

    def body(bu, _):
        for u in range(_U):  # unrolled: amortizes the loop's scalar overhead
            one_bucket(bu * _U + u)
        return 0

    jax.lax.fori_loop(0, nb_pad // _U, body, 0)


def _concat_kernel(c_rows, num_cmp, b0_ref, b0b_ref, cum_ref, nv_ref, *refs):
    """Copy every sorted bucket's valid prefix to its exact global offset.

    Grid over C-sized output blocks; block j scans the _K buckets starting
    at b0_ref[j] (all buckets intersecting [jC, (j+1)C) — guaranteed by the
    K-window overflow check).  BlockSpec indices are in block-shape units,
    so an arbitrary K-bucket window cannot be one block: each plane fetches
    TWO K-aligned K-wide slabs (block indices b0b_ref[j] and +1, covering
    buckets [qK, qK+2K) ⊇ [b0, b0+K)); each bucket picks its slab at run
    time.  Ascending-overwrite discipline in a VMEM scratch three blocks
    wide: each (c_rows+1)-row store's garbage tail is overwritten by the
    next intersecting bucket's store; the final masked copy re-sentinels
    everything past n_valid.

    refs: n_planes slab-A inputs (_K, c_rows, L) + n_planes slab-B inputs
          (_K, c_rows, L) + n_planes outputs (1, c_rows, L) + n_planes
          scratch (3*c_rows + 8, L).
    """
    n = len(refs) // 4
    xa_refs, xb_refs = refs[:n], refs[n : 2 * n]
    out_refs, scratch_refs = refs[2 * n : 3 * n], refs[3 * n :]
    j = pl.program_id(0)
    C = c_rows * LANES
    g0 = j * C
    b0 = b0_ref[j]
    base = b0 - b0b_ref[j] * _K  # offset of bucket b0 inside slab A, [0,K]
    lane = jax.lax.broadcasted_iota(jnp.int32, (c_rows + 1, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (c_rows + 1, LANES), 0)

    def store(x_refs, idx, lo):
        # Destination offset in scratch coords.  > 0 whenever no bucket
        # exceeds its C-element bound; an overflowing input (flagged to the
        # caller, result discarded) could drive it negative, so clamp to
        # keep the store in bounds rather than fault the chip.
        q = jnp.maximum(lo - g0 + C, 0)
        r0 = q >> 7
        d = q & 127
        gidx = (lane - d) & 127
        sel_hi = lane >= d
        first = rowi == 0
        for s, x in zip(scratch_refs, x_refs):
            src = x[idx]  # (c_rows, L) — dynamic sublane load
            srcp = jnp.concatenate([src[:1], src, src[:1]])
            ga = jnp.take_along_axis(srcp[1:], gidx, axis=1)  # src[r,·]
            gb = jnp.take_along_axis(srcp[:-1], gidx, axis=1)  # src[r-1,·]
            w = jnp.where(sel_hi, ga, gb)
            cur = s[pl.ds(r0, c_rows + 1)]
            w = jnp.where(first & (lane < d), cur, w)
            s[pl.ds(r0, c_rows + 1)] = w

    for i in range(_K):
        b = b0 + i
        lo = cum_ref[b]
        hi = cum_ref[b + 1]
        inter = (lo < g0 + C) & (hi > g0)
        idx = base + i  # position within the 2K window, [0, 2K)
        in_a = idx < _K

        @pl.when(inter & in_a)
        def _(idx=idx, lo=lo):
            store(xa_refs, idx, lo)

        @pl.when(inter & jnp.logical_not(in_a))
        def _(idx=idx, lo=lo):
            store(xb_refs, idx - _K, lo)

    nv = nv_ref[0]
    gflat = (
        jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 1)
        + g0
    )
    for i, (s, out) in enumerate(zip(scratch_refs, out_refs)):
        out[0] = jnp.where(
            gflat < nv, s[c_rows : 2 * c_rows], jnp.int32(_fill(i, num_cmp))
        )


def sort_msd(planes, chunk_rows, num_cmp, interpret=False, n_valid=None):
    """MSD split sort of i32 planes (ascending by planes[0], then planes[1]
    when num_cmp == 2; further planes ride along).  planes: flat row-major
    (rows, 128) as in bitonic.sort_planes; `plan` must be non-None for the
    total size (ops.sort handles the fallback).

    n_valid: count of real elements (the tail beyond it must already be
    sentinel-filled per _fill); defaults to the full length.

    Returns (planes_sorted, overflow) — overflow is a scalar bool; when
    True a per-(chunk,bucket) run exceeded its slot or an output block
    overlaps more than _K buckets, and the output is NOT trustworthy
    (callers fall back to the bitonic pipeline).
    """
    rows = planes[0].shape[0]
    total = rows * LANES
    p = plan(total, chunk_rows)
    assert p is not None, "input size not supported by MSD; use bitonic"
    C, n_chunks, c_rows = p.C, p.n_chunks, p.c_rows
    slot = p.slot_rows * LANES
    n_planes = len(planes)
    if n_valid is None:
        n_valid = total
    nv = jnp.asarray(n_valid, jnp.int32)
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )

    # ---- phase 1: block-cyclic ascending chunk sorts ----------------------
    planes = bitonic.sort_chunks_ascending_cyclic(
        planes, chunk_rows, num_cmp, t_rows=p.t_rows, interpret=interpret
    )
    x3 = [pl_.reshape(n_chunks, c_rows, LANES) for pl_ in planes]
    keys3 = x3[0]

    # ---- splitters from regular samples of every sorted chunk ------------
    ns = min(_NS, c_rows // 2)
    rstride = c_rows // ns
    samples = jnp.sort(keys3[:, rstride // 2 :: rstride, 0].reshape(-1))
    nvs = jnp.sum((samples < _PAD).astype(jnp.int32))  # valid samples
    spos = jnp.clip(
        (jnp.arange(1, p.nb, dtype=jnp.int32) * nvs) // p.nb,
        0,
        samples.shape[0] - 1,
    )
    splitters = jnp.full((p.s_pad,), _PAD, jnp.int32).at[: p.nb - 1].set(
        samples[spos]
    )

    # ---- per-chunk run boundaries (counting/partition analogue) ----------
    T = p.t_rows * LANES
    gtile = (
        jnp.arange(c_rows // p.t_rows, dtype=jnp.int32)[:, None] * n_chunks
        + jnp.arange(n_chunks, dtype=jnp.int32)[None, :]
    )
    valid = jnp.sum(jnp.clip(nv - gtile * T, 0, T), axis=0)  # (n_chunks,)
    ranks = _splitter_ranks(keys3, splitters, p, interpret)
    bounds = jnp.concatenate(
        [
            jnp.zeros((n_chunks, 1), jnp.int32),
            ranks,
            jnp.broadcast_to(
                valid[:, None], (n_chunks, p.nb_pad + 1 - p.nb)
            ),
        ],
        axis=1,
    )
    counts = bounds[:, 1:] - bounds[:, :-1]  # (n_chunks, nb_pad)
    bucket_tot = jnp.sum(counts, axis=0)  # (nb_pad,)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_tot)]
    ).astype(jnp.int32)
    # K-window check: the concat kernel scans buckets b0[j] .. b0[j]+K-1;
    # every NONEMPTY bucket intersecting block j must fall in that window.
    # Empty buckets (lo == hi, e.g. the nb_pad tail when n_valid < total)
    # are harmless to visit (garbage stores are overwritten or masked past
    # n_valid) and must not count as required.
    blk = jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * C  # block starts
    inter = (cum[None, :-1] < blk + C) & (cum[None, 1:] > blk)
    nonempty = (cum[None, 1:] > cum[None, :-1]) & inter
    b_idx = jnp.arange(p.nb_pad, dtype=jnp.int32)[None, :]
    last_needed = jnp.max(jnp.where(nonempty, b_idx + 1, 0), axis=1)
    b0 = jnp.clip(
        jnp.sum((cum[None, 1:] <= blk).astype(jnp.int32), axis=1),
        0,
        p.nb_pad - _K,
    )
    overflow = (jnp.max(counts) > slot) | (
        jnp.max(last_needed - b0) > _K
    )
    b0b = jnp.clip(b0 // _K, 0, p.nb_pad // _K - 2)

    # ---- pack: scatter runs into bucket-major padded slots ---------------
    # bounds rides as a per-chunk-blocked SMEM input (NOT scalar prefetch:
    # the full table would blow SMEM at 2^28 geometry — see _pack_kernel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            # bounds is (n_chunks, 1, nb_pad+1): the (1, 1, nb_pad+1) block's
            # last two dims equal the array's, satisfying Mosaic's block
            # shape rule for SMEM operands
            pl.BlockSpec(
                (1, 1, p.nb_pad + 1), lambda c: (c, 0, 0),
                memory_space=pltpu.SMEM,
            )
        ]
        + [pl.BlockSpec((1, c_rows, LANES), lambda c: (c, 0, 0))]
        * n_planes,
        out_specs=[
            pl.BlockSpec(
                (p.nb_pad, 1, p.slot_rows, LANES), lambda c: (0, c, 0, 0)
            )
        ]
        * n_planes,
        scratch_shapes=[
            pltpu.VMEM((c_rows + p.slot_rows + 8, LANES), jnp.int32)
        ]
        * n_planes,
    )
    packed = pl.pallas_call(
        functools.partial(
            _pack_kernel, c_rows, p.slot_rows, p.nb_pad, num_cmp
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (p.nb_pad, n_chunks, p.slot_rows, LANES), jnp.int32
            )
        ]
        * n_planes,
        compiler_params=params,
        interpret=interpret,
    )(bounds[:, None, :], *x3)
    if n_planes == 1 and not isinstance(packed, (list, tuple)):
        packed = [packed]

    # ---- phase C: sort each padded bucket (same compiled chunk network);
    # sentinels sort to each bucket's tail, so no compaction needed --------
    sorted_b = bitonic.sort_chunks_ascending(
        [b.reshape(p.nb_pad * c_rows, LANES) for b in packed],
        c_rows,
        num_cmp,
        interpret=interpret,
    )
    sorted_b = [s.reshape(p.nb_pad, c_rows, LANES) for s in sorted_b]

    # ---- exact concatenation (ascending-overwrite Pallas kernel) ---------
    grid_spec_c = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (_K, c_rows, LANES),
                lambda j, b0r, b0br, c_, n_: (b0br[j], 0, 0),
            )
        ]
        * n_planes
        + [
            pl.BlockSpec(
                (_K, c_rows, LANES),
                lambda j, b0r, b0br, c_, n_: (b0br[j] + 1, 0, 0),
            )
        ]
        * n_planes,
        out_specs=[
            pl.BlockSpec(
                (1, c_rows, LANES), lambda j, b0r, b0br, c_, n_: (j, 0, 0)
            )
        ]
        * n_planes,
        scratch_shapes=[pltpu.VMEM((3 * c_rows + 8, LANES), jnp.int32)]
        * n_planes,
    )
    outs = pl.pallas_call(
        functools.partial(_concat_kernel, c_rows, num_cmp),
        grid_spec=grid_spec_c,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), jnp.int32)
        ]
        * n_planes,
        compiler_params=params,
        interpret=interpret,
    )(b0, b0b, cum, nv.reshape(1), *sorted_b, *sorted_b)
    if n_planes == 1 and not isinstance(outs, (list, tuple)):
        outs = [outs]
    return [o.reshape(rows, LANES) for o in outs], overflow
