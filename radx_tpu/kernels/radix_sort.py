"""Radix distribution sort — the production strategy="radix" pipeline.

This is the TPU-native realization of the reference's counting → partition
→ scattering radix pipeline (dispatch loop radx_implement.inl:421-447;
stable ranked scatter RadX2-SM7-DEV/scattering.comp:125-127), re-designed
around what TPUs do at full rate — block DMA, lane gathers, static-rolled
merge networks, one-hot MXU matmuls — instead of the subgroup scatter TPUs
lack:

  1. **counting** — `radix.chunk_histograms` computes per-chunk 256-bin
     top-byte digit histograms as nibble-factored one-hot MXU matmuls
     (counting.comp:50-73's per-workgroup histogram).
  2. **partition** — `radix.scan_bases` turns them into the global digit
     CDF (partition.comp:38-72's hierarchical scan).  The CDF drives
     *skew-aware splitter selection*: bucket cut points are sample
     quantiles clamped into the digit interval the exact CDF assigns them,
     so clustered/skewed inputs cannot misplace a cut across digits the
     way pure sampling can.  Exact per-chunk cut ranks then come from the
     msd module's MXU rank search over the sorted chunks.
  3. **scattering** — the slot-pack kernel (kernels/msd.py `_pack_kernel`)
     writes every (chunk, bucket) run through a scalar-prefetch output
     index map into bucket-major padded slots: the reference's per-key
     scatter becomes per-run block DMA.
  4. **merge finish** — because every packed slot is already a sorted run
     (a window of a sorted chunk), each bucket region is finished by
     `bitonic.merge_slots_ascending` — O(C·log n_slots·log C) merge work
     entirely in VMEM — instead of the sample-split engine's full
     O(C·log²C) re-sort.  The exact-concat kernel then places each
     bucket's valid prefix at its exact global offset.

Cost vs the flagship bitonic network: one full chunk-sort pass + a merge
pass over headroom·N + ~3 bandwidth passes, *flat in N* — but both heavy
phases are themselves comparison networks (substage conservation), so the
engine measures BELOW the bitonic network at every single-chip size and
there is no crossover; the round-5 primitive probes closed the
comparison-free alternative too (NOTES.md round-5 post-mortem).  It ships
as the reference-parity pipeline and the skew-robust splitter machinery
shared with parallel/dist_sort, not as the default.

Skew contract: adversarial inputs (massive duplicate runs) can overflow a
slot or crowd an output block; the sort returns an `overflow` flag and
ops.sort falls back to the bitonic network under lax.cond — the same
total-dispatch contract as kernels/msd.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radx_tpu.kernels import bitonic, radix
from radx_tpu.kernels.msd import (
    _concat_kernel,
    _pack_kernel,
    _splitter_ranks,
    _K,
    _PAD,
    _U,
)

LANES = 128
_SIGN = 0x80000000
# Bucket capacity over the mean load, by slot height.  Tighter than the
# sample-split engine's 1.44 (histogram-clamped splitters bound the cut
# error to within-digit sampling noise), but the floor must cover the
# per-(chunk,bucket) run fluctuation, whose relative sigma ~ 1/sqrt(slot):
# slot_rows=8 runs average ~750 elements, so +-4.5 sigma of Poisson noise
# alone is ~16% (2^24 at slot_rows=8 overflowed on UNIFORM data at a flat
# 1.25 — measured on v5e).
HEADROOM = {8: 1.40, 16: 1.32}  # >= 32 rows: _HEADROOM_WIDE
_HEADROOM_WIDE = 1.25
_NS = 2048  # max splitter samples per chunk


class Plan(NamedTuple):
    C: int
    n_chunks: int
    c_rows: int
    slot_rows: int
    nb: int
    nb_pad: int
    s_pad: int
    t_rows: int


def pick_chunk_rows(n: int, base: int, max_rows: int = 4096) -> int:
    """Smallest pow2 chunk height >= base whose geometry keeps
    slot_rows = c_rows/n_chunks >= 16 (narrower slots force a taller
    headroom, HEADROOM above — phase-C work scales with it), falling back
    to the >= 8 pack floor when 16 is unreachable within max_rows."""
    c = base
    while c < max_rows and c * c * LANES < 16 * n:
        c *= 2
    if c * c * LANES < 8 * n:  # not even the pack floor is reachable
        c *= 2
    return c


def plan(n: int, chunk_rows: int) -> Plan | None:
    """Static geometry for a radix distribution sort of n (pow2 total)
    elements, or None when it doesn't apply (callers use bitonic)."""
    c_rows = chunk_rows
    C = c_rows * LANES
    if n % C or n < 4 * C:
        return None
    n_chunks = n // C
    if c_rows % n_chunks:
        return None
    slot_rows = c_rows // n_chunks
    if slot_rows < 8 or slot_rows & (slot_rows - 1):
        return None
    h = HEADROOM.get(slot_rows, _HEADROOM_WIDE)
    nb = int(h * n_chunks) + 1
    nb_pad = max(2 * _K, -(-nb // _U) * _U)
    s_pad = -(-(nb - 1) // 8) * 8
    return Plan(C, n_chunks, c_rows, slot_rows, nb, nb_pad, s_pad, 8)


def _digit_lo_i32(d):
    """First sign-biased i32 value whose original-uint32 top byte is d."""
    return (d ^ 128).astype(jnp.int32) << 24


def choose_splitters(keys3, flat_input, p: Plan, n_valid, interpret):
    """nb-1 monotone cut values: sample quantiles clamped into the digit
    interval the exact histogram CDF assigns each quantile target.

    keys3: (n_chunks, c_rows, 128) sorted chunks (sample source).
    flat_input: the pre-sort flat plane (valid prefix n_valid) — histogram
    source, so sentinel pads never pollute digit counts.
    """
    n_chunks, c_rows, _ = keys3.shape
    nv = jnp.asarray(n_valid, jnp.int32)

    # counting: per-chunk digit histograms (top byte, original u32 order)
    counts = radix.chunk_histograms(
        flat_input, 24, c_rows, n=nv, bias=_SIGN, interpret=interpret
    )
    # partition: global digit CDF (exclusive) — cdf[d] = # valid keys with
    # digit < d
    cdf = radix.scan_bases(counts)[0]  # (256,)

    # sample quantiles from the sorted chunks (lane-0 heads, regular
    # stride; every row head when c_rows <= _NS).  Large sample arrays
    # sort on our own engine — lax.sort of 1M+ samples would eat ~7% of
    # the whole sort's budget at 2^28.
    ns = min(_NS, c_rows)
    rstride = c_rows // ns
    raw = keys3[:, rstride // 2 :: rstride, 0].reshape(-1)
    if raw.shape[0] >= (1 << 17):
        samples = bitonic.sort_planes(
            [raw.reshape(-1, LANES)], 1024, 1, interpret=interpret
        )[0].reshape(-1)
    else:
        samples = jnp.sort(raw)
    nvs = jnp.sum((samples < _PAD).astype(jnp.int32))
    j = jnp.arange(1, p.nb, dtype=jnp.int32)
    spos = jnp.clip((j * nvs) // p.nb, 0, samples.shape[0] - 1)
    sval = samples[spos]  # (nb-1,), non-decreasing

    # digit interval per quantile target: d_j = max{d : cdf[d] <= t_j}.
    # t_j = j*nv/nb in EXACT int32: j*nv overflows i32 beyond 2^25-ish
    # (jnp.int64 silently truncates under the default x32 mode — found on
    # HW at 2^26 as garbage digit clamps), so split nv = q*nb + r.
    q, r = nv // p.nb, nv % p.nb
    t = j * q + (j * r) // p.nb  # (nb-1,) targets, exact in i32
    le = (cdf[None, 1:] <= t[:, None]).astype(jnp.int32)
    d = jnp.sum(le, axis=1)  # in [0, 255]
    lo = _digit_lo_i32(d)
    hi = lo + 0x00FFFFFF
    splitters = jnp.clip(sval, lo, hi)
    return jnp.full((p.s_pad,), _PAD, jnp.int32).at[: p.nb - 1].set(splitters)


def sort_radix(planes, chunk_rows, num_cmp, interpret=False, n_valid=None,
               unique=True):
    """Radix-distribution-sort i32 planes (ascending by planes[0], then
    planes[1] when num_cmp == 2; further planes ride along).  planes: flat
    row-major (rows, 128) as in bitonic.sort_planes; `plan` must be
    non-None for the total size (ops.sort handles the fallback).

    n_valid: count of real elements (the tail beyond it must already be
    sentinel-filled per msd._fill); defaults to the full length.

    unique=False: the compare keys may tie while rider planes differ —
    required for correctness of the tie-safe exchange (see
    bitonic._substage).

    Returns (planes_sorted, overflow) — overflow True means a run
    overflowed its slot or an output block overlaps more than _K buckets;
    the output is then NOT trustworthy and callers must fall back.
    """
    rows = planes[0].shape[0]
    total = rows * LANES
    p = plan(total, chunk_rows)
    assert p is not None, "size not supported by radix distribution sort"
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
    flat_input = planes[0].reshape(-1)

    # ---- phase 1: block-cyclic ascending chunk sorts ----------------------
    planes = bitonic.sort_chunks_ascending_cyclic(
        planes, chunk_rows, num_cmp, t_rows=p.t_rows, interpret=interpret,
        unique=unique,
    )
    x3 = [pl_.reshape(n_chunks, c_rows, LANES) for pl_ in planes]
    keys3 = x3[0]

    # ---- counting/partition: histogram-clamped splitters ------------------
    splitters = choose_splitters(keys3, flat_input, p, nv, interpret)

    # ---- exact per-chunk cut ranks (MXU rank search) ----------------------
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
    bucket_tot = jnp.sum(counts, axis=0)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(bucket_tot)]
    ).astype(jnp.int32)
    blk = jnp.arange(n_chunks, dtype=jnp.int32)[:, None] * C
    # K-window check: the concat kernel scans buckets b0[j] .. b0[j]+K-1;
    # every NONEMPTY bucket intersecting block j must fall inside that
    # window.  Empty buckets (lo == hi, e.g. the nb_pad tail) are harmless
    # to visit — their garbage stores are overwritten by the next bucket or
    # masked past n_valid — but they must not be counted as required, else
    # a padded tail spuriously trips the flag (found at n_valid < total).
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

    # ---- scattering: pack runs into bucket-major padded slots -------------
    # bounds rides as a per-chunk-blocked SMEM input (NOT scalar prefetch:
    # the full (n_chunks, nb_pad+1) table is ~1.5 MB at 2^28 geometry and
    # overflows the 1 MB SMEM — the r4 compile failure; see _pack_kernel)
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

    # ---- phase C: merge each bucket's sorted slots in VMEM ----------------
    merged = bitonic.merge_slots_ascending(
        [b.reshape(p.nb_pad * c_rows, LANES) for b in packed],
        p.slot_rows,
        c_rows,
        num_cmp,
        interpret=interpret,
        unique=unique,
    )
    merged = [m.reshape(p.nb_pad, c_rows, LANES) for m in merged]

    # ---- exact concatenation ----------------------------------------------
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
    )(b0, b0b, cum, nv.reshape(1), *merged, *merged)
    if n_planes == 1 and not isinstance(outs, (list, tuple)):
        outs = [outs]
    return [o.reshape(rows, LANES) for o in outs], overflow
