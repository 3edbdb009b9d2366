"""Stable mask compaction — one gather pass instead of a full sort.

Compaction (kept rows to the front, original order preserved) is the
engine's most-trafficked relational primitive: filter rides it directly,
sort-based groupby extracts its group boundaries with it, the dense
hash-aggregate compacts present bins, and every join compacts its probe
output.  Through round 3 it ran as a composite-key bitonic sort
(ops/filter.py) — log²(n) compare-exchange substages for what is
informationally a single streaming pass.  This kernel does it in one
Pallas pass per chunk plus one stitch pass:

  1. within-row prefix sums of the mask (static lane rolls);
  2. per-row leftpack — a 7-step branchless binary search over the row
     prefix finds the lane of the j-th kept element, then one lane gather
     per data plane packs it (the TPU replacement for the reference's
     ballot-rank compaction idiom: subgroupBallotExclusiveBitCount ranks
     in radix/scattering.comp:141-143 — lane-wise rank via prefix + gather
     instead of per-lane ballots);
  3. per-row runs merge into one contiguous chunk prefix, level by level
     (pairs of runs butt-joined).  Levels 0..2 are fully vectorized: the
     odd run lane-rotates by lenA mod 128 (per-row lane gather) and drops
     by lenA//128 rows (select among 2^k+1 statically-rolled copies).
     Levels 3+ loop over the (few) remaining pairs with pack-kernel-style
     dynamic sublane windows (kernels/msd.py::_pack_kernel machinery);
  4. chunks' valid prefixes stitch at the XLA level: one forward
     dynamic_update_slice per chunk — each later chunk's write overwrites
     its predecessor's garbage tail, so no masking pass is needed.

Measured v5e (2 planes, chained, exact vs NumPy): 2.7 G rows/s at 2^22 —
~4x the composite-sort path it replaces, flat in mask density.

Like everything here the movement is gathers and block DMA, never XLA
scatter (pathological on TPU — NOTES.md).  The reference has no filter
operator at all (SURVEY §2e); this is BASELINE config 3's primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
K_VEC = 3  # merge levels 0..K_VEC-1 vectorized; >= K_VEC scalar-looped


def _log2(x: int) -> int:
    return x.bit_length() - 1


def _compact_chunk_kernel(c_rows, n_planes, mask_ref, *refs):
    """Compact one (c_rows, 128) chunk row-major: kept elements move to the
    chunk's flat prefix in original order; the tail is garbage.

    refs: n_planes data (1, c_rows, L) + n_planes out (1, c_rows, L)
          + n_planes VMEM scratch (c_rows, L) + 1 prefix scratch (c_rows, L)
          holding the inclusive row prefix (scalar-read at dynamic rows by
          the level >= K_VEC pair loop).
    """
    x_refs = refs[:n_planes]
    out_refs = refs[n_planes : 2 * n_planes]
    cur_refs = refs[2 * n_planes : 3 * n_planes]
    ex_ref = refs[3 * n_planes]

    lane = jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 0)

    m = mask_ref[0]
    # within-row inclusive prefix p, row counts kc (broadcast column)
    p = m
    for d in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= d, pltpu.roll(p, d, 1), 0)
    kc = jax.lax.broadcast_in_dim(p[:, LANES - 1], (c_rows, LANES), (0,))

    # per-row leftpack: first lane whose prefix reaches j+1
    tgt = lane + 1
    lo = jnp.zeros((c_rows, LANES), jnp.int32)
    for b in (64, 32, 16, 8, 4, 2, 1):
        nxt = lo + b
        pv = jnp.take_along_axis(p, jnp.minimum(nxt - 1, LANES - 1), axis=1)
        adv = (nxt <= LANES) & (pv < tgt)
        lo = jnp.where(adv, nxt, lo)
    gidx = jnp.minimum(lo, LANES - 1)

    # row-level prefix over kc (static sublane rolls)
    R = kc
    d = 1
    while d < c_rows:
        R = R + jnp.where(rowi >= d, pltpu.roll(R, d, 0), 0)
        d *= 2
    ex_ref[...] = R  # inclusive: E[i] = R[i-1], E[0] = 0

    base_excl = R - kc  # E[group base] per row, groups of 1
    gend = R  # E[group end] per row

    planes = [jnp.take_along_axis(x[0], gidx, axis=1) for x in x_refs]

    # vectorized merge levels: group pairs (A even, B odd) butt-join; B's
    # element i moves to pair-local position lenA + i, i.e. lane-rotate by
    # lenA%128 then rise delta = 2^k - lenA//128 - carry rows
    for k in range(min(K_VEC, _log2(c_rows))):
        h = 1 << k
        is_b = ((rowi >> k) & 1) != 0
        aexcl = jnp.where(is_b, pltpu.roll(base_excl, h, 0), base_excl)
        pend = jnp.where(is_b, gend, pltpu.roll(gend, (-h) % c_rows, 0))
        bexcl = jnp.where(is_b, base_excl, gend)
        lenA = bexcl - aexcl
        a_q = lenA >> 7
        a_d = lenA & 127
        t = (rowi & (2 * h - 1)) * LANES + lane
        delta = h - a_q - jnp.where(lane < a_d, 1, 0)
        keep_a = t < lenA
        new_planes = []
        for pp in planes:
            rot = jnp.take_along_axis(pp, (lane - a_d) & 127, axis=1)
            mv = rot  # delta == 0 candidate
            for dd in range(1, h + 1):
                mv = jnp.where(
                    delta == dd, pltpu.roll(rot, (-dd) % c_rows, 0), mv
                )
            new_planes.append(jnp.where(keep_a, pp, mv))
        planes = new_planes
        base_excl, gend = aexcl, pend

    for cur, pp in zip(cur_refs, planes):
        cur[...] = pp

    # scalar merge levels: few pairs remain; each reads its run bounds from
    # the prefix scratch and moves B with one dynamic-window gather+store
    for k in range(min(K_VEC, _log2(c_rows)), _log2(c_rows)):
        h = 1 << k
        n_pairs = c_rows >> (k + 1)
        span = 2 * h

        def body(pi, _, h=h, span=span):
            a_base = pi * span
            b_base = a_base + h
            aexcl = jnp.where(a_base == 0, 0, ex_ref[a_base - 1, 0])
            bexcl = ex_ref[b_base - 1, 0]
            pend = ex_ref[a_base + span - 1, 0]
            lenA = bexcl - aexcl
            a_q = lenA >> 7
            a_d = lenA & 127

            # skip when A is full (B already adjacent) or B is empty
            @pl.when((lenA < h * LANES) & (pend > bexcl))
            def _():
                lane2 = jax.lax.broadcasted_iota(
                    jnp.int32, (h + 1, LANES), 1
                )
                row2 = jax.lax.broadcasted_iota(
                    jnp.int32, (h + 1, LANES), 0
                )
                t = (a_q + row2) * LANES + lane2
                idx = (lane2 - a_d) & 127
                sel = lane2 >= a_d
                for cur in cur_refs:
                    src = cur[pl.ds(b_base, h)]
                    ga = jnp.take_along_axis(
                        jnp.concatenate([src, src[:1]], axis=0), idx, axis=1
                    )
                    gb = jnp.take_along_axis(
                        jnp.concatenate([src[:1], src], axis=0), idx, axis=1
                    )
                    mv = jnp.where(sel, ga, gb)
                    w = cur[pl.ds(a_base + a_q, h + 1)]
                    w = jnp.where(t < lenA, w, mv)
                    cur[pl.ds(a_base + a_q, h + 1)] = w
            return 0

        jax.lax.fori_loop(0, n_pairs, body, 0)

    for out, cur in zip(out_refs, cur_refs):
        out[0] = cur[...]


def compact_flat(mask, planes, c_rows, interpret=False):
    """Stable-compact i32 planes by an i32 0/1 mask (any length n).

    Returns (outs, count): each (n,) plane reordered so rows with mask != 0
    occupy the first `count` slots in original order; the tail is garbage.
    c_rows: chunk height (pow2 >= 8); each grid step compacts one
    c_rows*128-element chunk, then one forward dynamic_update_slice per
    chunk stitches the valid prefixes (later writes overwrite predecessors'
    garbage tails).
    """
    n = mask.shape[0]
    C = c_rows * LANES
    n_chunks = -(-n // C)
    total = n_chunks * C
    if total != n:
        mask = jnp.concatenate(
            [mask, jnp.zeros((total - n,), jnp.int32)]
        )
        planes = [
            jnp.concatenate([x, jnp.zeros((total - n,), x.dtype)])
            for x in planes
        ]
    m3 = mask.reshape(n_chunks, c_rows, LANES)
    x3 = [x.reshape(n_chunks, c_rows, LANES) for x in planes]
    np_ = len(planes)

    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    packed = pl.pallas_call(
        functools.partial(_compact_chunk_kernel, c_rows, np_),
        grid=(n_chunks,),
        compiler_params=params,
        in_specs=[pl.BlockSpec((1, c_rows, LANES), lambda c: (c, 0, 0))]
        * (1 + np_),
        out_specs=[pl.BlockSpec((1, c_rows, LANES), lambda c: (c, 0, 0))]
        * np_,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), jnp.int32)
        ]
        * np_,
        scratch_shapes=[pltpu.VMEM((c_rows, LANES), jnp.int32)] * (np_ + 1),
        interpret=interpret,
    )(m3, *x3)
    if np_ == 1 and not isinstance(packed, (list, tuple)):
        packed = [packed]

    counts = jnp.sum(m3, axis=(1, 2))
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    ).astype(jnp.int32)

    outs = []
    for pk in packed:
        flat = pk.reshape(n_chunks, C)

        def body(c, acc, flat=flat):
            return jax.lax.dynamic_update_slice(acc, flat[c], (offs[c],))

        res = jax.lax.fori_loop(1, n_chunks, body, flat.reshape(-1))
        outs.append(res[:n])
    return outs, offs[n_chunks]
