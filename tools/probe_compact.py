"""Prototype probe: gather-based stable compaction kernel (round 4).

Replaces filter/groupby's full composite bitonic sort (log^2 substages) with
a single Pallas pass per chunk:

  1. within-row prefix sums (static lane rolls)
  2. per-row leftpack: binary search over the row prefix (7 lane gathers)
     + one lane gather per data plane
  3. run-merge levels 0..2 vectorized: per-row lane gather (rotation by the
     pair's lenA mod 128) + select among 2^k+1 static sublane rolls
  4. run-merge levels 3+: scalar fori loop per pair, pack-kernel-style
     dynamic sublane windows (pl.ds) + uniform lane rotation
  5. cross-chunk stitch at the XLA level: forward dynamic_update_slice per
     chunk (later updates overwrite predecessors' garbage tails)

Probes (HW): exactness vs numpy at several shapes/densities; throughput vs
the current composite-sort compaction; and the scalar-read-from-VMEM
primitive the scalar loop depends on.

Usage: python tools/probe_compact.py [cpu]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
K_VEC = 3  # levels 0..K_VEC-1 vectorized; >= K_VEC scalar-looped


def _log2(x):
    return x.bit_length() - 1


def _compact_chunk_kernel(c_rows, n_planes, mask_ref, *refs):
    """One chunk: leftpack rows, then merge per-row runs into a contiguous
    prefix.  refs: n_planes data in (1, c_rows, L) + n_planes out
    (1, c_rows, L) + n_planes VMEM scratch (c_rows, L) + 1 excl-prefix
    scratch (c_rows, L)."""
    x_refs = refs[:n_planes]
    out_refs = refs[n_planes : 2 * n_planes]
    cur_refs = refs[2 * n_planes : 3 * n_planes]
    ex_ref = refs[3 * n_planes]

    lane = jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 0)

    m = mask_ref[0]
    # --- within-row inclusive prefix p, row counts kc ---------------------
    p = m
    for d in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= d, pltpu.roll(p, d, 1), 0)
    kc = jax.lax.broadcast_in_dim(p[:, LANES - 1], (c_rows, LANES), (0,))

    # --- per-row leftpack: L[r,j] = lane of j-th kept ---------------------
    tgt = lane + 1
    lo = jnp.zeros((c_rows, LANES), jnp.int32)
    for b in (64, 32, 16, 8, 4, 2, 1):
        nxt = lo + b
        pv = jnp.take_along_axis(p, jnp.minimum(nxt - 1, LANES - 1), axis=1)
        adv = (nxt <= LANES) & (pv < tgt)
        lo = jnp.where(adv, nxt, lo)
    gidx = jnp.minimum(lo, LANES - 1)

    # --- row exclusive prefix over kc (static sublane rolls) --------------
    R = kc
    d = 1
    while d < c_rows:
        R = R + jnp.where(rowi >= d, pltpu.roll(R, d, 0), 0)
        d *= 2
    excl = R - kc  # E[r] = kept before row r
    ex_ref[...] = R  # inclusive: E[i] = R[i-1], E[0] = 0

    base_excl = excl
    gend = R

    planes = [jnp.take_along_axis(x[0], gidx, axis=1) for x in x_refs]

    # --- vectorized merge levels ------------------------------------------
    for k in range(min(K_VEC, _log2(c_rows))):
        h = 1 << k
        is_b = ((rowi >> k) & 1) != 0
        aexcl = jnp.where(is_b, pltpu.roll(base_excl, h, 0), base_excl)
        bexcl = jnp.where(is_b, base_excl, gend)
        pend = jnp.where(is_b, gend, pltpu.roll(gend, (-h) % c_rows, 0))
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

    # --- scalar merge levels ----------------------------------------------
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


def compact(mask, planes, c_rows, interpret=False):
    """mask (n,) i32 0/1; planes list of (n,) i32.  Returns (outs, count):
    packed planes with kept elements first (original order), count kept."""
    n = mask.shape[0]
    C = c_rows * LANES
    n_chunks = -(-n // C)
    total = n_chunks * C
    if total != n:
        mask = jnp.concatenate([mask, jnp.zeros((total - n,), jnp.int32)])
        planes = [
            jnp.concatenate([x, jnp.zeros((total - n,), jnp.int32)])
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

        def body(c, acc):
            return jax.lax.dynamic_update_slice(acc, flat[c], (offs[c],))

        res = jax.lax.fori_loop(1, n_chunks, body, flat.reshape(-1))
        outs.append(res[:n])
    return outs, offs[n_chunks]


def _ref(mask, planes):
    keep = mask.astype(bool)
    outs = []
    for x in planes:
        o = np.concatenate([x[keep], x[~keep] * 0])
        outs.append(o)
    return outs, int(keep.sum())


def check(n, c_rows, density, n_planes, interpret, seed=0):
    rng = np.random.default_rng(seed)
    mask = (rng.random(n) < density).astype(np.int32)
    planes = [
        rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        for _ in range(n_planes)
    ]
    f = jax.jit(
        functools.partial(compact, c_rows=c_rows, interpret=interpret)
    )
    outs, cnt = f(jnp.asarray(mask), [jnp.asarray(x) for x in planes])
    cnt = int(cnt)
    want, wcnt = _ref(mask, planes)
    assert cnt == wcnt, (cnt, wcnt)
    for o, w in zip(outs, want):
        got = np.asarray(jax.device_get(o))[:cnt]
        if not np.array_equal(got, w[:cnt]):
            bad = np.nonzero(got != w[:cnt])[0][:10]
            raise AssertionError(
                f"mismatch n={n} c={c_rows} dens={density}: first bad "
                f"{bad}, got {got[bad]}, want {w[:cnt][bad]}"
            )
    return cnt


def bench(n, c_rows, density, n_planes, iters=16):
    rng = np.random.default_rng(1)
    mask = jnp.asarray((rng.random(n) < density).astype(np.int32))
    planes = [
        jnp.asarray(
            rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        )
        for _ in range(n_planes)
    ]

    def chain(k):
        @jax.jit
        def g(m, ps):
            outs = ps
            for _ in range(k):
                outs, cnt = compact(m, outs, c_rows)
            return outs, cnt
        return g

    f1, fk = chain(1), chain(iters)

    def run(f):
        t0 = time.perf_counter()
        r = f(mask, planes)
        jax.device_get(r[0][0][:8])
        return time.perf_counter() - t0

    run(f1), run(fk)
    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    per = max((tk - t1) / (iters - 1), 1e-9)
    print(
        f"  n=2^{_log2(n)} c_rows={c_rows} dens={density} planes={n_planes}: "
        f"{per * 1e3:.3f} ms = {n / per / 1e9:.3f} G rows/s"
    )


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    print("== exactness ==")
    for n, c, dens in [
        (1 << 13, 8, 0.5),
        (1 << 14, 16, 0.5),
        (1 << 16, 64, 0.01),
        (1 << 17, 128, 0.3),
        (1 << 18, 256, 0.9),
        (1 << 18, 256, 0.003),
        ((1 << 18) - 1000, 256, 0.5),
        (1 << 19, 512, 1.0),
        (1 << 19, 512, 0.0),
    ]:
        cnt = check(n, c, dens, 2, interpret)
        print(f"  OK n={n} c_rows={c} dens={dens} cnt={cnt}")

    if interpret:
        print("probe done (cpu)")
        return

    print("== throughput ==")
    for n, c in [(1 << 22, 256), (1 << 22, 512), (1 << 22, 1024)]:
        for dens in (0.003, 0.5):
            bench(n, c, dens, 2)
    for c in (512, 1024, 2048):
        bench(1 << 26, c, 0.5, 2)
    print("probe done")


if __name__ == "__main__":
    main()
