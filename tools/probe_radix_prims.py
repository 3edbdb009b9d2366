"""Probe 3: primitives for the round-2 MSD radix engine.

P1  sublane dynamic gather: take_along_axis(x, idx, axis=0) in-kernel,
    (a) arbitrary 2D idx, (b) per-row broadcast idx (row permutation).
P2  factored one-hot MXU permutation v2: factor (hi=dest>>4 in [0,128),
    lo=dest&15), full-width layouts, B subtiles per grid step.
P3  in-kernel cumsum along sublanes of (2048,128) i32.
P4  dynamic-distance lane-gather substage inside fori_loop (compile time
    + runtime vs the unrolled static network).
P5  run-concat candidate pass cost: row-broadcast sublane gather +
    arbitrary lane gather + select, chained B times.

Usage: python tools/probe_radix_prims.py [cpu]
"""

import functools
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _time_chain(f, args, iters=16):
    def chain(k):
        @jax.jit
        def g(*a):
            v = a[0]
            for _ in range(k):
                v = f(v, *a[1:])
            return v
        return g

    f1, fk = chain(1), chain(iters)

    def run(fn):
        t0 = time.perf_counter()
        jax.device_get(fn(*args).reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)
    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    return max((tk - t1) / (iters - 1), 1e-9)


# ---------------------------------------------------------------- P1
def probe_sublane_gather(interpret, mode):
    T, R = 32, 2048

    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=0)

    rng = np.random.default_rng(1)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    if mode == "2d":
        idx = rng.integers(0, R, (T, R, LANES)).astype(np.int32)
    else:  # row-broadcast: one source row per output row
        rows = rng.integers(0, R, (T, R, 1)).astype(np.int32)
        idx = np.broadcast_to(rows, (T, R, LANES)).copy()
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    xj, ij = jnp.asarray(x), jnp.asarray(idx)
    out = np.asarray(jax.device_get(jax.jit(f)(xj, ij)))
    want = np.take_along_axis(x, idx, axis=1)
    ok = np.array_equal(out, want)
    print(f"P1 sublane-gather[{mode}] correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v, i: f(v, i), (xj, ij))
        n = T * R * LANES
        print(f"P1 sublane-gather[{mode}]: {per*1e3:.3f} ms = "
              f"{n/per/1e9:.2f} G elems/s", flush=True)


# ---------------------------------------------------------------- P3
def probe_cumsum_sublane(interpret):
    T, R = 16, 2048

    def kernel(x_ref, o_ref):
        o_ref[0] = jnp.cumsum(x_ref[0], axis=0)

    rng = np.random.default_rng(3)
    x = rng.integers(0, 100, (T, R, LANES)).astype(np.int32)
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    ok = np.array_equal(out, np.cumsum(x, axis=1))
    print(f"P3 cumsum-sublane correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v: f(v), (xj,))
        n = T * R * LANES
        print(f"P3 cumsum-sublane: {per*1e3:.3f} ms = "
              f"{n/per/1e9:.2f} G elems/s", flush=True)


# ---------------------------------------------------------------- P4
def probe_dynamic_substage_loop(interpret):
    """Full 128-lane row-sort network with dj as a traced loop index."""
    T, R = 32, 2048

    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

        def substage(x, d, up_i):
            idx = lane ^ d
            y = jnp.take_along_axis(x, idx, axis=1)
            y_lt_i = (y < x).astype(jnp.int32)
            is_high_i = ((lane & d) != 0).astype(jnp.int32)
            take_y = (1 - (y_lt_i ^ up_i ^ is_high_i)) != 0
            return jnp.where(take_y, y, x)

        x = x_ref[0]
        for kk in range(1, 8):  # levels static (direction formula varies)
            up_i = 1 - ((lane >> kk) & 1)  # kk=7: all ones -> ascending

            def body(j, x):
                d = jnp.int32(1) << (kk - 1 - j)
                return substage(x, d, up_i)

            x = jax.lax.fori_loop(0, kk, body, x)
        o_ref[0] = x

    rng = np.random.default_rng(4)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    t0 = time.perf_counter()
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    t_compile = time.perf_counter() - t0
    ok = np.array_equal(out, np.sort(x, axis=2))
    print(f"P4 dyn-loop row-sort correct: {ok} (first run {t_compile:.1f}s)",
          flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v: f(v), (xj,))
        n = T * R * LANES
        print(f"P4 dyn-loop row-sort (28 substages): {per*1e3:.3f} ms = "
              f"{n*28/per/1e9:.1f} G substage-elems/s", flush=True)


# ---------------------------------------------------------------- P5
def probe_concat_pass(interpret, B=8):
    """B chained candidate passes: row-broadcast sublane gather + per-row
    lane rotate + masked select — the run-concat inner loop shape."""
    T, R = 16, 2048

    def kernel(x_ref, rt_ref, rot_ref, lo_ref, hi_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        acc = jnp.zeros((R, LANES), jnp.int32)
        x = x_ref[0]
        for b in range(B):
            rows = rt_ref[0, :, b:b + 1]          # (R,1)
            y = jnp.take_along_axis(
                x, jax.lax.broadcast_in_dim(rows, (R, LANES), (0, 1)), axis=0)
            rot = rot_ref[0, :, b:b + 1]
            idx = (lane + rot) & (LANES - 1)
            y = jnp.take_along_axis(y, idx, axis=1)
            m = (lane >= lo_ref[0, :, b:b + 1]) & (lane < hi_ref[0, :, b:b + 1])
            acc = jnp.where(m, y, acc)
        o_ref[0] = acc

    rng = np.random.default_rng(5)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    rt = rng.integers(0, R, (T, R, B)).astype(np.int32)
    rot = rng.integers(0, LANES, (T, R, B)).astype(np.int32)
    bounds = np.sort(rng.integers(0, LANES + 1, (T, R, B, 2)), axis=3).astype(np.int32)
    lo, hi = bounds[..., 0], bounds[..., 1]
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    bspec = pl.BlockSpec((1, R, B), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,),
        in_specs=[spec, bspec, bspec, bspec, bspec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    args = tuple(jnp.asarray(a) for a in (x, rt, rot, lo, hi))
    out = np.asarray(jax.device_get(jax.jit(f)(*args)))
    # reference
    lanes = np.arange(LANES)
    want = np.zeros_like(x)
    for t in range(T):
        for b in range(B):
            y = x[t][rt[t, :, b]]
            idx = (lanes[None, :] + rot[t, :, b:b + 1]) & (LANES - 1)
            y = np.take_along_axis(y, idx, axis=1)
            m = (lanes[None, :] >= lo[t, :, b:b + 1]) & (lanes[None, :] < hi[t, :, b:b + 1])
            want[t] = np.where(m, y, want[t])
    ok = np.array_equal(out, want)
    print(f"P5 concat-pass[B={B}] correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v, *r: f(v, *r), args)
        n = T * R * LANES
        print(f"P5 concat-pass[B={B}]: {per*1e3:.3f} ms = "
              f"{n/per/1e9:.2f} G out-elems/s ({n*B/per/1e9:.1f} G cand/s)",
              flush=True)


# ---------------------------------------------------------------- P7
def probe_xla_bisect(interpret):
    """Host-level (plain XLA) vectorized binary search: 512K queries into
    a 1M-entry sorted table — the run-table -> per-output-row candidate
    construction cost for pass B of the MSD radix (NOT jnp.searchsorted,
    which was measured pathological; explicit gather loop)."""
    nq, nt = 1 << 19, 1 << 20
    rng = np.random.default_rng(7)
    table = np.sort(rng.integers(0, 2**31, nt).astype(np.int32))
    q = rng.integers(0, 2**31, nq).astype(np.int32)

    @jax.jit
    def bisect(table, q):
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, nt, jnp.int32)
        for _ in range(21):
            mid = (lo + hi) >> 1
            v = jnp.take(table, mid)
            go_hi = v <= q
            lo = jnp.where(go_hi, mid + 1, lo)
            hi = jnp.where(go_hi, hi, mid)
        return lo

    tj, qj = jnp.asarray(table), jnp.asarray(q)
    out = np.asarray(jax.device_get(bisect(tj, qj)))
    want = np.searchsorted(table, q, side="right")
    ok = np.array_equal(out, want)
    print(f"P7 xla-bisect correct: {ok}", flush=True)
    t0 = time.perf_counter()
    per = _time_chain(lambda qq, tt: bisect(tt, qq), (qj, tj), iters=8)
    print(f"P7 xla-bisect 512K/1M: {per*1e3:.3f} ms "
          f"(probe wall {time.perf_counter()-t0:.1f}s)", flush=True)


def main():
    interpret = "cpu" in sys.argv
    probes = [
        ("P1-2d", functools.partial(probe_sublane_gather, mode="2d")),
        ("P1-row", functools.partial(probe_sublane_gather, mode="row")),
        ("P3", probe_cumsum_sublane),
        ("P4", probe_dynamic_substage_loop),
        ("P5", probe_concat_pass),
        ("P7", probe_xla_bisect),
    ]
    for name, fn in probes:
        try:
            fn(interpret)
        except Exception:
            print(f"{name} FAILED:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
    print("probe3 done", flush=True)


if __name__ == "__main__":
    main()
