"""Round-5 kernel-engineering probes: comparison-free data-movement
primitives for the radix engine (VERDICT r4 next-round #1).

Each probe measures ONE candidate primitive on HW (correctness + chained
throughput), so the counting-sort design can be chosen from measured
reality instead of guesses:

  lane_gather    arbitrary per-element gather along lanes (axis=1)
                 [known-good from tools/probe_gather2.py: ~49 G elems/s]
  sublane_gather arbitrary per-element gather along SUBLANES (axis=0) —
                 the unlock for cheap cross-row movement, support unknown
  transpose      in-kernel (128,128) i32 transpose
  rank16 / rank256  stable in-row rank among equal digits via the
                 L-triangular one-hot matmul: 128*bins MACs/elem
  permute_b      the factored one-hot MXU subtile permutation, batched
                 B subtiles per grid step with lane-major layouts (the
                 r4 prototype ran one (S,1)-layout subtile per step at
                 0.20 G elems/s)

Usage: python tools/probe_movement.py [probe ...]   (default: all)
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


def _time_chain(build_fn, x_args, n_items, iters=16, reps=4):
    """Chained-iteration timing: (t_k - t_1) / (k - 1)."""
    def chain(k):
        @jax.jit
        def g(*args):
            out = args
            for _ in range(k):
                out = build_fn(*out)
            return out
        return g

    f1, fk = chain(1), chain(iters)

    def run(fn):
        t0 = time.perf_counter()
        r = fn(*x_args)
        jax.device_get(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)
    t1 = min(run(f1) for _ in range(reps))
    tk = min(run(fk) for _ in range(reps))
    dt = max((tk - t1) / (iters - 1), 1e-9)
    return n_items / dt


# --- lane / sublane gathers --------------------------------------------------


def _gather_kernel(axis, x_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=axis)


def probe_gather(axis):
    R = 512  # rows per block
    T = 256  # grid steps -> 16M elements
    rng = np.random.default_rng(0)
    x = rng.integers(-2**31, 2**31, (T * R, LANES)).astype(np.int32)
    if axis == 1:
        idx = rng.integers(0, LANES, (T * R, LANES)).astype(np.int32)
    else:
        idx = rng.integers(0, R, (T * R, LANES)).astype(np.int32)

    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0))
    f = lambda a, b: pl.pallas_call(  # noqa: E731
        functools.partial(_gather_kernel, axis),
        grid=(T,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T * R, LANES), jnp.int32),
    )(a, b)

    xj, ij = jnp.asarray(x), jnp.asarray(idx)
    out = np.asarray(jax.device_get(jax.jit(f)(xj, ij)))
    want = np.concatenate([
        np.take_along_axis(x[t * R:(t + 1) * R], idx[t * R:(t + 1) * R],
                           axis=axis)
        for t in range(T)
    ])
    ok = np.array_equal(out, want)
    rate = _time_chain(lambda a: (f(a, ij),), (xj,), x.size)
    name = "lane_gather" if axis == 1 else "sublane_gather"
    print(f"{name}: correct={ok} rate={rate/1e9:.2f} G elems/s", flush=True)


# --- transpose ---------------------------------------------------------------


def _transpose_kernel(x_ref, out_ref):
    out_ref[...] = x_ref[...].T


def probe_transpose():
    T = 1024  # 16M elements in (128,128) tiles
    rng = np.random.default_rng(1)
    x = rng.integers(-2**31, 2**31, (T, LANES, LANES)).astype(np.int32)
    spec = pl.BlockSpec((1, LANES, LANES), lambda i: (i, 0, 0))

    def f(a):
        return pl.pallas_call(
            lambda x_ref, o_ref: o_ref.__setitem__(
                (0,), x_ref[0].T
            ),
            grid=(T,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T, LANES, LANES), jnp.int32),
        )(a)

    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    ok = np.array_equal(out, x.transpose(0, 2, 1))
    rate = _time_chain(lambda a: (f(a),), (xj,), x.size)
    print(f"transpose128: correct={ok} rate={rate/1e9:.2f} G elems/s",
          flush=True)


# --- MXU L-triangular in-row rank ---------------------------------------------


def _rank_kernel(bins, rows, x_ref, out_ref):
    """Stable in-row rank among equal digits: rank[r,l] = #{l'<l: d[r,l']==
    d[r,l]}.  P = Ltri @ OH per row gives prefix counts per bin; the rank
    extraction is sum_b OH[l,b] * P[l,b] (bins VPU mult-adds/elem)."""
    d = x_ref[...] & (bins - 1)  # (rows, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ltri = (lane < row).astype(jnp.bfloat16)  # strict lower triangular
    # one row of 128 elements at a time: OH (128, bins) bf16, P = L @ OH
    for r in range(rows):
        dr = d[r].reshape(LANES, 1)  # (128,1)
        b_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, bins), 1)
        oh = (dr == b_iota).astype(jnp.bfloat16)  # (128, bins)
        pfx = jax.lax.dot_general(
            ltri, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, bins) prefix counts
        rank_r = jnp.sum(
            jnp.where(dr == b_iota, pfx, jnp.float32(0)),
            axis=1, keepdims=True,
        ).astype(jnp.int32)  # (128, 1)
        out_ref[r, :] = rank_r.reshape(1, LANES)[0]


def probe_rank(bins):
    R = 8    # rows per grid step
    T = 512  # 512K elements
    rng = np.random.default_rng(2)
    x = rng.integers(0, 2**31, (T * R, LANES)).astype(np.int32)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0))

    def f(a):
        return pl.pallas_call(
            functools.partial(_rank_kernel, bins, R),
            grid=(T,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T * R, LANES), jnp.int32),
        )(a)

    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    d = x & (bins - 1)
    want = np.zeros_like(d)
    for row in range(d.shape[0]):
        seen = {}
        for l in range(LANES):
            want[row, l] = seen.get(d[row, l], 0)
            seen[d[row, l]] = want[row, l] + 1
    ok = np.array_equal(out, want)
    rate = _time_chain(lambda a: (f(a) ^ a,), (xj,), x.size)
    print(f"rank{bins}: correct={ok} rate={rate/1e9:.2f} G elems/s",
          flush=True)


# --- batched factored one-hot MXU permute -------------------------------------

S = 2048          # subtile elements
SROWS = S // LANES


def _permute_b_kernel(B, x_ref, dhi_ref, dlo8_ref, out_ref):
    """B subtiles per grid step; all operands stay (16,128)-native.

    Layouts: x (B, 16, 128) i32; dest factored on the HOST into
    dhi = dest >> 5 (B,16,128) and dlo8 = dest & 31 (B,16,128).
    Per subtile: oh_hi built as (S_sub... — the contraction needs the
    element axis contiguous; here each subtile is processed as 16 row-
    blocks of 128 via dot_general accumulation, keeping every elementwise
    op on native (16,128) tiles (the r4 prototype's (S,1) layouts were the
    overhead).  tmp[hi, j] accumulates over row-blocks: for row r,
    oh_hi_r (64, 128) one-hot of dhi over lanes, b_r (128, 128) =
    onehot_lo * byte — tmp += oh_hi_r @ b_r^T ... (dims: (64,128)x(128,128))
    """
    j128 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (64, LANES), 0)
    shift = 8 * (3 - (j128 >> 5))  # (1,128) byte selector per output lane
    for b in range(B):
        x = x_ref[b]        # (16, 128) i32
        dhi = dhi_ref[b]    # (16, 128) in [0, 64)
        dlo = dlo8_ref[b]   # (16, 128) in [0, 32)
        tmp = jnp.zeros((64, LANES), jnp.float32)
        for r in range(SROWS):
            xr = x[r:r + 1, :]      # (1,128)
            hir = dhi[r:r + 1, :]   # (1,128)
            lor = dlo[r:r + 1, :]
            # oh_hi_r[h, l] = [dhi[l] == h]   (64,128) bf16
            oh_hi = (hir == hi_iota).astype(jnp.bfloat16)
            # b_r[j, l] = [dlo[l] == j&31] * byte_{3-j>>5}(x[l])  (128,128)
            match = (lor == (j128.T & 31)).astype(jnp.bfloat16)  # (128,128)
            bytes_b = (
                jax.lax.shift_right_logical(
                    jnp.broadcast_to(xr, (LANES, LANES)), shift.T
                ) & 0xFF
            ).astype(jnp.bfloat16)  # (128,128): row j = byte sel, col l = elem
            br = match * bytes_b
            tmp += jax.lax.dot_general(
                oh_hi, br,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (64, 128)
        out_ref[b] = tmp.astype(jnp.int32)


def probe_permute_b(B=8):
    T = 256 // B  # total 256 subtiles = 512K elements
    rng = np.random.default_rng(3)
    x = rng.integers(-2**31, 2**31, (T * B, SROWS, LANES)).astype(np.int32)
    dest = np.stack([
        rng.permutation(S).astype(np.int32).reshape(SROWS, LANES)
        for _ in range(T * B)
    ])
    dhi, dlo = dest >> 5, dest & 31

    spec_in = pl.BlockSpec((B, SROWS, LANES), lambda i: (i, 0, 0))
    spec_out = pl.BlockSpec((B, 64, LANES), lambda i: (i, 0, 0))

    def f(a, h, lo):
        return pl.pallas_call(
            functools.partial(_permute_b_kernel, B),
            grid=(T,),
            in_specs=[spec_in] * 3,
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct((T * B, 64, LANES), jnp.int32),
        )(a, h, lo)

    def recombine(tmp):
        return (
            (tmp[:, :, 0:32] << 24) | (tmp[:, :, 32:64] << 16)
            | (tmp[:, :, 64:96] << 8) | tmp[:, :, 96:128]
        ).reshape(-1, SROWS, LANES)

    xj = jnp.asarray(x)
    hj, lj = jnp.asarray(dhi), jnp.asarray(dlo)
    out = np.asarray(jax.device_get(jax.jit(
        lambda a: recombine(f(a, hj, lj)))(xj)))
    want = np.empty_like(x)
    for t in range(T * B):
        want[t].reshape(-1)[dest[t].reshape(-1)] = x[t].reshape(-1)
    ok = np.array_equal(out, want)
    rate = _time_chain(
        lambda a: (recombine(f(a, hj, lj)),), (xj,), x.size
    )
    print(f"permute_b{B}: correct={ok} rate={rate/1e9:.2f} G elems/s",
          flush=True)


PROBES = {
    "lane_gather": lambda: probe_gather(1),
    "sublane_gather": lambda: probe_gather(0),
    "transpose": probe_transpose,
    "rank16": lambda: probe_rank(16),
    "rank256": lambda: probe_rank(256),
    "permute_b": probe_permute_b,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        try:
            PROBES[n]()
        except Exception as e:  # noqa: BLE001 - report and continue
            msg = str(e).split("\n")[0][:200]
            print(f"{n}: FAILED {type(e).__name__}: {msg}", flush=True)


# --- composite: sublane gather via transpose + lane gather --------------------
#
# Mosaic rejects take_along_axis(axis=0) outright (probe above), but within a
# 128-row block the same movement is expressible with supported primitives:
#   out[r, l] = x[idx[r, l], l]
#   y = x.T                      # (l, r)
#   z[l, r] = y[l, idxT[l, r]]   # lane gather with idxT = idx.T
#   out = z.T
# i.e. cross-row arbitrary movement = 2 transposes + 1 lane gather.


def _subl_via_t_kernel(x_ref, idx_ref, out_ref):
    y = x_ref[...].T
    it = idx_ref[...].T
    z = jnp.take_along_axis(y, it, axis=1)
    out_ref[...] = z.T


def probe_sublane_via_t():
    R = LANES
    T = 1024  # 16M elements
    rng = np.random.default_rng(4)
    x = rng.integers(-2**31, 2**31, (T * R, LANES)).astype(np.int32)
    idx = rng.integers(0, R, (T * R, LANES)).astype(np.int32)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0))

    def f(a, b):
        return pl.pallas_call(
            _subl_via_t_kernel,
            grid=(T,),
            in_specs=[spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T * R, LANES), jnp.int32),
        )(a, b)

    xj, ij = jnp.asarray(x), jnp.asarray(idx)
    out = np.asarray(jax.device_get(jax.jit(f)(xj, ij)))
    want = np.concatenate([
        np.take_along_axis(x[t * R:(t + 1) * R], idx[t * R:(t + 1) * R],
                           axis=0)
        for t in range(T)
    ])
    ok = np.array_equal(out, want)
    rate = _time_chain(lambda a: (f(a, ij),), (xj,), x.size)
    print(f"sublane_via_T: correct={ok} rate={rate/1e9:.2f} G elems/s",
          flush=True)


PROBES["sublane_via_T"] = probe_sublane_via_t



# --- batched L-tri rank: ONE matmul pair per 8-row block ---------------------
#
# The naive rank16/rank256 probes loop rows with degenerate (128,bins)
# matmuls and measure loop overhead (~0.6 G), not MACs.  Batched form for
# bins=16: OHD (128, 128) with column c = r*16+b one-hot over the block's
# 8 rows; P = Ltri @ OHD gives every row's per-bin lane-prefix counts in
# one (128,128)x(128,128) matmul; rank extraction is a second matmul
# (P ⊙ OHD) @ G with G[c, r'] = [c>>4 == r'], then a (128,128) transpose.
# 4096 MACs/elem total -> 24 G elems/s MXU ceiling.


def _rank16b_kernel(x_ref, out_ref):
    d = x_ref[...] & 15  # (8, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ltri = (lane < row).astype(jnp.bfloat16)

    # dT[l, r] = d[r, l] padded to (128,128); static-index lane gather
    # spreads dT over the 8x16 column grouping
    dpad = jnp.concatenate(
        [d, jnp.zeros((LANES - 8, LANES), jnp.int32)], axis=0
    )
    dT = dpad.T  # (128 lanes, 128): col r<8 holds d[r, l]
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    r_of = c_iota >> 4  # column group -> source row (only c<128 used)
    d_bcast = jnp.take_along_axis(dT, r_of, axis=1)  # [l, c] = d[c>>4, l]
    ohd = (d_bcast == (c_iota & 15)).astype(jnp.bfloat16)  # (128, 128)

    pfx = jax.lax.dot_general(
        ltri, ohd, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128, 128): [l, r*16+b] prefix count
    sel = pfx * ohd.astype(jnp.float32)
    grp = (
        (jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0) >> 4)
        == jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.bfloat16)  # G[c, r'] = [c>>4 == r']
    rank_mat = jax.lax.dot_general(
        sel.astype(jnp.bfloat16), grp,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128 lanes, 128): col r' = rank of row r' (cols >= 8 are 0)
    out_ref[...] = rank_mat.T[:8].astype(jnp.int32)


def probe_rank16b():
    R = 8
    T = 2048  # 2M elements
    rng = np.random.default_rng(5)
    x = rng.integers(0, 2**31, (T * R, LANES)).astype(np.int32)
    spec = pl.BlockSpec((R, LANES), lambda i: (i, 0))

    def f(a):
        return pl.pallas_call(
            _rank16b_kernel,
            grid=(T,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((T * R, LANES), jnp.int32),
        )(a)

    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    d = x & 15
    want = np.zeros_like(d)
    for row in range(d.shape[0]):
        seen = {}
        for l in range(LANES):
            want[row, l] = seen.get(d[row, l], 0)
            seen[d[row, l]] = want[row, l] + 1
    ok = np.array_equal(out, want)
    rate = _time_chain(lambda a: (f(a) ^ a,), (xj,), x.size)
    print(f"rank16b: correct={ok} rate={rate/1e9:.2f} G elems/s", flush=True)


PROBES["rank16b"] = probe_rank16b



def probe_global_take(logn=26):
    """XLA global gather val[perm] by a random permutation — the primitive a
    2-plane (key,iota) stable-pairs path + payload gather would need.
    Measured v5e 2026-08-20: 0.140 / 0.069 / 0.069 G elems/s at
    2^22/2^26/2^28 — 5-10x slower than the entire 3-plane stable sort, so
    the 3-plane design stands (no TPU-native arbitrary global gather
    exists; cf. the one-hot permute post-mortem in NOTES.md)."""
    import time

    n = 1 << logn
    rng = np.random.default_rng(logn)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 2**31, n, dtype=np.int32))

    def chain(k):
        @jax.jit
        def f(p, v):
            out = v
            for _ in range(k):
                out = jnp.take(out, p)
            return out
        return f

    f1, f3 = chain(1), chain(3)

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(f(perm, val)[:8])
        return time.perf_counter() - t0

    run(f1); run(f3)
    t1 = min(run(f1) for _ in range(4))
    t3 = min(run(f3) for _ in range(4))
    dt = max((t3 - t1) / 2, 1e-9)
    got = np.asarray(jax.device_get(f1(perm, val)))
    want = np.asarray(jax.device_get(val))[np.asarray(jax.device_get(perm))]
    ok = np.array_equal(got, want)
    print(f"global_take 2^{logn}: correct={ok} rate={n/dt/1e9:.3f} G elems/s",
          flush=True)


PROBES["global_take"] = probe_global_take
if __name__ == "__main__":
    main()
