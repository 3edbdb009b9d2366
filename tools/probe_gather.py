"""Probe Mosaic support + speed for the radix movement primitives (round 2).

Probes, each independent (one failure doesn't stop the rest):
  A. sublane gather in-kernel: out[r,l] = x[idx[r,l], l]  (take_along_axis axis=0)
  B. lane gather in-kernel:    out[r,l] = x[r, idx[r,l]]  (take_along_axis axis=1)
  C. composed 2D permutation via sublane gather of a pre-lane-rotated layout
     (not run by default; A+B speeds decide the design first)
  D. int8 matmul exactness + speed (i8 x i8 -> i32 dot_general)
  E. bf16 matmul speed baseline (same shapes as D)

Usage: python tools/probe_gather.py [cpu]
"""

import functools
import sys
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R = 2048  # rows per block (block = R*128 elems = 1 MiB of i32)
LANES = 128


def _time_chain(build_fn, args, iters=8, label=""):
    """Honest chained timing: k applications inside one jit, small readback."""
    def chain(k):
        @jax.jit
        def g(*a):
            v = a
            for _ in range(k):
                v = (build_fn(*v),) + tuple(v[1:])
            return v[0]
        return g

    f1, fk = chain(1), chain(iters)

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(f(*args).reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)
    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    return max((tk - t1) / (iters - 1), 1e-9)


def probe_sublane_gather(interpret):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=0)

    T = 64  # 64 blocks x 256K = 16M elems
    rng = np.random.default_rng(0)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    idx = np.stack([
        np.stack([rng.permutation(R).astype(np.int32) for _ in range(LANES)], axis=1)
        for _ in range(T)
    ])
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
    print(f"A sublane-gather correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v, i: f(v, i), (xj, ij))
        n = T * R * LANES
        print(f"A sublane-gather: {per*1e3:.3f} ms for {n} = {n/per/1e9:.2f} G elems/s", flush=True)


def probe_lane_gather(interpret):
    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=1)

    T = 64
    rng = np.random.default_rng(1)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    idx = np.stack([
        np.stack([rng.permutation(LANES).astype(np.int32) for _ in range(R)])
        for _ in range(T)
    ])
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    xj, ij = jnp.asarray(x), jnp.asarray(idx)
    out = np.asarray(jax.device_get(jax.jit(f)(xj, ij)))
    want = np.take_along_axis(x, idx, axis=2)
    ok = np.array_equal(out, want)
    print(f"B lane-gather correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v, i: f(v, i), (xj, ij))
        n = T * R * LANES
        print(f"B lane-gather: {per*1e3:.3f} ms for {n} = {n/per/1e9:.2f} G elems/s", flush=True)


def probe_int8_matmul(interpret):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    rng = np.random.default_rng(2)
    M, K, N = 512, 2048, 512
    a = rng.integers(-128, 128, (M, K), dtype=np.int8)
    b = rng.integers(-128, 128, (K, N), dtype=np.int8)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                  pl.BlockSpec((K, N), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        interpret=interpret,
    )
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    out = np.asarray(jax.device_get(jax.jit(f)(aj, bj)))
    want = a.astype(np.int32) @ b.astype(np.int32)
    ok = np.array_equal(out, want)
    print(f"D int8-matmul exact: {ok} (maxdiff {np.abs(out.astype(np.int64)-want).max()})", flush=True)
    if not interpret:
        per = _time_chain(lambda a_, b_: f(a_, jnp.asarray(b)), (aj, bj))
        macs = M * K * N
        print(f"D int8-matmul: {per*1e3:.3f} ms = {macs/per/1e12:.2f} T MACs/s", flush=True)


def probe_bf16_matmul(interpret):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rng = np.random.default_rng(3)
    M, K, N = 512, 2048, 512
    a = rng.integers(0, 2, (M, K)).astype(np.float32)
    b = rng.integers(0, 256, (K, N)).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                  pl.BlockSpec((K, N), lambda: (0, 0))],
        out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )
    aj = jnp.asarray(a, jnp.bfloat16)
    bj = jnp.asarray(b, jnp.bfloat16)
    out = np.asarray(jax.device_get(jax.jit(f)(aj, bj))).astype(np.int64)
    want = a.astype(np.int64) @ b.astype(np.int64)
    ok = np.array_equal(out, want)
    print(f"E bf16-matmul exact(0/1 x bytes): {ok}", flush=True)
    if not interpret:
        per = _time_chain(lambda a_, b_: f(a_, bj), (aj, bj))
        macs = M * K * N
        print(f"E bf16-matmul: {per*1e3:.3f} ms = {macs/per/1e12:.2f} T MACs/s", flush=True)


def main():
    interpret = "cpu" in sys.argv
    for name, fn in [
        ("A", probe_sublane_gather),
        ("B", probe_lane_gather),
        ("D", probe_int8_matmul),
        ("E", probe_bf16_matmul),
    ]:
        try:
            fn(interpret)
        except Exception:
            print(f"{name} FAILED:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
