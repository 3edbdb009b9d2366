"""Probe 2: lane-gather speed (proper chain), XOR-partner substage via
lane-gather vs roll-based substage, and (128,128) in-kernel transpose.

Usage: python tools/probe_gather2.py [cpu]
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

R = 2048
LANES = 128


def _time_chain(f, args, iters=32):
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


def probe_lane_gather_speed(interpret):
    T = 64

    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=1)

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
    per = _time_chain(lambda v, i: f(v, i), (xj, ij), iters=32)
    n = T * R * LANES
    print(f"B2 lane-gather: {per*1e3:.3f} ms / {n} = {n/per/1e9:.2f} G elems/s", flush=True)


def _substage_roll(planes, d, up_i, flat):
    def roll(x, sh):
        return pltpu.roll(x, sh % x.shape[1], 1)
    ys = [roll(x, -d) for x in planes]
    x0, y0 = planes[0], ys[0]
    y_lt_i = (y0 < x0).astype(jnp.int32)
    low_takes_y = (y_lt_i ^ (1 - up_i)) != 0
    high_takes_y = (y_lt_i ^ up_i) != 0
    is_high = (flat & d) != 0
    out = []
    for x, y in zip(planes, ys):
        chosen_low = jnp.where(low_takes_y, y, x)
        chosen_high = jnp.where(high_takes_y, y, x)
        out.append(jnp.where(is_high, roll(chosen_high, d), chosen_low))
    return out


def _substage_gather(planes, d, up_i, flat):
    lane = jax.lax.broadcasted_iota(jnp.int32, planes[0].shape, 1)
    partner = lane ^ d
    ys = [jnp.take_along_axis(x, partner, axis=1) for x in planes]
    x0, y0 = planes[0], ys[0]
    is_high = (flat & d) != 0
    # keep = min at low slot (asc) / max at low slot (desc); partner-select:
    y_small_i = (y0 < x0).astype(jnp.int32)
    take_y = ((y_small_i ^ is_high.astype(jnp.int32) ^ (1 - up_i)) != 0)
    return [jnp.where(take_y, y, x) for x, y in zip(planes, ys)]


def probe_substage(interpret, variant):
    sub = _substage_roll if variant == "roll" else _substage_gather

    def kernel(x_ref, o_ref):
        rows = x_ref.shape[1]
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        )
        planes = [x_ref[0]]
        # 20 lane-distance substages (mimic the in-row part of the network)
        for kk in range(1, 8):
            up_i = 1 - ((flat >> kk) & 1)
            for dj in range(min(kk, 7) - 1, -1, -1):
                planes = sub(planes, 1 << dj, up_i, flat)
        o_ref[0] = planes[0]

    T = 32
    rng = np.random.default_rng(2)
    x = rng.integers(-(2**31), 2**31, (T, R, LANES), dtype=np.int64).astype(np.int32)
    spec = pl.BlockSpec((1, R, LANES), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, R, LANES), jnp.int32),
        interpret=interpret,
    )
    xj = jnp.asarray(x)
    # correctness: each 128-lane row should be fully sorted ascending
    # (28 substages of a 128-bitonic with all direction bits from flat)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    # direction bit of the final level (kk=7) is the row parity: even rows
    # ascend, odd rows descend
    want = np.sort(x, axis=2)
    want[:, 1::2, :] = want[:, 1::2, ::-1]
    ok = np.array_equal(out, want)
    print(f"S substage[{variant}] row-sorted: {ok}", flush=True)
    if not interpret:
        per = _time_chain(lambda v: f(v), (xj,), iters=16)
        n = T * R * LANES
        print(
            f"S substage[{variant}]: {per*1e3:.3f} ms for 28 substages over {n}"
            f" = {n*28/per/1e9:.1f} G substage-elems/s",
            flush=True,
        )


def probe_transpose(interpret):
    def kernel(x_ref, o_ref):
        o_ref[0] = x_ref[0].T

    T = 64
    rng = np.random.default_rng(3)
    x = rng.integers(-(2**31), 2**31, (T, 128, 128), dtype=np.int64).astype(np.int32)
    spec = pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        kernel, grid=(T,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, 128, 128), jnp.int32),
        interpret=interpret,
    )
    xj = jnp.asarray(x)
    out = np.asarray(jax.device_get(jax.jit(f)(xj)))
    ok = np.array_equal(out, np.transpose(x, (0, 2, 1)))
    print(f"T transpose correct: {ok}", flush=True)
    if not interpret and ok:
        per = _time_chain(lambda v: f(v), (xj,), iters=32)
        n = T * 128 * 128
        print(f"T transpose: {per*1e3:.3f} ms / {n} = {n/per/1e9:.2f} G elems/s", flush=True)


def main():
    interpret = "cpu" in sys.argv
    for name, fn in [
        ("B2", probe_lane_gather_speed),
        ("S-roll", functools.partial(probe_substage, variant="roll")),
        ("S-gather", functools.partial(probe_substage, variant="gather")),
        ("T", probe_transpose),
    ]:
        try:
            fn(interpret)
        except Exception:
            print(f"{name} FAILED:", flush=True)
            traceback.print_exc()
            sys.stdout.flush()
    print("probe2 done", flush=True)


if __name__ == "__main__":
    main()
