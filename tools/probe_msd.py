"""Probe: primitives for the MSD split engine (round-2 radix path).

The MSD engine's pack kernel needs, inside one Pallas kernel:
  P1  copy the input block + a 32-row tail block into a VMEM scratch
      (stitched chunk, so dynamic windows never clamp);
  P2  fori_loop over nb buckets: read a (slot_rows+1, 128) window at a
      *dynamic* row offset from scratch, lane-align it by the offset's
      lane remainder with two lane-gathers + select, sentinel-mask
      positions >= count, store at a dynamic row offset of the output
      block;
  P3  output BlockSpec index map placing chunk c's slab at column c of a
      (nb, nchunks, slot_rows, 128) array — the transpose absorbed into
      the pipeline's block writes.
Also probes the XLA-level pieces: vmapped searchsorted for splitter
ranks over (nchunks, C) sorted rows, and the ascending-overwrite
fori_loop of dynamic_update_slice for the final exact concatenation.

Usage: python tools/probe_msd.py [cpu]
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
PAD = 0x7FFFFFFF  # i32 sentinel (python int: jnp scalars become captured consts)


def _pack_kernel(c_rows, slot_rows, nb, bounds_ref, x_ref, tail_ref,
                 out_ref, scratch_ref):
    c = pl.program_id(0)
    scratch_ref[: c_rows] = x_ref[0]
    scratch_ref[c_rows:] = tail_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (slot_rows, LANES), 1)
    flat = jax.lax.broadcasted_iota(
        jnp.int32, (slot_rows, LANES), 0) * LANES + lane

    def body(b, _):
        o = bounds_ref[c, b]
        count = bounds_ref[c, b + 1] - o
        r0 = o >> 7
        d = o & 127
        win = scratch_ref[pl.ds(r0, slot_rows + 1)]
        idx = (lane + d) & 127
        ga = jnp.take_along_axis(win[:slot_rows], idx, axis=1)
        gb = jnp.take_along_axis(win[1:], idx, axis=1)
        w = jnp.where((lane + d) < 128, ga, gb)
        w = jnp.where(flat < count, w, jnp.int32(PAD))
        out_ref[b, 0] = w
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def pack(x, bounds, nb, slot_rows, interpret):
    """x: (nchunks, c_rows, 128) sorted chunks; bounds: (nchunks, nb+1).

    Returns (nb, nchunks, slot_rows, 128): bucket-major padded runs."""
    nchunks, c_rows, _ = x.shape
    # tail block for chunk c = first 32 rows after chunk c (or sentinel pad)
    tail = jnp.concatenate(
        [x[1:, :32], jnp.full((1, 32, LANES), PAD, jnp.int32)]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, c_rows, LANES), lambda c, s: (c, 0, 0)),
            pl.BlockSpec((1, 32, LANES), lambda c, s: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (nb, 1, slot_rows, LANES), lambda c, s: (0, c, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((c_rows + 32, LANES), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(_pack_kernel, c_rows, slot_rows, nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (nb, nchunks, slot_rows, LANES), jnp.int32),
        interpret=interpret,
    )(bounds, x, tail)


def main():
    interpret = "cpu" in sys.argv
    rng = np.random.default_rng(0)
    nchunks, c_rows = (4, 256) if interpret else (32, 2048)
    C = c_rows * LANES
    nb = 32 if interpret else 288
    slot = 2048
    slot_rows = slot // LANES

    # sorted chunks + random non-decreasing bounds with runs <= slot
    x = np.sort(
        rng.integers(-2**31, 2**31 - 1, (nchunks, C), dtype=np.int64)
        .astype(np.int32), axis=1)
    # bounds from regular splitters on the global sort (roughly balanced)
    allv = np.sort(x.reshape(-1))
    splitters = allv[(np.arange(1, nb) * allv.size) // nb]
    bounds = np.zeros((nchunks, nb + 1), np.int32)
    for c in range(nchunks):
        bounds[c, 1:-1] = np.searchsorted(x[c], splitters, side="left")
        bounds[c, -1] = C
    counts = np.diff(bounds, axis=1)
    print("max run:", counts.max(), "slot:", slot)
    assert counts.max() <= slot

    xj = jnp.asarray(x.reshape(nchunks, c_rows, LANES))
    bj = jnp.asarray(bounds)
    f = jax.jit(functools.partial(
        pack, nb=nb, slot_rows=slot_rows, interpret=interpret))
    try:
        out = np.asarray(jax.device_get(f(xj, bj)))
    except Exception as e:
        print("PACK FAILED:", repr(e)[:2000])
        return

    want = np.full((nb, nchunks, slot), PAD, np.int32)
    for c in range(nchunks):
        for b in range(nb):
            o, e = bounds[c, b], bounds[c, b + 1]
            want[b, c, : e - o] = x[c, o:e]
    ok = np.array_equal(out.reshape(nb, nchunks, slot), want)
    print("pack correct:", ok)

    if not interpret:
        def run(fn, *a):
            t0 = time.perf_counter()
            jax.device_get(fn(*a).reshape(-1)[:8])
            return time.perf_counter() - t0

        run(f, xj, bj)
        t1 = min(run(f, xj, bj) for _ in range(5))
        n = nchunks * C
        print(f"pack: {t1*1e3:.3f} ms wall for {n} elems = "
              f"{n/t1/1e9:.2f} G elems/s (incl dispatch+readback)")

    # --- XLA-level pieces -------------------------------------------------
    sj = jnp.asarray(splitters)

    @jax.jit
    def ranks(xs, sp):
        return jax.vmap(lambda row: jnp.searchsorted(row, sp))(xs)

    r = np.asarray(jax.device_get(ranks(jnp.asarray(x), sj)))
    print("searchsorted correct:",
          np.array_equal(r, bounds[:, 1:-1]))
    if not interpret:
        t = min(run(ranks, jnp.asarray(x), sj) for _ in range(3))
        print(f"searchsorted: {t*1e3:.3f} ms for {nchunks}x{nb-1}")

    # ascending-overwrite concat: buckets (nb, P) padded, counts known
    P = nchunks * slot
    buckets = np.full((nb, P), PAD, np.int32)
    cnt = counts.sum(axis=0)
    for b in range(nb):
        vals = np.sort(np.concatenate(
            [x[c, bounds[c, b]: bounds[c, b + 1]] for c in range(nchunks)]))
        buckets[b, : vals.size] = vals
    cum = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int32)

    @jax.jit
    def concat(bk, cum):
        out = jnp.full((nchunks * C + P,), PAD, jnp.int32)

        def body(b, out):
            return jax.lax.dynamic_update_slice(out, bk[b], (cum[b],))

        return jax.lax.fori_loop(0, nb, body, out)[: nchunks * C]

    got = np.asarray(jax.device_get(concat(jnp.asarray(buckets),
                                           jnp.asarray(cum))))
    print("concat correct:", np.array_equal(got, allv))
    if not interpret:
        t = min(run(concat, jnp.asarray(buckets), jnp.asarray(cum))
                for _ in range(3))
        n = nchunks * C
        print(f"concat: {t*1e3:.3f} ms for {n} elems = "
              f"{n/t/1e9:.2f} G elems/s")


if __name__ == "__main__":
    main()
