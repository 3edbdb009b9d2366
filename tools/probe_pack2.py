"""Probe: where the pack kernel's ~3us/iteration goes, and variants.

Variants over the same logical pack (chunk -> bucket-major padded slots):
  base    fori loop, dynamic window read, 2 lane-gathers, dynamic store
  unroll  python-unrolled bucket loop (static store index)
  nogather drop the lane-gather alignment (round offsets to rows)
  static  static window offsets (b * mean) — isolates dynamic-slice cost
  fewer   16 supergroups with 16x bigger slots (same bytes moved)
  nodyn   unroll + static aligned reads + static stores (pure copy floor)

Timing: k-chained pack calls inside one jit (output fed nowhere; calls
sequenced via a data dependency on a 1-element carry), minus 1-call time.

Usage: python tools/probe_pack2.py
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
PAD = 0x7FFFFFFF


def make_pack(c_rows, slot_rows, nb, mode):
    def kernel(bounds_ref, x_ref, out_ref, scratch_ref):
        c = pl.program_id(0)
        scratch_ref[:c_rows] = x_ref[0]
        scratch_ref[c_rows:] = jnp.full((32, LANES), PAD, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (slot_rows, LANES), 1)
        flat = jax.lax.broadcasted_iota(
            jnp.int32, (slot_rows, LANES), 0) * LANES + lane

        def body_for(b, o, count, out_b):
            if mode in ("static",):
                o = b * (c_rows // nb * 128)
                count = o * 0 + slot_rows * LANES
            if mode in ("nodyn",):
                r0 = (b * (c_rows // nb)) if isinstance(b, int) else 0
                win = scratch_ref[r0:r0 + slot_rows + 1]
            else:
                r0 = o >> 7
                win = scratch_ref[pl.ds(r0, slot_rows + 1)]
            if mode in ("nogather", "nodyn"):
                w = win[:slot_rows]
            else:
                d = o & 127
                idx = (lane + d) & 127
                ga = jnp.take_along_axis(win[:slot_rows], idx, axis=1)
                gb = jnp.take_along_axis(win[1:], idx, axis=1)
                w = jnp.where((lane + d) < 128, ga, gb)
            w = jnp.where(flat < count, w, jnp.int32(PAD))
            out_ref[out_b, 0] = w
            return 0

        if mode in ("unroll", "nodyn"):
            for b in range(nb):
                body_for(b, bounds_ref[c, b],
                         bounds_ref[c, b + 1] - bounds_ref[c, b], b)
        else:
            jax.lax.fori_loop(
                0, nb,
                lambda b, _: body_for(
                    b, bounds_ref[c, b],
                    bounds_ref[c, b + 1] - bounds_ref[c, b], b),
                0)

    def pack(x, bounds):
        nchunks = x.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nchunks,),
            in_specs=[pl.BlockSpec((1, c_rows, LANES), lambda c, s: (c, 0, 0))],
            out_specs=pl.BlockSpec(
                (nb, 1, slot_rows, LANES), lambda c, s: (0, c, 0, 0)),
            scratch_shapes=[pltpu.VMEM((c_rows + 32, LANES), jnp.int32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nb, nchunks, slot_rows, LANES), jnp.int32),
        )(bounds, x)

    return pack


def main():
    rng = np.random.default_rng(0)
    nchunks, c_rows = 32, 2048
    C = c_rows * LANES
    x = np.sort(rng.integers(-2**31, 2**31 - 1, (nchunks, C),
                             dtype=np.int64).astype(np.int32), axis=1)
    xj = jnp.asarray(x.reshape(nchunks, c_rows, LANES))
    n = nchunks * C

    def bounds_for(nb):
        allv = np.sort(x.reshape(-1))
        sp = allv[(np.arange(1, nb) * allv.size) // nb]
        b = np.zeros((nchunks, nb + 1), np.int32)
        for c in range(nchunks):
            b[c, 1:-1] = np.searchsorted(x[c], sp)
            b[c, -1] = C
        return jnp.asarray(b), np.diff(b, axis=1).max()

    def time_pack(pack, bj, iters=8):
        # xor a data-dependent scalar into the input each iteration so XLA
        # cannot CSE the chained calls; the xor pass itself is ~0.15 ms and
        # identical across variants (also timed below as 'xoronly').
        def chain(k):
            @jax.jit
            def g(x, b):
                for _ in range(k):
                    if pack is not None:
                        out = pack(x, b)
                        x = x ^ (out[0, 0, 0, 0] & 1)
                    else:
                        x = x ^ (x[0, 0, 0] & 1)
                return x
            return g
        f1, fk = chain(1), chain(iters)
        def run(f):
            t0 = time.perf_counter()
            jax.device_get(f(xj, bj).reshape(-1)[:8])
            return time.perf_counter() - t0
        run(f1), run(fk)
        t1 = min(run(f1) for _ in range(3))
        tk = min(run(fk) for _ in range(3))
        return max((tk - t1) / (iters - 1), 1e-9)

    dt0 = time_pack(None, jnp.zeros((2, 2), jnp.int32))
    print(f"xoronly: {dt0*1e3:7.2f} ms per chain step", flush=True)

    cfgs = [
        ("base", 288, 2048 // LANES, "fori"),
        ("unroll", 288, 2048 // LANES, "unroll"),
        ("nogather", 288, 2048 // LANES, "nogather"),
        ("static", 288, 2048 // LANES, "static"),
        ("nodyn", 288, 2048 // LANES, "nodyn"),
        ("slot1024", 288, 1024 // LANES, "fori"),
        ("fewer16", 16, 32768 // LANES, "fori"),
        ("fewer16u", 16, 32768 // LANES, "unroll"),
    ]
    for name, nb, slot_rows, mode in cfgs:
        slot = slot_rows * LANES
        bj, mx = bounds_for(nb)
        if mx > slot and mode not in ("static", "nodyn"):
            print(f"{name}: SKIP (max run {mx} > slot {slot})")
            continue
        try:
            pack = make_pack(c_rows, slot_rows, nb, mode)
            dt = time_pack(pack, bj)
            per_iter = dt / (nchunks * nb) * 1e6
            print(f"{name:9s} nb={nb:4d} slot={slot:6d}: {dt*1e3:7.2f} ms "
                  f"({n/dt/1e9:5.2f} G elems/s, {per_iter:6.2f} us/iter)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {repr(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
