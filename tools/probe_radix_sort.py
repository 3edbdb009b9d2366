"""HW validation + timing of the radix distribution sort vs bitonic.

Usage: python tools/probe_radix_sort.py [log2_sizes...] [--pairs] [--dist D]
Defaults: 22 23 24 26.  Every timed configuration is correctness-gated
(bit-exact vs np.sort) first; overflow runs are reported, not timed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radx_tpu.kernels import bitonic, radix_sort
from radx_tpu.utils.timing import time_op

SIGN = np.uint32(0x80000000)


def make_planes(n, num_cmp, dist, rng):
    if dist == "uniform":
        k = rng.integers(0, 2**32, n, dtype=np.uint32)
    elif dist == "presorted":
        k = np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
    elif dist == "clustered":
        k = rng.integers(0, 64, n, dtype=np.uint32) * np.uint32(
            0x04000000
        ) + rng.integers(0, 65536, n, dtype=np.uint32)
    elif dist == "lowcard":
        k = rng.integers(0, 1009, n, dtype=np.uint32)
    else:
        raise SystemExit(f"unknown dist {dist}")
    plane = (k ^ SIGN).view(np.int32).reshape(-1, 128)
    planes = [jnp.asarray(plane)]
    if num_cmp == 2:
        planes.append(jnp.asarray(np.arange(n, dtype=np.int32).reshape(-1, 128)))
    return k, planes


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pairs = "--pairs" in sys.argv
    dist = "uniform"
    for a in sys.argv[1:]:
        if a.startswith("--dist="):
            dist = a.split("=", 1)[1]
    logs = [int(a) for a in args] or [22, 23, 24, 26]
    num_cmp = 2 if pairs else 1
    rng = np.random.default_rng(0xC0FFEE)
    base = 256 if pairs else 1024

    for lg in logs:
        n = 1 << lg
        k, planes = make_planes(n, num_cmp, dist, rng)
        r_rows = radix_sort.pick_chunk_rows(n, base)
        p = radix_sort.plan(n, r_rows)
        if p is None:
            print(f"2^{lg}: no radix plan at chunk {r_rows}")
            continue
        print(
            f"2^{lg} {dist} cmp={num_cmp}: chunk={r_rows} n_chunks={p.n_chunks} "
            f"slot_rows={p.slot_rows} nb={p.nb}",
            flush=True,
        )
        f = jax.jit(
            lambda ps: radix_sort.sort_radix(ps, r_rows, num_cmp)
        )
        outs, ovf = f(planes)
        got = np.asarray(outs[0]).reshape(-1).view(np.uint32) ^ SIGN
        ovf = bool(ovf)
        exact = np.array_equal(got, np.sort(k))
        print(f"  radix exact={exact} overflow={ovf}", flush=True)
        if ovf:
            continue
        assert exact
        m = time_op(
            lambda ps: radix_sort.sort_radix(ps, r_rows, num_cmp)[0],
            planes, name=f"radix 2^{lg}", items=n, bytes_moved=0, iters=9,
        )
        print(" ", m.row(), flush=True)
        mb = time_op(
            lambda ps: bitonic.sort_planes(ps, base, num_cmp),
            planes, name=f"bitonic 2^{lg}", items=n, iters=9,
        )
        print(" ", mb.row(), flush=True)


if __name__ == "__main__":
    main()
