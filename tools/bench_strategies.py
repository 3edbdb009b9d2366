"""Hardware A/B: strategy="radix" (MSD split engine) vs "bitonic" vs "lax".

Chained-iteration timing (see radx_tpu/utils/timing.py discipline): k sorts
composed inside one jit, a single tiny readback, report (t_k - t_1)/(k - 1).

Usage: python tools/bench_strategies.py [log2n ...]   (default 23 24 25 26)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from radx_tpu.config import SortConfig
from radx_tpu.ops import sort as S


def bench(n, strategy, k=5):
    cfg = SortConfig(strategy=strategy)
    rng = np.random.default_rng(0)
    keys = jax.device_put(
        rng.integers(0, 2**32, n, dtype=np.uint32))

    def chain(j):
        @jax.jit
        def f(ks):
            for _ in range(j):
                ks = S._sort_keys_jit(ks, cfg, n)
            return ks
        return f

    f1, fk = chain(1), chain(k)
    out = jax.device_get(f1(keys))
    ref = np.sort(np.asarray(jax.device_get(keys)))
    ok = np.array_equal(out, ref)

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(f(keys)[:8])
        return time.perf_counter() - t0

    run(f1); run(fk)
    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    dt = (tk - t1) / (k - 1)
    return dt, n / dt / 1e9, ok


def main():
    lgs = [int(a) for a in sys.argv[1:]] or [23, 24, 25, 26]
    for lg in lgs:
        n = 1 << lg
        for strat in ("radix", "bitonic"):
            try:
                dt, gps, ok = bench(n, strat)
                print(f"2^{lg} {strat:8s}: {dt*1e3:8.2f} ms  "
                      f"{gps:6.3f} G keys/s  correct={ok}", flush=True)
            except Exception as e:
                print(f"2^{lg} {strat:8s}: FAILED {repr(e)[:300]}",
                      flush=True)


if __name__ == "__main__":
    main()
