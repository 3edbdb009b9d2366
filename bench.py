"""Headline benchmark: uint32 sort throughput on the flagship Pallas path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload matches the reference harness: N = 2^23 shuffled uint32 keys
(src/test/sort.hpp:184, sort.cpp:348-350).  Baseline = the reference's
published ~1e9 keys/s on an RTX 2070 (README.md:18; BASELINE.md).

Timing discipline (see tools/probe_primitives.py history): the axon relay
overlaps dispatch and `block_until_ready` under-reports, while a host
readback costs a constant ~28 ms.  So we time k chained sorts inside one
jit and a single tiny readback, and report (t_k - t_1) / (k - 1).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from radx_tpu.kernels import bitonic
    from radx_tpu.config import resolve_interpret, tuned

    n = 1 << 23
    iters = 8
    cfg = tuned()  # per-generation tuning table (config.TUNING)
    interpret = resolve_interpret(cfg)
    if interpret:
        # CPU interpreter mode cannot run 8M keys in reasonable time.
        n = 1 << 16
        iters = 2

    rng = np.random.default_rng(0)
    keys = rng.permutation(n).astype(np.uint32)  # the reference's fixture
    plane = jnp.asarray(
        (keys ^ np.uint32(0x80000000)).astype(np.int32).reshape(-1, 128)
    )

    def chain(k):
        def f(p):
            for _ in range(k):
                p = bitonic.sort_planes(
                    [p], cfg.chunk_rows, num_cmp=1, interpret=interpret
                )[0]
            return p

        return jax.jit(f)

    f1, fk = chain(1), chain(iters)
    out = None

    def run(f):
        nonlocal out
        t0 = time.perf_counter()
        out = jax.device_get(f(plane).reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)  # compile
    t1 = min(run(f1) for _ in range(3))
    if interpret:
        dt = t1  # CPU interpreter: readback is negligible vs compute
    else:
        tk = min(run(fk) for _ in range(3))
        dt = max((tk - t1) / (iters - 1), 1e-9)

    # correctness gate on the timed artifact
    full = np.asarray(
        jax.device_get(
            jax.jit(
                lambda p: bitonic.sort_planes(
                    [p], cfg.chunk_rows, num_cmp=1, interpret=interpret
                )[0]
            )(plane)
        )
    ).reshape(-1).astype(np.uint32) ^ np.uint32(0x80000000)
    assert np.array_equal(full, np.sort(keys)), "benchmark output not sorted!"

    value = n / dt
    print(
        json.dumps(
            {
                "metric": "sort_u32_keys_per_s_n2e23",
                "value": round(value),
                "unit": "keys/s",
                "vs_baseline": round(value / 1e9, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
