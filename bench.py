"""Headline benchmark: uint32 sort throughput on the flagship Pallas path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "spread_pct"}.

Workload matches the reference harness: N = 2^23 shuffled uint32 keys
(src/test/sort.hpp:184, sort.cpp:348-350).  Baseline = the reference's
published ~1e9 keys/s on an RTX 2070 (README.md:18; BASELINE.md).

Timing discipline (see tools/probe_primitives.py history): the axon relay
overlaps dispatch and `block_until_ready` under-reports, while a host
readback costs a constant ~28 ms.  So we time k chained sorts inside one
jit and a single tiny readback, and report (t_k - t_1) / (k - 1).

Contention hardening (round-5): the r4 driver artifact read 20% below the
idle-chip rate because a single measurement overlapped other host load.
Now: REPEATS independent chained measurements, value = the min (the
uncontended rate), and `spread_pct` = (max-min)/min of the per-repeat
estimates so a noisy capture is visible in the artifact itself.

Side artifact: unless RADX_BENCH_EXTRA=0, also re-measures the relational
configs (groupby / filter / stable+unique pairs) through bench_suite and
writes machine-readable rows to BENCH_EXTRA.json — the prose numbers in
NOTES.md are regression-checkable from that file.  Failures there never
break the primary line.
"""

import json
import os
import sys
import time

import numpy as np

REPEATS = 9  # min-of-9: more chances to catch an uncontended window
ITERS = 8


def _measure_primary():
    import jax
    import jax.numpy as jnp

    from radx_tpu.kernels import bitonic
    from radx_tpu.config import resolve_interpret, tuned

    n = 1 << 23
    iters = ITERS
    repeats = REPEATS
    cfg = tuned()  # per-generation tuning table (config.TUNING)
    interpret = resolve_interpret(cfg)
    if interpret:
        # CPU interpreter mode cannot run 8M keys in reasonable time.
        n = 1 << 16
        iters, repeats = 2, 2

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

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(f(plane).reshape(-1)[:8])
        return time.perf_counter() - t0

    run(f1), run(fk)  # compile
    t1s = [run(f1) for _ in range(repeats)]
    t1 = min(t1s)
    if interpret:
        dts = [t1]  # CPU interpreter: readback is negligible vs compute
    else:
        # per-repeat throughput estimates against the best (least-contended)
        # single-sort time; min = the reportable rate, spread = noise bound
        dts = [
            max((run(fk) - t1) / (iters - 1), 1e-9) for _ in range(repeats)
        ]
    dt = min(dts)
    spread_pct = 100.0 * (max(dts) - min(dts)) / max(min(dts), 1e-12)

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

    return n / dt, spread_pct


EXTRA_CONFIGS = (
    "pairs_4m",
    "pairs_unique_4m",
    "groupby_4m",
    "filter_64m",
    "topk_64m",
)


def _measure_extras():
    """Re-measure the relational configs; rows land in BENCH_EXTRA.json."""
    from radx_tpu import bench_suite

    rows = []
    for name in EXTRA_CONFIGS:
        try:
            m = bench_suite.CONFIGS[name]()
            rows.append(
                {
                    "config": name,
                    "seconds": m.seconds,
                    "items_per_s": m.items_per_s,
                }
            )
        except Exception as e:  # noqa: BLE001 - never break the primary line
            rows.append({"config": name, "error": f"{type(e).__name__}: {e}"})
    return rows


def main():
    value, spread_pct = _measure_primary()

    if os.environ.get("RADX_BENCH_EXTRA", "1") != "0":
        try:
            extra = {"primary_spread_pct": round(spread_pct, 2),
                     "suite": _measure_extras()}
            with open(
                os.path.join(os.path.dirname(__file__) or ".",
                             "BENCH_EXTRA.json"),
                "w",
            ) as f:
                json.dump(extra, f, indent=1)
        except Exception:  # noqa: BLE001
            pass

    print(
        json.dumps(
            {
                "metric": "sort_u32_keys_per_s_n2e23",
                "value": round(value),
                "unit": "keys/s",
                "vs_baseline": round(value / 1e9, 4),
                "spread_pct": round(spread_pct, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
