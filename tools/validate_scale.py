"""On-chip validation of the BASELINE-scale configs (VERDICT r1 items 2/3/7).

Each config is bit-checked against NumPy on the host; every run prints a
one-line verdict.  Run one config at a time (each uses most of HBM):

  python tools/validate_scale.py filter_1b     # 2^30-row filter (config 3)
  python tools/validate_scale.py groupby_1b    # 2^30-row groupby (config 3)
  python tools/validate_scale.py join_100m     # 100M x 100M multi-match join
  python tools/validate_scale.py arbn_600m     # non-pow2 N=6e8 sort + overhead
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radx_tpu.utils import guard


def _guarded(fn, *args, timeout_s=3600.0):
    """Every long device step runs under the failure-detection watchdog
    (utils/guard.py): a wedged device/relay raises DeviceTimeout instead of
    blocking the validation run forever (SURVEY §5; the reference's
    INT64_MAX fence waits, radx_utils.hpp:201-244, are the anti-pattern)."""
    return guard.watchdog(fn, *args, timeout_s=timeout_s)


def filter_1b():
    from radx_tpu.ops.chunked import filter_chunked

    n = 1 << 30
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**32, n, dtype=np.uint32)
    mask = (vals & 1).astype(np.uint32)  # ~50% kept, value-derived
    t0 = time.perf_counter()
    (out,), count = _guarded(lambda: filter_chunked(mask, [vals]))
    dt = time.perf_counter() - t0
    want = vals[mask != 0]
    assert count == want.shape[0], (count, want.shape)
    assert np.array_equal(out, want), "filter_1b MISMATCH"
    print(f"filter_1b OK: n={n} kept={count} wall={dt:.1f}s "
          f"({n/dt/1e9:.3f} G rows/s incl. host staging)")


def groupby_1b():
    from radx_tpu.ops.chunked import groupby_chunked

    n = 1 << 30
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 20, n).astype(np.uint32)  # ~1M groups
    vals = rng.integers(0, 1 << 11, n).astype(np.uint32)
    t0 = time.perf_counter()
    uk, out, ng = _guarded(lambda: groupby_chunked(keys, vals, "sum"))
    dt = time.perf_counter() - t0
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
    assert np.array_equal(uk, ks[starts]), "groupby_1b keys MISMATCH"
    assert np.array_equal(out, np.add.reduceat(vs, starts).astype(np.uint32)), \
        "groupby_1b sums MISMATCH"
    print(f"groupby_1b OK: n={n} groups={ng} wall={dt:.1f}s "
          f"({n/dt/1e9:.3f} G rows/s incl. host staging)")


def join_100m():
    from radx_tpu.ops.join import join_merge_multi

    nb = npr = 100_000_000
    rng = np.random.default_rng(2)
    # duplicate-heavy build side: every key appears exactly twice
    build_keys = (np.arange(nb, dtype=np.uint32) // 2)
    build_vals = np.arange(nb, dtype=np.uint32)
    probe_keys = rng.integers(0, nb, npr).astype(np.uint32)  # half miss
    probe_vals = rng.integers(0, 2**32, npr, dtype=np.uint32)
    t0 = time.perf_counter()
    k, bv, pv, valid, trunc = _guarded(
        lambda: join_merge_multi(
            jnp.asarray(build_keys), jnp.asarray(build_vals),
            jnp.asarray(probe_keys), jnp.asarray(probe_vals), max_matches=2,
        )
    )
    k = np.asarray(jax.device_get(k))
    bv = np.asarray(jax.device_get(bv))
    pv = np.asarray(jax.device_get(pv))
    valid = np.asarray(jax.device_get(valid))
    trunc = bool(trunc)
    dt = time.perf_counter() - t0
    assert not trunc, "unexpected truncation (exactly 2 dups per key)"
    # every probe key < nb//2 matches exactly 2 build rows {2k, 2k+1}
    n_match_probes = int((probe_keys < nb // 2).sum())
    assert int(valid.sum()) == 2 * n_match_probes, \
        (int(valid.sum()), 2 * n_match_probes)
    # per-row exactness on the valid rows: build val of rank j for key k
    # is 2k + j
    for j in range(2):
        rows = valid[j]
        assert np.array_equal(
            bv[j][rows], 2 * k[rows] + j
        ), f"join_100m rank-{j} build vals MISMATCH"
    # probe multiset: valid rank-0 rows carry each matching probe's value
    sel = valid[0]
    got = np.sort(pv[sel])
    want = np.sort(probe_vals[probe_keys < nb // 2])
    assert np.array_equal(got, want), "join_100m probe vals MISMATCH"
    print(f"join_100m OK: {nb}x{npr} out_rows={int(valid.sum())} "
          f"wall={dt:.1f}s ({(nb + npr)/dt/1e9:.3f} G rows/s incl. staging)")


def arbn_600m():
    from radx_tpu.config import tuned
    from radx_tpu.ops import sort as S

    n = 600_000_000  # non-pow2: pads to 2^30 under pow2 (79% waste)
    cfg = tuned()
    assert S._use_decomposition(n, cfg), "should route to decomposition"
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    kd = jax.device_put(jnp.asarray(keys))

    def timed(fn, x):
        t0 = time.perf_counter()
        r = _guarded(fn, x, timeout_s=1800.0)
        jax.device_get(r[:8])
        return r, time.perf_counter() - t0

    out, _ = timed(lambda x: S.sort(x, cfg), kd)   # compile
    out, dt = timed(lambda x: S.sort(x, cfg), kd)
    got = np.asarray(jax.device_get(out))
    assert np.array_equal(got, np.sort(keys)), "arbn_600m MISMATCH"
    del got, out

    # overhead vs the pow2 rate at a comparable size (2^29)
    m = 1 << 29
    kp = jax.device_put(jnp.asarray(keys[:m]))
    _, _ = timed(lambda x: S.sort(x, cfg), kp)     # compile
    _, dtp = timed(lambda x: S.sort(x, cfg), kp)
    rate_arbn = n / dt
    rate_pow2 = m / dtp
    ovh = rate_pow2 / rate_arbn - 1
    print(f"arbn_600m OK: n={n} wall={dt:.2f}s rate={rate_arbn/1e9:.3f} G/s; "
          f"pow2 2^29 rate={rate_pow2/1e9:.3f} G/s; overhead={ovh*100:.1f}% "
          f"(target <10%)")


def sort_1g():
    """2^30-key single-chip sort via the out-of-core slab merge tree
    (ops/chunked.sort_chunked) — the top of the 1M-1B parity range.
    Input is a shuffled permutation so the O(N) native validator applies
    (the reference's own fixture trick, src/test/sort.cpp:348-350)."""
    from radx_tpu import runtime
    from radx_tpu.ops.chunked import sort_chunked

    n = 1 << 30
    keys = runtime.gen_permutation(n, seed=9)
    t0 = time.perf_counter()
    out = _guarded(lambda: sort_chunked(keys, slab=1 << 28), timeout_s=7200.0)
    dt = time.perf_counter() - t0
    assert runtime.validate_sort(keys, out) == 0, "sort_1g MISMATCH"
    print(f"sort_1g OK: n={n} wall={dt:.1f}s "
          f"({n/dt/1e9:.3f} G keys/s incl. host staging over the relay)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "filter_1b"
    globals()[which]()
