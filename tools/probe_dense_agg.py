"""HW validation + throughput of the dense MXU hash-aggregate.

Bit-checks dense_sums/groupby_dense against NumPy on chip, then measures
rows/s across bin counts (the cost scales with bins).  Also re-validates the
rewritten kernels/radix.py histogram layout on hardware.

  python tools/probe_dense_agg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def check_radix_hist():
    from radx_tpu.kernels import radix
    from radx_tpu.oracle import cpu

    rng = np.random.default_rng(7)
    n = 1 << 20
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    for shift in (0, 8, 16, 24):
        got = np.asarray(radix.tile_histograms(jnp.asarray(keys), shift))
        digits = cpu.extract_digit(keys, shift, 0xFF)
        want = cpu.tile_histograms(digits, n // got.shape[0], 256)
        assert np.array_equal(got, want), f"radix hist MISMATCH shift={shift}"
    print("radix.tile_histograms OK on HW (all 4 shifts)")


def check_dense(n, bins, iters=5):
    from radx_tpu.kernels import aggregate

    rng = np.random.default_rng(bins)
    keys = jnp.asarray(rng.integers(0, bins, n, dtype=np.uint32))
    vals = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    sums, counts = aggregate.dense_sums(keys, vals, bins=bins)
    jax.block_until_ready((sums, counts))
    hk = np.asarray(keys)
    hv = np.asarray(vals).astype(np.uint64)
    want_counts = np.bincount(hk, minlength=bins).astype(np.int32)
    want_sums = np.zeros(bins, np.uint64)
    np.add.at(want_sums, hk, hv)
    assert np.array_equal(np.asarray(counts), want_counts), "counts MISMATCH"
    assert np.array_equal(
        np.asarray(sums), (want_sums & 0xFFFFFFFF).astype(np.uint32)
    ), "sums MISMATCH"

    # Chained timing (utils/timing doctrine): per-dispatch relay latency
    # otherwise dominates at these ms-scale kernels.
    from radx_tpu.utils import time_op

    def op(v):
        sums, _ = aggregate.dense_sums(keys, v, bins=bins)
        return v ^ jax.lax.dynamic_slice(
            jnp.tile(sums, n // bins + 1), (0,), (n,)
        )

    m = time_op(op, vals, name=f"dense bins={bins}", items=n,
                bytes_moved=8 * n)
    print(
        f"dense_sums n=2^{n.bit_length()-1} bins={bins}: OK, "
        f"{m.items_per_s/1e9:.3f} G rows/s ({m.seconds*1e3:.2f} ms)"
    )


def check_groupby_dense(n=1 << 22, bins=1024):
    from radx_tpu.ops.groupby import groupby_dense

    rng = np.random.default_rng(3)
    keys = rng.integers(0, bins - 3, n, dtype=np.uint32)
    vals = rng.integers(0, 2**32, n, dtype=np.uint32)
    t0 = time.perf_counter()
    uk, out, ng = groupby_dense(keys, vals, "sum", bins=bins)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ng = int(ng)
    uniq = np.unique(keys)
    assert ng == uniq.size
    assert np.array_equal(np.asarray(uk)[:ng], uniq)
    want_sums = np.zeros(bins, np.uint64)
    np.add.at(want_sums, keys, vals.astype(np.uint64))
    want = (want_sums & 0xFFFFFFFF).astype(np.uint32)[uniq]
    assert np.array_equal(np.asarray(out)[:ng], want), "groupby_dense MISMATCH"
    print(f"groupby_dense n=2^{n.bit_length()-1} bins={bins}: OK "
          f"(first call incl. compile {dt:.1f}s)")


if __name__ == "__main__":
    print(jax.devices())
    check_radix_hist()
    check_groupby_dense()
    n = 1 << 24
    for bins in (128, 1024, 8192, 65536):
        check_dense(n, bins)
