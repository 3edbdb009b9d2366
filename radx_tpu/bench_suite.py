"""Benchmark suite CLI — the analogue of the reference's test/benchmark app
(rad::TestSort, src/test/sort.cpp:246-483), with structured metrics instead
of raw prints and a correctness gate on every timed artifact (the reference
times but never checks, SURVEY §4).

Usage:
  python -m radx_tpu.bench_suite [--configs sort_small,sort_large,...]
Prints one metrics row per config and a JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _sort_bench(n, name):
    import jax.numpy as jnp

    from radx_tpu import runtime
    from radx_tpu.config import SortConfig, resolve_interpret
    from radx_tpu.kernels import bitonic
    from radx_tpu.utils import time_op

    cfg = SortConfig()
    interpret = resolve_interpret(cfg)
    if interpret:
        n = min(n, 1 << 16)
    keys = runtime.gen_permutation(n, seed=1)
    plane = jnp.asarray(
        (keys ^ np.uint32(0x80000000)).astype(np.int32).reshape(-1, 128)
    )

    def op(p):
        return bitonic.sort_planes(
            [p], cfg.chunk_rows, num_cmp=1, interpret=interpret
        )[0]

    m = time_op(op, plane, name=name, items=n, bytes_moved=8 * n)
    # correctness gate via the native validator
    import jax

    out = np.asarray(jax.device_get(jax.jit(op)(plane))).reshape(-1)
    out = out.astype(np.uint32) ^ np.uint32(0x80000000)
    assert runtime.validate_sort(keys, out) == 0, "sort output invalid!"
    return m


def _pairs_bench(n, name):
    import jax.numpy as jnp

    from radx_tpu import runtime
    from radx_tpu.config import SortConfig, resolve_interpret
    from radx_tpu.kernels import bitonic
    from radx_tpu.utils import time_op

    from radx_tpu.config import tuned

    cfg = tuned()  # stable_chunk_rows: the measured 3-plane optimum
    interpret = resolve_interpret(cfg)
    if interpret:
        n = min(n, 1 << 15)
    keys = runtime.gen_uniform(n, seed=2)
    kp = jnp.asarray((keys ^ np.uint32(0x80000000)).astype(np.int32).reshape(-1, 128))
    ip = jnp.asarray(np.arange(n, dtype=np.int32).reshape(-1, 128))
    vp = jnp.asarray(np.arange(n, dtype=np.int32).reshape(-1, 128))

    def op(planes):
        return tuple(
            bitonic.sort_planes(
                list(planes), cfg.stable_chunk_rows, num_cmp=2,
                interpret=interpret,
            )
        )

    m = time_op(op, (kp, ip, vp), name=name, items=n, bytes_moved=24 * n)
    # correctness gate on the timed artifact: keys sorted, permutation valid
    # and stable (ties keep original order <=> (key, idx) is nondecreasing)
    import jax

    k_out, i_out, _ = jax.device_get(jax.jit(op)((kp, ip, vp)))
    k_out = k_out.reshape(-1).astype(np.uint32) ^ np.uint32(0x80000000)
    i_out = i_out.reshape(-1)
    assert np.array_equal(k_out, np.sort(keys)), "pairs keys not sorted!"
    assert np.array_equal(keys[i_out], k_out), "pairs payload not a valid permutation!"
    assert np.all((k_out[:-1] < k_out[1:]) | (i_out[:-1] < i_out[1:])), "pairs sort not stable!"
    return m


def _sort_radix_bench(n, name):
    """strategy="radix" — the radix distribution sort (kernels/radix_sort)."""
    import jax
    import jax.numpy as jnp

    from radx_tpu import runtime
    from radx_tpu.config import SortConfig, resolve_interpret
    from radx_tpu.kernels import radix_sort
    from radx_tpu.utils import time_op

    cfg = SortConfig()
    interpret = resolve_interpret(cfg)
    if interpret:
        n = min(n, 1 << 16)
    keys = runtime.gen_permutation(n, seed=1)
    plane = jnp.asarray(
        (keys ^ np.uint32(0x80000000)).astype(np.int32).reshape(-1, 128)
    )
    r_rows = radix_sort.pick_chunk_rows(n, cfg.chunk_rows)
    if interpret:
        r_rows = 64
    if radix_sort.plan(n, r_rows) is None:
        raise SystemExit(f"{name}: no radix plan for n={n}")

    def op(p):
        return radix_sort.sort_radix([p], r_rows, 1, interpret=interpret)[0][0]

    m = time_op(op, plane, name=name, items=n, bytes_moved=8 * n)
    outs, ovf = jax.jit(
        lambda p: radix_sort.sort_radix([p], r_rows, 1, interpret=interpret)
    )(plane)
    assert not bool(ovf), "radix overflow on the bench workload!"
    out = np.asarray(jax.device_get(outs[0])).reshape(-1)
    out = out.astype(np.uint32) ^ np.uint32(0x80000000)
    from radx_tpu import runtime as rt

    assert rt.validate_sort(keys, out) == 0, "radix sort output invalid!"
    return m


def _pairs_unique_bench(n, name):
    """sort_pairs(assume_unique=True) on the reference's own workload shape
    (a shuffled permutation, src/test/sort.cpp:348-350): unique keys drop
    the tiebreak plane."""
    import jax
    import jax.numpy as jnp

    from radx_tpu import runtime
    from radx_tpu.config import resolve_interpret, tuned
    from radx_tpu.ops import sort as sort_ops
    from radx_tpu.utils import time_op

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
    keys = runtime.gen_permutation(n, seed=12)
    vals = np.arange(n, dtype=np.int32)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)

    def op(kv):
        return sort_ops.sort_pairs(kv[0], kv[1], cfg, assume_unique=True)

    m = time_op(op, (kj, vj), name=name, items=n, bytes_moved=16 * n)
    k_out, v_out = jax.jit(op)((kj, vj))
    k_out = np.asarray(jax.device_get(k_out))
    v_out = np.asarray(jax.device_get(v_out))
    assert np.array_equal(k_out, np.arange(n, dtype=np.uint32)), \
        "unique-pairs keys not sorted!"
    assert np.array_equal(v_out, np.argsort(keys)), \
        "unique-pairs payload wrong!"
    return m


def _groupby_bench(n, name):
    from radx_tpu import runtime
    from radx_tpu.config import SortConfig, resolve_interpret
    from radx_tpu.ops.groupby import groupby
    import jax
    import jax.numpy as jnp

    from radx_tpu.config import tuned

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
    keys = (runtime.gen_uniform(n, seed=3) % 10007).astype(np.uint32)
    vals = runtime.gen_uniform(n, seed=4)
    from radx_tpu.utils import time_op

    kj, vj = jnp.asarray(keys), jnp.asarray(vals)

    # groupby preserves (keys, values) shapes (outputs are padded to n), so
    # the chained-timing discipline applies: feed (uk, agg) back in.
    def op(kv):
        uk, agg, _ = groupby(kv[0], kv[1], "sum", cfg)
        return (uk, agg)

    m = time_op(op, (kj, vj), name=name, items=n, bytes_moved=16 * n, iters=4)
    # correctness gate on the timed artifact
    uk, agg, ng = jax.jit(lambda k, v: groupby(k, v, "sum", cfg))(kj, vj)
    ng = int(ng)
    uk = np.asarray(jax.device_get(uk))[:ng]
    agg = np.asarray(jax.device_get(agg))[:ng]
    want_k = np.unique(keys)
    assert np.array_equal(uk, want_k), "groupby keys wrong!"
    want_sum = np.zeros(want_k.shape, np.uint64)
    np.add.at(want_sum, np.searchsorted(want_k, keys), vals.astype(np.uint64))
    assert np.array_equal(agg, want_sum.astype(np.uint32)), "groupby sums wrong!"
    return m


def _groupby_dense_bench(n, name, bins=1024):
    from radx_tpu import runtime
    from radx_tpu.config import resolve_interpret, tuned
    from radx_tpu.ops.groupby import _groupby_dense_jit
    import jax
    import jax.numpy as jnp

    from radx_tpu.utils import time_op

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
    keys = (runtime.gen_uniform(n, seed=6) % (bins - 7)).astype(np.uint32)
    vals = runtime.gen_uniform(n, seed=7)
    kj, vj = jnp.asarray(keys), jnp.asarray(vals)

    # dense_sums keeps (keys, values) shapes out of the picture — chain on
    # the values by xoring the (n-shaped) inputs with a bin-id broadcast is
    # not shape-preserving, so chain the whole op on values instead.
    def op(v):
        from radx_tpu.kernels import aggregate

        sums, counts = aggregate.dense_sums(
            kj, v, bins=bins, interpret=resolve_interpret(cfg)
        )
        # fold the (bins,) result back into an n-shaped value array to keep
        # the chain data-dependent without changing shapes
        return v ^ jax.lax.dynamic_slice(
            jnp.tile(sums, n // bins + 1), (0,), (n,)
        )

    m = time_op(op, vj, name=name, items=n, bytes_moved=8 * n, iters=4)
    # correctness gate on the timed artifact
    uk, out, ng, _ = _groupby_dense_jit(kj, vj, cfg, "sum", bins)
    ng = int(ng)
    uk = np.asarray(jax.device_get(uk))[:ng]
    out = np.asarray(jax.device_get(out))[:ng].view(np.uint32)
    want_k = np.unique(keys)
    assert np.array_equal(uk, want_k), "dense groupby keys wrong!"
    want = np.zeros(bins, np.uint64)
    np.add.at(want, keys, vals.astype(np.uint64))
    assert np.array_equal(out, want.astype(np.uint32)[want_k]), \
        "dense groupby sums wrong!"
    return m


def _groupby_minmax_bench(n, name, bins=1024):
    from radx_tpu import runtime
    from radx_tpu.config import resolve_interpret, tuned
    from radx_tpu.ops.groupby import _groupby_dense_jit, _order_i32
    import jax
    import jax.numpy as jnp

    from radx_tpu.utils import time_op

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
    keys = (runtime.gen_uniform(n, seed=8) % (bins - 3)).astype(np.uint32)
    vals = runtime.gen_uniform(n, seed=9)
    kj = jnp.asarray(keys)
    ovj = _order_i32(jnp.asarray(vals))  # order-isomorphic i32

    def op(v):
        from radx_tpu.kernels import aggregate

        ext, counts = aggregate.dense_extrema(
            kj, v, bins=bins, is_min=True, interpret=resolve_interpret(cfg)
        )
        # fold the (bins,) result back into an n-shaped chain input
        return v ^ jax.lax.dynamic_slice(
            jnp.tile(ext, n // bins + 1), (0,), (n,)
        )

    m = time_op(op, ovj, name=name, items=n, bytes_moved=8 * n, iters=4)
    # correctness gate on the timed artifact (op-level min, uint32 values)
    uk, out, ng, _ = _groupby_dense_jit(
        kj, jnp.asarray(vals), cfg, "min", bins
    )
    ng = int(ng)
    uk = np.asarray(jax.device_get(uk))[:ng]
    got = (
        np.asarray(jax.device_get(out))[:ng].view(np.uint32)
        ^ np.uint32(0x80000000)
    )
    want_k = np.unique(keys)
    assert np.array_equal(uk, want_k), "dense min keys wrong!"
    want = np.full(bins, 0xFFFFFFFF, np.uint32)
    np.minimum.at(want, keys, vals)
    assert np.array_equal(got, want[want_k]), "dense min values wrong!"
    return m


def _filter_bench(n, name):
    from radx_tpu import runtime
    from radx_tpu.config import resolve_interpret, tuned
    from radx_tpu.ops.filter import _compact_jit
    import jax
    import jax.numpy as jnp

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
    vals = runtime.gen_uniform(n, seed=5)
    mask = (vals & 1).astype(np.uint32)
    from radx_tpu.utils import time_op

    mj = jnp.asarray(mask.astype(np.int32))
    vj = jnp.asarray(jax.lax.bitcast_convert_type(jnp.asarray(vals),
                                                  jnp.int32))

    # compaction preserves shapes; re-deriving the mask from the compacted
    # column keeps the chain data-dependent
    def op(v):
        (out,), _ = _compact_jit((v & 1), (v,), cfg, n)
        return out

    m = time_op(op, vj, name=name, items=n, bytes_moved=12 * n, iters=4)
    # correctness gate
    (out,), cnt = _compact_jit(mj, (vj,), cfg, n)
    cnt = int(cnt)
    got = np.asarray(jax.device_get(out))[:cnt].view(np.uint32)
    assert np.array_equal(got, vals[mask != 0]), "filter output wrong!"
    return m


def _topk_bench(n, name, k=1024):
    import jax
    import jax.numpy as jnp

    from radx_tpu import runtime
    from radx_tpu.config import resolve_interpret, tuned
    from radx_tpu.ops import topk as topk_mod
    from radx_tpu.ops.sort import _encode_keys
    from radx_tpu.utils import time_op

    cfg = tuned()
    if resolve_interpret(cfg):
        n = min(n, 1 << 15)
        k = min(k, 256)
    keys = runtime.gen_uniform(n, seed=11)
    x = jnp.asarray(keys)

    # chain with a real data dependency (an XOR by a constant keeps the
    # uniform distribution uniform; a `* 0` fold would let XLA DCE the op)
    def op(v):
        tv, _ = topk_mod._top_k_jit(~_encode_keys(v), cfg, n, k, True)
        return v ^ tv[0]

    m = time_op(op, x, name=name, items=n, bytes_moved=8 * n)
    # correctness gate: exact (value, index) order vs the stable model
    vals, idx = topk_mod.top_k(x, k, True, cfg)
    order = np.argsort(~keys.astype(np.uint64), kind="stable")[:k]
    assert np.array_equal(
        np.asarray(jax.device_get(idx)), order.astype(np.int32)
    ), "top_k indices wrong!"
    assert np.array_equal(
        np.asarray(jax.device_get(vals)), keys[order]
    ), "top_k values wrong!"
    return m


CONFIGS = {
    "sort_8m": lambda: _sort_bench(1 << 23, "sort_u32 2^23"),
    "sort_64m": lambda: _sort_bench(1 << 26, "sort_u32 2^26"),
    "sort_268m": lambda: _sort_bench(1 << 28, "sort_u32 2^28"),
    "sort_radix_64m": lambda: _sort_radix_bench(1 << 26, "sort_radix 2^26"),
    "sort_radix_268m": lambda: _sort_radix_bench(1 << 28, "sort_radix 2^28"),
    "pairs_4m": lambda: _pairs_bench(1 << 22, "sort_pairs 2^22"),
    "pairs_256m": lambda: _pairs_bench(1 << 28, "sort_pairs 2^28"),
    "pairs_unique_4m": lambda: _pairs_unique_bench(
        1 << 22, "sort_pairs_unique 2^22"
    ),
    "pairs_unique_256m": lambda: _pairs_unique_bench(
        1 << 28, "sort_pairs_unique 2^28"
    ),
    "groupby_4m": lambda: _groupby_bench(1 << 22, "groupby_sum 2^22"),
    "groupby_64m": lambda: _groupby_bench(1 << 26, "groupby_sum 2^26"),
    "groupby_dense_16m": lambda: _groupby_dense_bench(
        1 << 24, "groupby_dense 2^24 bins=1024"
    ),
    "groupby_minmax_16m": lambda: _groupby_minmax_bench(
        1 << 24, "groupby_dense_min 2^24 bins=1024"
    ),
    "filter_64m": lambda: _filter_bench(1 << 26, "filter 2^26"),
    "topk_64m": lambda: _topk_bench(1 << 26, "top_k 2^26 k=1024"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="sort_8m")
    args = ap.parse_args(argv)
    rows = []
    for name in args.configs.split(","):
        name = name.strip()
        if name not in CONFIGS:
            print(f"unknown config {name!r}; have {sorted(CONFIGS)}")
            return 2
        m = CONFIGS[name]()
        print(m.row(), flush=True)
        rows.append(
            {"config": name, "seconds": m.seconds, "items_per_s": m.items_per_s}
        )
    print(json.dumps({"suite": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
