"""Sweep engine tunables on the current accelerator and emit a TUNING entry.

The analogue of the reference's per-vendor dispatch (radx_shaders.hpp:87-111
picks a shader variant per vendorID; radx_device.hpp:53-60 picks a subgroup
size) — except measured, not hard-coded: this sweeps `chunk_rows` (keys-only
bitonic VMEM chunk) and `stable_chunk_rows` (multi-plane network chunk) at a
representative size and prints the dict to paste into
radx_tpu.config.TUNING for `jax.devices()[0].device_kind`.

Timing discipline: chained iterations inside one jit, tiny data-dependent
readback, (t_k - t_1)/(k - 1) — see radx_tpu/utils/timing.py.

Usage: python tools/autotune.py [log2n] [--json out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from radx_tpu.config import SortConfig, device_kind
from radx_tpu.ops import sort as S


def _chain_time(make_fn, keys, k=5):
    def chain(j):
        @jax.jit
        def f(ks):
            for _ in range(j):
                ks = make_fn(ks)
            return ks
        return f

    f1, fk = chain(1), chain(k)

    def run(f):
        t0 = time.perf_counter()
        jax.device_get(f(keys)[:8])
        return time.perf_counter() - t0

    run(f1); run(fk)  # compile
    t1 = min(run(f1) for _ in range(3))
    tk = min(run(fk) for _ in range(3))
    # clamp: host contention can make tk < t1 (the relay dispatch is
    # CPU-sensitive), which would report a negative rate — floor at ~0
    # like bench.py so a noisy sweep reads as "absurdly fast", never
    # negative; re-run on an idle host before recording TUNING entries
    return max((tk - t1) / (k - 1), 1e-9)


def sweep_chunk_rows(n, candidates=(512, 1024, 2048, 4096)):
    """Keys-only sort throughput vs chunk_rows, both strategies."""
    rng = np.random.default_rng(0)
    keys = jax.device_put(rng.integers(0, 2**32, n, dtype=np.uint32))
    best = {}
    for strat in ("bitonic", "radix"):
        rows = []
        for cr in candidates:
            cfg = SortConfig(strategy=strat, chunk_rows=cr)
            try:
                dt = _chain_time(
                    lambda ks, cfg=cfg: S._sort_keys_jit(ks, cfg, n), keys
                )
                gps = n / dt / 1e9
                rows.append((cr, gps))
                print(f"  {strat:8s} chunk_rows={cr:5d}: {gps:6.3f} G keys/s",
                      flush=True)
            except Exception as e:
                print(f"  {strat:8s} chunk_rows={cr:5d}: failed "
                      f"{repr(e)[:120]}", flush=True)
        if rows:
            best[strat] = max(rows, key=lambda r: r[1])
    return best


def sweep_stable_chunk_rows(n, candidates=(128, 256, 512)):
    """Stable pairs throughput vs stable_chunk_rows (compile time is the
    binding constraint here — NOTES.md: Mosaic compile superlinear in
    substages × planes)."""
    rng = np.random.default_rng(1)
    keys = jax.device_put(rng.integers(0, 2**32, n, dtype=np.uint32))
    vals = jax.device_put(np.arange(n, dtype=np.uint32))
    rows = []
    for cr in candidates:
        cfg = SortConfig(stable_chunk_rows=cr)
        try:
            tc0 = time.perf_counter()
            dt = _chain_time(
                lambda ks, cfg=cfg: S._sort_stable_jit(ks, vals, cfg, n,
                                                       True)[0],
                keys,
            )
            wall = time.perf_counter() - tc0
            gps = n / dt / 1e9
            rows.append((cr, gps))
            print(f"  pairs stable_chunk_rows={cr:4d}: {gps:6.3f} G keys/s "
                  f"(sweep wall {wall:.0f}s incl. compile)", flush=True)
        except Exception as e:
            print(f"  pairs stable_chunk_rows={cr:4d}: failed "
                  f"{repr(e)[:120]}", flush=True)
    return max(rows, key=lambda r: r[1]) if rows else None


def sweep_stable2_chunk_rows(n, candidates=(256, 512, 1024)):
    """2-plane num_cmp=2 stable sort (argsort/sort_u64) vs
    stable2_chunk_rows — taller chunks than the 3+-plane paths are both
    compile-safe and measured faster on v5e (NOTES.md r5)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    keys = jax.device_put(
        rng.integers(-2**31, 2**31, n).astype(np.int32)
    )
    rows = []
    for cr in candidates:
        cfg = SortConfig(stable2_chunk_rows=cr)

        def op(ks, cfg=cfg):
            from radx_tpu.kernels import bitonic

            ip = jax.lax.iota(jnp.int32, n).reshape(-1, 128)
            o = bitonic.sort_planes(
                [ks.reshape(-1, 128), ip], cfg.stable2_chunk_rows, 2
            )
            return o[0].reshape(-1)

        try:
            dt = _chain_time(op, keys)
            gps = n / dt / 1e9
            rows.append((cr, gps))
            print(f"  argsort stable2_chunk_rows={cr:4d}: {gps:6.3f} "
                  f"G keys/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  argsort stable2_chunk_rows={cr:4d}: failed "
                  f"{repr(e)[:120]}", flush=True)
    return max(rows, key=lambda r: r[1]) if rows else None


def sweep_topk_chunk_rows(n, k=1024, candidates=(256, 512, 1024)):
    """top_k selection throughput vs topk_chunk_rows."""
    from radx_tpu.ops import topk as topk_mod

    rng = np.random.default_rng(3)
    keys = jax.device_put(rng.integers(0, 2**32, n, dtype=np.uint32))
    rows = []
    for cr in candidates:
        cfg = SortConfig(topk_chunk_rows=cr)

        def op(ks, cfg=cfg):
            tv, _ = topk_mod._top_k_jit(~ks, cfg, n, k, True)
            return ks ^ tv[0]

        try:
            dt = _chain_time(op, keys)
            gps = n / dt / 1e9
            rows.append((cr, gps))
            print(f"  top_k topk_chunk_rows={cr:4d}: {gps:6.3f} G keys/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  top_k topk_chunk_rows={cr:4d}: failed "
                  f"{repr(e)[:120]}", flush=True)
    return max(rows, key=lambda r: r[1]) if rows else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lg = int(args[0]) if args else 24
    n = 1 << lg
    kind = device_kind()
    print(f"device_kind = {kind!r}, sweep at n = 2^{lg}", flush=True)

    best = sweep_chunk_rows(n)
    stable = sweep_stable_chunk_rows(min(n, 1 << 22))
    stable2 = sweep_stable2_chunk_rows(min(n, 1 << 22))
    topk = sweep_topk_chunk_rows(min(n, 1 << 24))

    # chunk_rows serves both strategies; pick the bitonic optimum (the
    # radix path's phase-1/phase-C chunk sorts share it).
    entry = {}
    if "bitonic" in best:
        entry["chunk_rows"] = best["bitonic"][0]
    if stable:
        entry["stable_chunk_rows"] = stable[0]
    if stable2:
        entry["stable2_chunk_rows"] = stable2[0]
    if topk:
        entry["topk_chunk_rows"] = topk[0]
    result = {
        "device_kind": kind,
        "tuning_entry": entry,
        "measured": {
            **{f"{s}_GkeysPerS_at_2^{lg}": round(v, 3)
               for s, (_, v) in best.items()},
            **({"pairs_GkeysPerS": round(stable[1], 3)} if stable else {}),
            **({"argsort_GkeysPerS": round(stable2[1], 3)}
               if stable2 else {}),
            **({"topk_GkeysPerS": round(topk[1], 3)} if topk else {}),
        },
    }
    print(json.dumps(result))
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
