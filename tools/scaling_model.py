"""Scaling-efficiency evidence for the distributed sort (BASELINE config 5).

Real multi-chip hardware is unavailable in this environment (single v5e via
the axon relay), so the ≥80%-to-2-hosts claim is substantiated three ways:

1. `--trace`: run the 8-device virtual-mesh distributed sort under
   jax.profiler and save an XProf/Perfetto trace showing the ppermute wave
   / pairwise-merge interleaving the overlap=True scheduler emits
   (artifact: traces/dist_sort_8dev).
2. `--model`: an analytic wall-clock model per device built ONLY from
   measured single-chip component rates (local sort, run merge — both
   measured on the real v5e, see NOTES.md) plus link bandwidths, printing
   weak-scaling efficiency per device count over ICI and DCN.
3. the collective-bytes audit: bytes over the wire per key, printed with
   the model (one tiled all_gather of samples + D-1 ppermute waves of one
   slot each).

Usage: python tools/scaling_model.py [--model] [--trace]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- measured component rates (v5e, chained timing, NOTES.md r4) ----------
R_SORT = {  # local bitonic sort, G keys/s at L keys
    1 << 22: 1.85, 1 << 23: 1.87, 1 << 24: 1.53, 1 << 26: 1.25,
}
R_MERGE_PER_LEVEL = 25.4  # G keys/s per pairwise merge level (MEASURED
# on v5e: merge_sorted_runs of 2x2^21 runs = 0.165 ms chained — one
# near-bandwidth pass; NOTES.md r4)
CAPACITY_OVER_MEAN = 1.2  # slot headroom: exchanged bytes per key ~ h*4B

# link bandwidths, GB/s per chip, achievable (~75% of spec)
ICI_V5E = 186 * 0.75  # 4 links x 400 Gbps richer than needed; be modest
DCN = 25.0  # ~200 Gbps NIC per host


def interp_rate(L):
    import bisect

    ks = sorted(R_SORT)
    if L <= ks[0]:
        return R_SORT[ks[0]]
    if L >= ks[-1]:
        return R_SORT[ks[-1]]
    i = bisect.bisect_left(ks, L)
    a, b = ks[i - 1], ks[i]
    fa, fb = R_SORT[a], R_SORT[b]
    import math

    t = (math.log2(L) - math.log2(a)) / (math.log2(b) - math.log2(a))
    return fa + t * (fb - fa)


def model(L=1 << 23):
    import math

    print(f"weak-scaling model, L = {L} keys/device (keys-only, 4 B/key)")
    print(f"{'D':>4} {'link':>5} {'exch':>5} {'waves':>5} {'t_sort':>8} "
          f"{'t_exch':>8} {'t_merge':>8} {'t_total':>8} {'eff_w':>6} "
          f"{'eff_s':>6} {'B/key':>6} {'recvMB':>7}")
    t1 = L / (interp_rate(L) * 1e9)
    # per-wave fixed overhead (dispatch + collective launch + link latency):
    # assumed, not measured — ICI ppermute ~10 us, DCN ~100 us.  This is the
    # term the hierarchical exchange exists to amortize (O(D) -> O(sqrt D)).
    T_WAVE = {"ICI": 10e-6, "DCN": 100e-6}

    def pow2pad(x):
        return 1 << max(0, (int(x) - 1).bit_length())

    for link, bw in (("ICI", ICI_V5E), ("DCN", DCN)):
        for D in (2, 4, 8, 16, 32, 64, 128, 256):
            t_merge = (
                math.ceil(math.log2(D))
                * CAPACITY_OVER_MEAN
                * L
                / (R_MERGE_PER_LEVEL * 1e9)
            )
            t1_total = (D * L) / (interp_rate(D * L) * 1e9)

            def emit(name, waves, t_exch, recv_bytes):
                t_total = (
                    t1 + max(t_exch, t_merge) + min(t_exch, t_merge) * 0.2
                )
                eff_w = t1 / t_total
                eff_s = t1_total / (D * t_total)
                bpk = 4 * t_exch_bytes / L
                print(
                    f"{D:>4} {link:>5} {name:>5} {waves:>5} {t1*1e3:8.2f} "
                    f"{t_exch*1e3:8.2f} {t_merge*1e3:8.2f} "
                    f"{t_total*1e3:8.2f} {eff_w:6.1%} {eff_s:6.1%} "
                    f"{bpk:6.1f} {recv_bytes/1e6:7.1f}"
                )

            # flat: D-1 waves, each key crosses once.  Recv buffer =
            # n_runs * pow2(slot) (the pow2 x capacity multiplier the r4
            # verdict flagged: CAPACITY=4 in code; model uses its own h).
            slot_flat = pow2pad(4 * L / D)  # capacity=4 in keys
            t_exch_bytes = CAPACITY_OVER_MEAN * L  # keys crossing once
            t_exch = (D - 1) * (
                (slot_flat * 4) / (bw * 1e9) + T_WAVE[link]
            )
            emit("flat", D - 1, t_exch, pow2pad(D) * slot_flat * 4)

            # hier: (Dr-1)+(Dc-1) waves, each key crosses twice
            if D >= 4:
                k = int(math.log2(D))
                d_r, d_c = 1 << (k - k // 2), 1 << (k // 2)
                slot1 = pow2pad(4 * L / d_r)
                slot2 = pow2pad(4 * L / d_c)
                t_exch_bytes = 2 * CAPACITY_OVER_MEAN * L
                t_exch = (d_r - 1) * (
                    (slot1 * 4) / (bw * 1e9) + T_WAVE[link]
                ) + (d_c - 1) * ((slot2 * 4) / (bw * 1e9) + T_WAVE[link])
                recv = max(pow2pad(d_r) * slot1, pow2pad(d_c) * slot2) * 4
                emit("hier", d_r + d_c - 2, t_exch, recv)


def trace(out="traces/dist_sort_8dev", per_dev=1 << 15):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from radx_tpu.config import SortConfig
    from radx_tpu.parallel import dist_sort, make_mesh
    from radx_tpu.utils.timing import trace as xtrace

    mesh = make_mesh(8)
    cfg = SortConfig(chunk_rows=64)
    n = per_dev * 8
    keys = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).integers(0, 2**32, n, dtype=np.uint32)
        ),
        NamedSharding(mesh, P("d")),
    )
    # warm (compile outside the trace)
    out1 = dist_sort.sort_sharded(keys, mesh, cfg=cfg)
    jax.block_until_ready(out1)
    with xtrace(out):
        out2 = dist_sort.sort_sharded(keys, mesh, cfg=cfg)
        jax.block_until_ready(out2)
    print(f"trace written to {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", action="store_true")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    if args.model or not args.trace:
        model()
    if args.trace:
        trace()
