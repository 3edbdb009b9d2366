"""Dryrun the distributed sort at D=16/32 virtual devices (VERDICT r4 #8).

CPU backend, xla_force_host_platform_device_count — validates that the
full shard_map program (local sorts + splitters + exchange waves + merge
tree) compiles AND executes bit-exactly at slice-scale device counts,
for both the flat and hierarchical exchanges.

Usage: python tools/dryrun_scale.py [D ...]   (default: 16 32)
"""
import os
import sys

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
_D = max(int(a) for a in (sys.argv[1:] or ["32"]))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_D}"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# sitecustomize (axon relay) may have imported jax and pointed it at the
# TPU tunnel; override back to CPU before the backend initializes
# (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from radx_tpu.config import SortConfig
from radx_tpu.parallel import dist_sort, make_mesh


def run(n_dev, exchange):
    mesh = make_mesh(n_dev)
    cfg = SortConfig(chunk_rows=32, stable_chunk_rows=32)
    n = (1 << 13) * n_dev
    rng = np.random.default_rng(n_dev)
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    sharded = jax.device_put(
        jnp.asarray(keys), NamedSharding(mesh, P("d"))
    )
    out, valid, overflow = dist_sort.sort_sharded(
        sharded, mesh, capacity=4, cfg=cfg, exchange=exchange
    )
    assert not np.asarray(jax.device_get(overflow)).any(), "overflow!"
    got = dist_sort.collect(out, valid)
    assert np.array_equal(got, np.sort(keys)), f"D={n_dev} {exchange} WRONG"
    waves = (n_dev - 1)
    if exchange == "hier":
        f = dist_sort._hier_factor(n_dev)
        if f:
            waves = f[0] + f[1] - 2
    print(f"D={n_dev:3d} exchange={exchange:4s} waves={waves:3d} "
          f"n={n} OK bit-exact", flush=True)


for d in [int(a) for a in (sys.argv[1:] or ["16", "32"])]:
    for ex in ("flat", "hier"):
        run(d, ex)
print("DRYRUN_SCALE_OK", flush=True)
