"""Distributed MSD sort on the virtual 8-device CPU mesh (SURVEY §4: the
multi-host story the reference entirely lacks).  conftest.py forces
JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8.
"""

import jax
import numpy as np
import pytest

from radx_tpu.config import SortConfig
from radx_tpu.parallel import dist_sort, make_mesh

CFG = SortConfig(chunk_rows=8)


def _run(keys, n_dev, capacity=4):
    mesh = make_mesh(n_dev)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = jax.device_put(
        jnp.asarray(keys), NamedSharding(mesh, P("d"))
    )
    out, valid, overflow = dist_sort.sort_sharded(
        sharded, mesh, capacity=capacity, cfg=CFG
    )
    return out, valid, np.asarray(jax.device_get(overflow))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_uniform(rng, n_dev):
    keys = rng.integers(0, 2**32, 1 << 14, dtype=np.uint32)
    out, valid, overflow = _run(keys, n_dev)
    assert not overflow.any()
    got = dist_sort.collect(out, valid)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_skewed(rng):
    # 80% of keys in one narrow top-16-bit range: splitter must not send
    # everything to one device's fixed digit range.
    n = 1 << 14
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    hot = rng.integers(0x12340000, 0x1234FFFF, (n * 4) // 5, dtype=np.uint32)
    keys[: hot.size] = hot
    out, valid, overflow = _run(keys, 8, capacity=8)
    assert not overflow.any()
    got = dist_sort.collect(out, valid)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_constant_overflows_gracefully(rng):
    # all keys identical: one device must receive everything; with small
    # capacity the overflow flag must trip rather than silently corrupt.
    keys = np.full(1 << 13, 0xABCD1234, dtype=np.uint32)
    out, valid, overflow = _run(keys, 8, capacity=1)
    assert overflow.any()
    # and with enough capacity it must succeed
    out, valid, overflow = _run(keys, 8, capacity=8)
    assert not overflow.any()
    got = dist_sort.collect(out, valid)
    np.testing.assert_array_equal(got, np.sort(keys))


def test_sentinel_keys(rng):
    keys = rng.integers(0, 2**32, 1 << 13, dtype=np.uint32)
    keys[:1000] = 0xFFFFFFFF
    out, valid, overflow = _run(keys, 4)
    assert not overflow.any()
    got = dist_sort.collect(out, valid)
    np.testing.assert_array_equal(got, np.sort(keys))
