"""One-pass Pallas segmented scan (kernels/segscan.py) vs scalar reference.

Covers the cross-chunk carry (runs spanning chunk boundaries), all ops
including the join's "fill" copy-scan, dtype arithmetic, and the flat
wrapper's padding contract.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radx_tpu.kernels import segscan


def _ref_scan(k, v, op):
    out = np.empty_like(v)
    tot = None
    fn = {"sum": lambda a, b: a + b, "min": min, "max": max}[op]
    for i in range(len(k)):
        tot = v[i] if (i == 0 or k[i] != k[i - 1]) else fn(tot, v[i])
        out[i] = tot
    return out


@pytest.mark.parametrize("rows,nkeys", [(8, 3), (32, 5), (64, 1), (64, 2000)])
@pytest.mark.parametrize("op", ["sum", "min", "max"])
def test_segscan_ops_cross_chunk(rng, rows, nkeys, op):
    n = rows * 128
    k = np.sort(rng.integers(0, nkeys, n).astype(np.uint32))
    v = rng.integers(0, 100, n).astype(np.uint32)
    out = segscan.segscan_sorted(
        jnp.asarray(k.view(np.int32).reshape(rows, 128)),
        jnp.asarray(v.view(np.int32).reshape(rows, 128)),
        op, jnp.uint32, 8, interpret=True,
    )
    got = np.asarray(out).reshape(-1).view(np.uint32)
    np.testing.assert_array_equal(got, _ref_scan(k, v, op))


def test_segscan_float32(rng):
    rows, n = 32, 32 * 128
    k = np.sort(rng.integers(0, 17, n).astype(np.uint32))
    v = rng.normal(size=n).astype(np.float32)
    out = segscan.segscan_sorted(
        jnp.asarray(k.view(np.int32).reshape(rows, 128)),
        jnp.asarray(v.view(np.int32).reshape(rows, 128)),
        "sum", jnp.float32, 8, interpret=True,
    )
    got = np.asarray(out).reshape(-1).view(np.float32)
    want = _ref_scan(k, v.astype(np.float64), "sum")
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-4,
                               atol=1e-3)  # doubling-tree vs sequential order


def test_segscan_fill(rng):
    """The join's segmented copy-scan: forward-propagate the last flagged
    value within each run, across chunk boundaries."""
    rows = 32
    n = rows * 128
    k = np.sort(rng.integers(0, 9, n).astype(np.uint32))
    hv = (rng.random(n) < 0.1).astype(np.int32)
    v = rng.integers(0, 1000, n).astype(np.uint32)
    fo, ho = segscan.segscan_sorted(
        jnp.asarray(k.view(np.int32).reshape(rows, 128)),
        jnp.asarray(v.view(np.int32).reshape(rows, 128)),
        "fill", jnp.uint32, 8, interpret=True,
        has_plane=jnp.asarray(hv.reshape(rows, 128)),
    )
    gf = np.asarray(fo).reshape(-1).view(np.uint32)
    gh = np.asarray(ho).reshape(-1)
    wf, wh = v.copy(), hv.copy()
    last, lastk = None, None
    for i in range(n):
        if lastk is None or k[i] != lastk:
            last, lastk = None, k[i]
        if hv[i]:
            last = v[i]
        elif last is not None:
            wf[i] = last
            wh[i] = 1
    np.testing.assert_array_equal(gh, wh)
    sel = wh != 0
    np.testing.assert_array_equal(gf[sel], wf[sel])


def test_segscan_flat_padding(rng):
    """Flat wrapper: non-plane-multiple n, pads never feed real rows."""
    n = 1000  # pads to 8 rows = 1024
    k = np.sort(rng.integers(0, 7, n).astype(np.uint32))
    k[-20:] = 0xFFFFFFFF  # real keys equal to the pad fill value
    v = rng.integers(0, 50, n).astype(np.uint32)
    got = np.asarray(
        segscan.segscan_flat(jnp.asarray(k), jnp.asarray(v), "sum", 8, True)
    )
    np.testing.assert_array_equal(got, _ref_scan(k, v, "sum"))
