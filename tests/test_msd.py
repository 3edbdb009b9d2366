"""MSD split sort (kernels/msd.py) — the strategy="radix" production path.

Mirrors the reference's missing test coverage for its core pipeline
(counting -> partition -> scattering, radx_implement.inl:421-447): bit-exact
vs np.sort across distributions, stability with duplicate keys + payloads,
the overflow contract under adversarial skew, and the ops.sort dispatch
with its lax.cond bitonic fallback.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radx_tpu.config import SortConfig
from radx_tpu.kernels import msd
from radx_tpu.ops import sort as S

LANES = 128
CR = 64  # chunk_rows for tests: C = 8192
C = CR * LANES


def _run(keys_i32, num_cmp=1, n_valid=None, chunk_rows=CR):
    n = keys_i32.size
    planes = [jnp.asarray(keys_i32.reshape(n // LANES, LANES))]
    if num_cmp == 2:
        idx = np.arange(n, dtype=np.int32)
        if n_valid is not None:
            idx[n_valid:] = 0x7FFFFFFF
        planes.append(jnp.asarray(idx.reshape(n // LANES, LANES)))
    outs, ovf = msd.sort_msd(
        planes, chunk_rows, num_cmp, interpret=True, n_valid=n_valid
    )
    nv = n_valid if n_valid is not None else n
    return (
        [np.asarray(o).reshape(-1)[:nv] for o in outs],
        bool(ovf),
    )


def test_plan_gates():
    assert msd.plan(4 * C, CR) is not None
    assert msd.plan(2 * C, CR) is None  # too few chunks
    assert msd.plan(4 * C + LANES, CR) is None  # not a multiple of C
    # slot_rows >= 8 bound (smaller windows crash Mosaic on HW — see plan())
    assert msd.plan((CR // 8) * C, CR) is not None  # slot_rows == 8 boundary
    assert msd.plan((CR // 4) * C, CR) is None  # slot_rows would be 4
    assert msd.plan(2 * CR * C, CR) is None  # slot_rows would be < 1


def test_uniform_exact():
    rng = np.random.default_rng(0)
    k = rng.integers(-(2**31), 2**31 - 1, 8 * C, dtype=np.int64).astype(
        np.int32
    )
    outs, ovf = _run(k)
    assert not ovf
    np.testing.assert_array_equal(outs[0], np.sort(k))


@pytest.mark.parametrize("shape", ["presorted", "reverse", "narrow"])
def test_correlated_inputs(shape):
    """Block-cyclic chunking keeps sample splitters balanced for
    locally-ordered inputs (the skew class RadX's fixed blocks never see)."""
    rng = np.random.default_rng(1)
    k = rng.integers(-(2**31), 2**31 - 1, 8 * C, dtype=np.int64).astype(
        np.int32
    )
    if shape == "presorted":
        k = np.sort(k)
    elif shape == "reverse":
        k = np.sort(k)[::-1].copy()
    else:
        k = rng.integers(0, 10000, 8 * C, dtype=np.int64).astype(np.int32)
    outs, ovf = _run(k)
    assert not ovf
    np.testing.assert_array_equal(outs[0], np.sort(k))


def test_wide_bucket_array():
    """16 chunks -> nb_pad = 24 > 2K: the concat kernel's slab pair is
    fetched at a nonzero K-aligned block index (regression for the
    BlockSpec block-unit offset bug).  chunk_rows=128 keeps slot_rows at
    the >= 8 bound with 16 chunks."""
    cr = 128
    rng = np.random.default_rng(7)
    k = rng.integers(
        -(2**31), 2**31 - 1, 16 * cr * LANES, dtype=np.int64
    ).astype(np.int32)
    outs, ovf = _run(k, chunk_rows=cr)
    assert not ovf
    np.testing.assert_array_equal(outs[0], np.sort(k))


def test_constant_overflows_gracefully():
    k = np.full(4 * C, 7, np.int32)
    _, ovf = _run(k)
    assert ovf  # one value can't be split: callers must fall back


def test_stable_pairs():
    rng = np.random.default_rng(2)
    k = rng.integers(0, 50, 8 * C, dtype=np.int64).astype(np.int32)
    outs, ovf = _run(k, num_cmp=2)
    if ovf:
        pytest.skip("sample splitters overflowed on this seed")
    idx = outs[1]
    np.testing.assert_array_equal(outs[0], np.sort(k))
    np.testing.assert_array_equal(k[idx], np.sort(k))
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(idx, order.astype(np.int32))


def test_padded_tail():
    rng = np.random.default_rng(3)
    nv = 8 * C - 777
    k = rng.integers(-(2**31), 2**31 - 1, 8 * C, dtype=np.int64).astype(
        np.int32
    )
    k[nv:] = 0x7FFFFFFF  # caller-provided sentinel tail
    outs, ovf = _run(k, num_cmp=2, n_valid=nv)
    assert not ovf
    np.testing.assert_array_equal(outs[0], np.sort(k[:nv]))
    np.testing.assert_array_equal(k[outs[1]], np.sort(k[:nv]))


def test_ops_sort_radix_dispatch():
    cfg = SortConfig(
        strategy="radix", chunk_rows=CR, stable_chunk_rows=CR, interpret=True
    )
    rng = np.random.default_rng(4)
    n = 6 * C + 123  # non-pow2: exercises pow2 padding + n_valid
    k = rng.integers(0, 2**32, n, dtype=np.uint32)
    got = np.asarray(S.sort(jnp.asarray(k), cfg))
    np.testing.assert_array_equal(got, np.sort(k))
    # adversarial skew: lax.cond falls back to the bitonic network
    ks = np.full(n, 42, np.uint32)
    np.testing.assert_array_equal(
        np.asarray(S.sort(jnp.asarray(ks), cfg)), ks
    )
    # stable pairs through the dispatch
    p = rng.integers(0, 2**32, n, dtype=np.uint32)
    gk, gp = S.sort_pairs(jnp.asarray(k), jnp.asarray(p), cfg)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(np.asarray(gk), k[order])
    np.testing.assert_array_equal(np.asarray(gp), p[order])
    # below the MSD size gate: static fallback to bitonic
    ksm = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    np.testing.assert_array_equal(
        np.asarray(S.sort(jnp.asarray(ksm), cfg)), np.sort(ksm)
    )
