"""Radix distribution sort (kernels/radix_sort.py) — interpret-mode gates.

Bit-exact vs NumPy across distributions, stability with ties, n_valid
masking, the overflow/fallback contract, and the ops.sort strategy wiring.
(The reference never asserts its output, SURVEY §4; these are the gates it
lacks.)  HW-scale validation runs in tools/validate_scale.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radx_tpu.config import SortConfig
from radx_tpu.kernels import radix_sort
from radx_tpu.ops import sort as sort_ops

SIGN = np.uint32(0x80000000)
C_ROWS = 64  # small chunks keep interpreter wall time sane


def _planes(keys, total, num_cmp):
    biased = (keys ^ SIGN).view(np.int32)
    plane = np.full(total, 0x7FFFFFFF, np.int32)
    plane[: keys.shape[0]] = biased
    planes = [jnp.asarray(plane.reshape(-1, 128))]
    if num_cmp == 2:
        planes.append(jnp.asarray(np.arange(total, dtype=np.int32).reshape(-1, 128)))
    return planes


def _run(keys, total, num_cmp=1):
    outs, ovf = radix_sort.sort_radix(
        _planes(keys, total, num_cmp), C_ROWS, num_cmp,
        interpret=True, n_valid=keys.shape[0],
    )
    n = keys.shape[0]
    got = np.asarray(outs[0]).reshape(-1)[:n].view(np.uint32) ^ SIGN
    perm = (
        np.asarray(outs[1]).reshape(-1)[:n] if num_cmp == 2 else None
    )
    return got, perm, bool(ovf)


DISTS = {
    "uniform": lambda rng, n: rng.integers(0, 2**32, n, dtype=np.uint32),
    "presorted": lambda rng, n: np.sort(
        rng.integers(0, 2**32, n, dtype=np.uint32)
    ),
    "reverse": lambda rng, n: np.sort(
        rng.integers(0, 2**32, n, dtype=np.uint32)
    )[::-1].copy(),
    "clustered": lambda rng, n: (
        rng.integers(0, 4, n, dtype=np.uint32) * np.uint32(0x10000000)
        + rng.integers(0, 1000, n, dtype=np.uint32)
    ),
    "lowcard": lambda rng, n: rng.integers(0, 97, n, dtype=np.uint32),
}


@pytest.mark.parametrize("dist", sorted(DISTS))
def test_exact_or_flagged(rng, dist):
    n = C_ROWS * 128 * 8
    keys = DISTS[dist](rng, n)
    got, _, ovf = _run(keys, n)
    if not ovf:
        assert np.array_equal(got, np.sort(keys)), dist
    # overflow=True is a legitimate outcome (ops.sort falls back); but the
    # engine must handle these common distributions without bailing:
    if dist in ("uniform", "presorted", "reverse", "clustered"):
        assert not ovf, f"{dist} should not overflow"


def test_n_valid_masking(rng):
    total = C_ROWS * 128 * 4
    keys = rng.integers(0, 2**32, total - 517, dtype=np.uint32)
    got, _, ovf = _run(keys, total)
    assert not ovf
    assert np.array_equal(got, np.sort(keys))


def test_stability_with_duplicates(rng):
    total = C_ROWS * 128 * 4
    n = total - 99
    keys = rng.integers(0, 50_000, n, dtype=np.uint32)  # many ties
    got, perm, ovf = _run(keys, total, num_cmp=2)
    if ovf:
        pytest.skip("splitters overflowed on this draw; fallback covers it")
    assert np.array_equal(got, np.sort(keys))
    assert np.array_equal(perm, np.argsort(keys, kind="stable"))


def test_plan_geometry():
    # slot floor: rejects sizes whose slots would degenerate
    assert radix_sort.plan(64 * 128 * 4, 64) is not None
    assert radix_sort.plan(64 * 128 * 2, 64) is None  # n < 4C
    assert radix_sort.plan(64 * 128 * 16, 64) is None  # slot_rows = 4 < 8
    # pick_chunk_rows grows the chunk to keep slots >= 8 rows
    assert radix_sort.pick_chunk_rows(1 << 22, 1024) == 1024
    assert radix_sort.pick_chunk_rows(1 << 27, 1024) == 4096
    assert radix_sort.plan(1 << 27, 4096) is not None
    assert radix_sort.plan(1 << 28, 4096) is not None


def test_ops_sort_radix_strategy(rng):
    cfg = SortConfig(
        strategy="radix", chunk_rows=C_ROWS, stable_chunk_rows=C_ROWS,
        interpret=True,
    )
    n = C_ROWS * 128 * 4
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    out = np.asarray(sort_ops.sort(jnp.asarray(keys), cfg))
    assert np.array_equal(out, np.sort(keys))
    # adversarial duplicates: lax.cond fallback must still be exact
    keys = np.full(n, 0xDEADBEEF, np.uint32)
    out = np.asarray(sort_ops.sort(jnp.asarray(keys), cfg))
    assert np.array_equal(out, np.sort(keys))


def test_ops_sort_pairs_radix_strategy(rng):
    cfg = SortConfig(
        strategy="radix", chunk_rows=C_ROWS, stable_chunk_rows=C_ROWS,
        interpret=True,
    )
    n = C_ROWS * 128 * 4 - 1000
    keys = rng.integers(0, 10_000, n, dtype=np.uint32)
    payload = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
    k, p = sort_ops.sort_pairs(jnp.asarray(keys), jnp.asarray(payload), cfg)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(np.asarray(k), keys[order])
    assert np.array_equal(np.asarray(p), payload[order])
