"""Direct tests for the mask-compaction kernel (kernels/compact.py).

Every relational op rides this kernel (filter directly; groupby/lazy/dense
aggregate via ops/filter._compact_jit), so it gets its own coverage beyond
the operator-level tests: densities from all-dropped to all-kept, plane
counts 1-3, chunk heights that exercise both the vectorized (< 2^K_VEC
rows) and scalar-looped merge levels, multi-chunk stitching, and ragged n.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from radx_tpu.kernels import compact


def _run(mask, planes, c_rows):
    outs, count = compact.compact_flat(
        jnp.asarray(mask.astype(np.int32)),
        [jnp.asarray(p.astype(np.int32)) for p in planes],
        c_rows,
        interpret=True,
    )
    return [np.asarray(o) for o in outs], int(count)


def _check(mask, planes, c_rows):
    outs, count = _run(mask, planes, c_rows)
    keep = mask != 0
    assert count == int(keep.sum())
    for p, o in zip(planes, outs):
        np.testing.assert_array_equal(o[:count], p[keep])


@pytest.mark.parametrize("density", [0.0, 0.03, 0.5, 0.97, 1.0])
def test_densities_single_chunk(rng, density):
    n = 32 * 128
    mask = (rng.random(n) < density).astype(np.int32)
    _check(mask, [rng.integers(0, 2**31, n).astype(np.int32)], 32)


@pytest.mark.parametrize("n_planes", [1, 2, 3])
def test_plane_counts(rng, n_planes):
    n = 16 * 128
    mask = (rng.random(n) < 0.4).astype(np.int32)
    planes = [
        rng.integers(0, 2**31, n).astype(np.int32) for _ in range(n_planes)
    ]
    _check(mask, planes, 16)


@pytest.mark.parametrize("c_rows", [8, 16, 64])
def test_chunk_heights_cover_scalar_levels(rng, c_rows):
    # c_rows=8 hits only vectorized merge levels (K_VEC=3); 16/64 exercise
    # the dynamic-window scalar pair loop for levels 3+.
    n = c_rows * 128
    mask = (rng.random(n) < 0.3).astype(np.int32)
    _check(mask, [np.arange(n, dtype=np.int32)], c_rows)


def test_multi_chunk_stitch(rng):
    # 4 chunks; chunk valid-prefix lengths differ so the forward
    # dynamic_update_slice stitch must overwrite predecessors' garbage.
    c_rows, n_chunks = 8, 4
    n = c_rows * 128 * n_chunks
    mask = np.zeros(n, np.int32)
    dens = [0.9, 0.05, 0.0, 0.6]
    for c in range(n_chunks):
        s = c * c_rows * 128
        mask[s : s + c_rows * 128] = (
            rng.random(c_rows * 128) < dens[c]
        ).astype(np.int32)
    _check(mask, [np.arange(n, dtype=np.int32)], c_rows)


def test_multi_chunk_stitch_scalar_levels_empty_first(rng):
    # r4 advice: combine multi-chunk stitching WITH the scalar merge levels
    # (c_rows >= 16) and make the FIRST chunk entirely empty, so the stitch
    # writes chunk 1's prefix at offset 0 over chunk 0's garbage.
    c_rows, n_chunks = 16, 4
    n = c_rows * 128 * n_chunks
    mask = np.zeros(n, np.int32)
    dens = [0.0, 0.7, 0.0, 0.4]
    for c in range(n_chunks):
        s = c * c_rows * 128
        mask[s : s + c_rows * 128] = (
            rng.random(c_rows * 128) < dens[c]
        ).astype(np.int32)
    _check(mask, [np.arange(n, dtype=np.int32)], c_rows)


def test_ragged_n_pads_dropped(rng):
    # n not a chunk multiple: the pad tail is masked out and never kept.
    c_rows = 8
    n = c_rows * 128 * 2 + 577
    mask = (rng.random(n) < 0.5).astype(np.int32)
    _check(mask, [rng.integers(0, 2**31, n).astype(np.int32)], c_rows)


def test_stability_order_preserved(rng):
    # kept rows appear in original order: compact an iota and require the
    # prefix to be strictly increasing.
    n = 16 * 128
    mask = (rng.random(n) < 0.37).astype(np.int32)
    outs, count = _run(mask, [np.arange(n, dtype=np.int32)], 16)
    got = outs[0][:count]
    assert np.all(got[1:] > got[:-1])
    np.testing.assert_array_equal(got, np.nonzero(mask)[0])


def test_single_row_runs(rng):
    # every row fully kept or fully dropped: run merges hit the lenA==full
    # and lenA==0 skip branches.
    c_rows = 16
    n = c_rows * 128
    rows_kept = rng.random(c_rows) < 0.5
    mask = np.repeat(rows_kept, 128).astype(np.int32)
    _check(mask, [np.arange(n, dtype=np.int32)], c_rows)
