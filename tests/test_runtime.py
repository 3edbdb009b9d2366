"""Native runtime (C++ generation/validation) behavior."""

import numpy as np

from radx_tpu import runtime


def test_gen_uniform_deterministic():
    a = runtime.gen_uniform(100_000, seed=42)
    b = runtime.gen_uniform(100_000, seed=42)
    np.testing.assert_array_equal(a, b)
    c = runtime.gen_uniform(100_000, seed=43)
    assert not np.array_equal(a, c)
    # roughly uniform across the top byte
    h = np.bincount(a >> 24, minlength=256)
    assert h.min() > 100_000 / 256 * 0.7


def test_gen_permutation():
    p = runtime.gen_permutation(50_000, seed=1)
    np.testing.assert_array_equal(np.sort(p), np.arange(50_000, dtype=np.uint32))


def test_gen_skewed():
    k = runtime.gen_skewed(200_000, seed=3, hot_frac=0.8)
    frac = ((k >> 16) == 0x1234).mean()
    assert 0.75 < frac < 0.85


def test_validate_sort():
    rng = np.random.default_rng(0)
    orig = rng.integers(0, 2**32, 1_000_000, dtype=np.uint32)
    good = np.sort(orig)
    assert runtime.validate_sort(orig, good) == 0
    bad = good.copy()
    bad[1000], bad[2000] = bad[2000], bad[1000]  # not ascending
    assert runtime.validate_sort(orig, bad) == 1
    forged = good.copy()
    forged[0] += 1  # ascending but wrong multiset
    forged.sort()
    assert runtime.validate_sort(orig, forged) == 2
