"""Oracle correctness: NumPy and C++ oracles vs np.sort, and vs each other.

The reference never asserts correctness (SURVEY §4); these tests are the
foundation the whole engine validates against (BASELINE config 1).
"""

import numpy as np
import pytest

from radx_tpu.config import SortConfig
from radx_tpu.oracle import cpu, native

CFG = SortConfig(tile_rows=4)  # small tiles → many tiles, exercises the scan


def _distributions(rng, n):
    return {
        "uniform": rng.integers(0, 2**32, n, dtype=np.uint32),
        "permutation": rng.permutation(n).astype(np.uint32),  # harness fixture
        "skewed": (rng.zipf(1.3, n) % (2**32)).astype(np.uint32),
        "constant": np.full(n, 0xDEADBEEF, dtype=np.uint32),
        "presorted": np.arange(n, dtype=np.uint32),
        "reverse": np.arange(n, 0, -1).astype(np.uint32),
        "low_entropy": rng.integers(0, 16, n, dtype=np.uint32),
        "extremes": rng.choice(
            np.array([0, 1, 2**31, 2**32 - 1], dtype=np.uint32), n),
    }


@pytest.mark.parametrize("n", [1, 5, 512, 4096, 100_000])
def test_numpy_oracle_matches_npsort(rng, n):
    for name, keys in _distributions(rng, n).items():
        got = cpu.sort_u32(keys, CFG)
        np.testing.assert_array_equal(got, np.sort(keys), err_msg=name)


@pytest.mark.parametrize("n", [1, 5, 512, 4096, 100_000])
def test_native_oracle_matches_npsort(rng, n):
    for name, keys in _distributions(rng, n).items():
        got = native.sort_u32(keys, CFG)
        np.testing.assert_array_equal(got, np.sort(keys), err_msg=name)


def test_native_matches_numpy_per_pass(rng):
    keys = rng.integers(0, 2**32, 10_000, dtype=np.uint32)
    for shift in (0, 8, 16, 24):
        np_out, _ = cpu.radix_pass(keys, shift, CFG)
        cc_out, cc_counts = native.radix_pass(keys, shift, CFG)
        np.testing.assert_array_equal(np_out, cc_out)
        digits = cpu.extract_digit(keys, shift, CFG.digit_mask)
        np.testing.assert_array_equal(
            cc_counts, cpu.tile_histograms(digits, CFG.tile_elems, CFG.radix))


def test_pairs_stability(rng):
    """Duplicate keys must keep payloads in original order (stable sort) —
    the property RadX never tests (unique-permutation fixture only,
    src/test/sort.cpp:348-350)."""
    n = 50_000
    keys = rng.integers(0, 64, n, dtype=np.uint32)  # heavy duplication
    payload = np.arange(n, dtype=np.uint32)
    for impl in (cpu.sort_pairs, native.sort_pairs):
        k, p = impl(keys, payload, CFG)
        np.testing.assert_array_equal(k, np.sort(keys))
        # stability: payload (= original index) increasing within equal keys
        np.testing.assert_array_equal(p, np.argsort(keys, kind="stable"))
        # payload rides with its key
        np.testing.assert_array_equal(keys[p], k)


def test_sort_1m_exact_match(rng):
    """BASELINE config 1 gate at oracle level: 1M random uint32."""
    keys = rng.integers(0, 2**32, 1 << 20, dtype=np.uint32)
    cfg = SortConfig()  # default tiles
    np.testing.assert_array_equal(native.sort_u32(keys, cfg), np.sort(keys))
    np.testing.assert_array_equal(cpu.sort_u32(keys, cfg), np.sort(keys))


@pytest.mark.parametrize("bits", [2, 4, 8, 16])
def test_bits_per_pass_variants(rng, bits):
    """Digit width is a runtime parameter, not a compile fork (SURVEY §5)."""
    keys = rng.integers(0, 2**32, 20_000, dtype=np.uint32)
    cfg = SortConfig(bits_per_pass=bits, tile_rows=4)
    np.testing.assert_array_equal(cpu.sort_u32(keys, cfg), np.sort(keys))
    np.testing.assert_array_equal(native.sort_u32(keys, cfg), np.sort(keys))
