"""Pallas radix building blocks vs the NumPy oracle (phase-level parity —
the per-phase comparability SURVEY §7 milestone 0 demands)."""

import numpy as np
import pytest

from radx_tpu.config import SortConfig
from radx_tpu.kernels import radix
from radx_tpu.oracle import cpu


@pytest.mark.parametrize("shift", [0, 8, 16, 24])
@pytest.mark.parametrize("n", [1024, 5000, 100_000])
def test_tile_histograms_match_oracle(rng, shift, n):
    keys = rng.integers(0, 2**32, n, dtype=np.uint32)
    got = np.asarray(radix.tile_histograms(keys, shift, tile_rows=8, interpret=True))
    digits = cpu.extract_digit(keys, shift, 0xFF)
    want = cpu.tile_histograms(digits, 8 * 128, 256)
    np.testing.assert_array_equal(got, want)


def test_scan_bases_match_oracle(rng):
    keys = rng.integers(0, 2**32, 50_000, dtype=np.uint32)
    digits = cpu.extract_digit(keys, 8, 0xFF)
    counts = cpu.tile_histograms(digits, 1024, 256)
    got = np.asarray(radix.scan_bases(counts.astype(np.int32)))
    np.testing.assert_array_equal(got, cpu.scan_bases(counts))


def test_histogram_shift_is_runtime(rng):
    """One compiled kernel serves all shifts (scalar prefetch)."""
    keys = rng.integers(0, 2**32, 10_000, dtype=np.uint32)
    for shift in (0, 8, 16, 24):
        got = np.asarray(
            radix.tile_histograms(keys, shift, tile_rows=8, interpret=True)
        ).sum(axis=0)
        want = np.bincount((keys >> shift) & 0xFF, minlength=256)
        np.testing.assert_array_equal(got, want)
