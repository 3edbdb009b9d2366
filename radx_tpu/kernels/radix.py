"""Radix building blocks: per-tile digit histograms and hierarchical scans.

These are the TPU-native counterparts of the reference's first two pipeline
stages — counting.comp (per-workgroup digit histogram,
RadX2-SM7-DEV/counting.comp:50-73) and partition.comp (two-phase
hierarchical prefix scan, partition.comp:38-72).  RadX's subgroup-partition
ballot trick (`sgrprt`, ballotlib.glsl:113) becomes **nibble-factored
one-hot matmuls on the MXU**: a 256-bin histogram is the 16x16 outer
contraction of hi-nibble and lo-nibble one-hots — 32 VPU compares per key
and a (16,1024)x(1024,16) matmul, instead of 256 VPU compares.

Callers: the oracle-parity tests (tests/test_radix_kernels.py) and the
measurement probes (tools/probe_radix_prims.py) — the same role
counting/partition play for the reference's scattering stage.

The digit shift is a scalar-prefetch runtime input, so ONE compiled kernel
serves all four 8-bit passes (the reference forks per digit via push
constants, radx_implement.inl:429-430 — same idea, but ours avoids
recompiles entirely).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radx_tpu.config import LANES, cdiv


def _hist_kernel(tile_rows, scalar_ref, x_ref, out_ref):
    """Per-tile 256-bin histogram of 8-bit digits at shift scalar_ref[0].

    scalar_ref[1] = total element count n (for masking the last tile).
    """
    shift = scalar_ref[0]
    n = scalar_ref[1]
    t = pl.program_id(0)
    x = x_ref[0]  # (tile_rows, 128) i32 (bit pattern of the uint32 keys)
    e = tile_rows * LANES
    digits = jax.lax.shift_right_logical(x, shift) & 0xFF

    # Nibbles along SUBLANES, elements along lanes: Mosaic rejects the
    # (rows,128)->(e,1) relayout on HW, so each row's one-hots compare the
    # (1,128) row against a column iota and the dot contracts over lanes.
    hi = digits >> 4
    lo = digits & 15
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    nib = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
    one, zero = jnp.float32(1), jnp.float32(0)
    hist16 = jnp.zeros((16, 16), jnp.float32)
    for r in range(tile_rows):
        valid = (t * e + r * LANES + lane) < n
        eq_hi = jnp.where(valid & (hi[r : r + 1, :] == nib), one, zero)
        eq_lo = jnp.where(lo[r : r + 1, :] == nib, one, zero)
        hist16 += jax.lax.dot_general(
            eq_hi,
            eq_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (16, 16): [hi, lo]
    out_ref[0] = hist16.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def tile_histograms(keys, shift, tile_rows: int = 8, interpret: bool = False):
    """counts[t, d] = occurrences of digit d = (key >> shift) & 0xFF in tile t.

    keys: (n,) uint32; shift: i32 scalar (runtime).  Returns (ntiles, 256)
    int32.  Mirrors oracle.cpu.tile_histograms / counting.comp.
    """
    n = keys.shape[0]
    e = tile_rows * LANES
    ntiles = cdiv(n, e)
    total = ntiles * e
    x = jnp.zeros((total,), jnp.uint32).at[:n].set(keys)
    x = jax.lax.bitcast_convert_type(x, jnp.int32).reshape(ntiles, tile_rows, LANES)
    scalars = jnp.asarray([shift, n], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, tile_rows, LANES), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 16, 16), lambda i, s: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_hist_kernel, tile_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, 16, 16), jnp.int32),
        interpret=interpret,
    )(scalars, x)
    return out.reshape(ntiles, 256)


def scan_bases(counts):
    """partition.comp's two-phase scan: global base offset per (tile, digit).

    base[t, d] = (# keys with digit < d anywhere)
               + (# keys with digit == d in tiles < t)
    (RadX2-SM7-DEV/partition.comp:38-72; identical to oracle.cpu.scan_bases.)
    """
    counts = counts.astype(jnp.int32)
    within = jnp.cumsum(counts, axis=0) - counts
    totals = counts.sum(axis=0)
    digit_base = jnp.cumsum(totals) - totals
    return digit_base[None, :] + within
