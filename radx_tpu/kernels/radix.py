"""Radix building blocks: per-tile digit histograms and hierarchical scans.

These are the TPU-native counterparts of the reference's first two pipeline
stages — counting.comp (per-workgroup digit histogram,
RadX2-SM7-DEV/counting.comp:50-73) and partition.comp (two-phase
hierarchical prefix scan, partition.comp:38-72).  RadX's subgroup-partition
ballot trick (`sgrprt`, ballotlib.glsl:113) becomes **nibble-factored
one-hot matmuls on the MXU**: a 256-bin histogram is the 16x16 outer
contraction of hi-nibble and lo-nibble one-hots — 32 VPU compares per key
and a (16,1024)x(1024,16) matmul, instead of 256 VPU compares.

Callers: the radix distribution sort (kernels/radix_sort.py), where
`chunk_histograms` + `scan_bases` drive the skew-aware splitter selection
(the counting → partition stages feeding the scatter, exactly the role
counting/partition play for the reference's scattering stage), plus the
oracle-parity tests (tests/test_radix_kernels.py) and the measurement
probes (tools/probe_radix_prims.py).

The digit shift is a scalar-prefetch runtime input, so ONE compiled kernel
serves all four 8-bit passes (the reference forks per digit via push
constants, radx_implement.inl:429-430 — same idea, but ours avoids
recompiles entirely).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


def _chunk_hist_kernel(c_rows, scalar_ref, x_ref, out_ref):
    """Per-chunk 256-bin histogram of the top byte of (x ^ bias).

    scalar_ref: [shift, n, bias].  Row-major over the chunk; a fori_loop
    over 8-row groups keeps the program size bounded (tile_histograms
    unrolls its rows — fine at tile_rows<=16, hopeless at c_rows=2048).
    """
    shift = scalar_ref[0]
    n = scalar_ref[1]
    bias = scalar_ref[2]
    t = pl.program_id(0)
    e = c_rows * LANES
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    nib = jax.lax.broadcasted_iota(jnp.int32, (16, LANES), 0)
    one, zero = jnp.float32(1), jnp.float32(0)

    def body(g, hist16):
        x = x_ref[0, pl.ds(g * 8, 8)]  # (8, 128) i32
        digits = jax.lax.shift_right_logical(x ^ bias, shift) & 0xFF
        hi = digits >> 4
        lo = digits & 15
        valid = (t * e + (g * 8 + rowi) * LANES + lane) < n
        for r in range(8):
            eq_hi = jnp.where(
                valid[r : r + 1, :] & (hi[r : r + 1, :] == nib), one, zero
            )
            eq_lo = jnp.where(lo[r : r + 1, :] == nib, one, zero)
            hist16 += jax.lax.dot_general(
                eq_hi,
                eq_lo,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return hist16

    hist16 = jax.lax.fori_loop(
        0, c_rows // 8, body, jnp.zeros((16, 16), jnp.float32)
    )
    out_ref[0] = hist16.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("c_rows", "bias", "interpret")
)
def chunk_histograms(x, shift, c_rows: int, n=None, bias: int = 0,
                     interpret: bool = False):
    """counts[c, d] = occurrences of digit d = ((x ^ bias) >> shift) & 0xFF
    in chunk c of c_rows*128 row-major elements.

    The production counting stage (counting.comp:50-73) for the radix
    distribution sort: x is the engine's sign-biased i32 plane, flattened;
    bias=0x80000000 recovers original-uint32 digit order (i32 order of the
    biased plane == u32 order of ``bits ^ 0x80000000``).  c_rows must be a
    multiple of 8; x length a multiple of c_rows*128.  n masks the valid
    prefix (defaults to all).  Returns (n_chunks, 256) int32.
    """
    total = x.shape[0]
    e = c_rows * LANES
    assert total % e == 0 and c_rows % 8 == 0, (total, c_rows)
    n_chunks = total // e
    if n is None:
        n = total
    x3 = x.astype(jnp.int32).reshape(n_chunks, c_rows, LANES)
    scalars = jnp.stack(
        [
            jnp.asarray(shift, jnp.int32),
            jnp.asarray(n, jnp.int32),
            jnp.asarray(np.int32(np.uint32(bias))),
        ]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, 16), lambda i, s: (i, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_chunk_hist_kernel, c_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, 16, 16), jnp.int32),
        interpret=interpret,
    )(scalars, x3)
    return out.reshape(n_chunks, 256)


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
