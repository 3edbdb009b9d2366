"""Dense MXU hash-aggregate — GROUP BY as one-hot matmul contractions.

The reference's counting.comp builds a 256-bin digit histogram per
workgroup by subgroup-partition ballots (RadX2-SM7-DEV/counting.comp:50-73).
This kernel generalizes that machinery from *counting* keys to *summing
values per key*: for a key space bounded by `bins` (pow2 <= 2^16), factor
each key into (hi, lo) = (k >> 7, k & 127) and compute

    S[hi, lo] = sum_t  onehot_hi[t, hi] * onehot_lo[t, lo] * value[t]

as MXU dot_generals, one per value byte (bf16 mantissa holds integers
<= 256 exactly under Mosaic's silent f32->bf16 matmul demotion; per-tile
f32 accumulation stays exact below 2^24, and tiles fold into an i32
accumulator across the sequential grid).  No sort, no scatter: the
bandwidth-bound sort-based groupby becomes an MXU-bound streaming pass
whose cost is `bins` MACs per element per plane — tiny key spaces
(categories, buckets, enum codes) aggregate at multiple G rows/s.

Layout note (measured on v5e): Mosaic rejects the (R,128)->(R*128,1)
in-kernel reshape, and any HBM array with a trailing dim < 128 pads it to
128 lanes (16-128x blowup).  So the kernel keeps the natural (R,128)
blocks and puts BINS ALONG SUBLANES instead: per row r, one-hots are
(bh,128)/(bl,128) built by comparing the (1,128) row against a column
iota, and the contraction runs over the 128 lanes — no relayout anywhere.

`dense_sums` covers sum + count (matmul contractions).  `dense_extrema`
covers min/max, which have no matmul form: the accumulator keeps bins along
sublanes and elements along lanes like the sums kernel, but folds with a
compare-select instead of a dot — uint32/float32 orderings are handled by
the caller mapping values into order-isomorphic int32 (signed compare-select
legalizes on hardware; unsigned `minui/maxui` does not — see NOTES.md).
uint32 sums wrap mod 2^32 like the sort-based op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radx_tpu.config import LANES, cdiv


def _dense_agg_kernel(tile_rows, bh, bl, scal_ref, k_ref, v_ref, acc_ref):
    """Accumulate per-(hi,lo)-bin byte-plane sums and counts for one tile.

    acc_ref: (5, bh, bl) i32 output revisited by every (sequential) grid
    step — planes 0..3 are value-byte sums (byte p of every value whose key
    lands in the bin), plane 4 is the key count.  scal_ref[0] = n.
    """
    n = scal_ref[0]
    t = pl.program_id(0)
    k = k_ref[0]  # (tile_rows, 128) i32 key bit patterns
    v = v_ref[0]  # (tile_rows, 128) i32 value bit patterns
    e = tile_rows * LANES

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    hi = jax.lax.shift_right_logical(k, 7)
    lo = k & (bl - 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    hi_bins = jax.lax.broadcasted_iota(jnp.int32, (bh, LANES), 0)
    lo_bins = jax.lax.broadcasted_iota(jnp.int32, (bl, LANES), 0)
    one = jnp.float32(1)
    zero = jnp.float32(0)

    # Value byte planes for the whole tile, hoisted out of the row loop.
    bytes_f32 = [
        (jax.lax.shift_right_logical(v, 8 * p) & 0xFF).astype(jnp.float32)
        for p in range(4)
    ]

    sums = jnp.zeros((5 * bh, bl), jnp.float32)
    for r in range(tile_rows):
        valid = (t * e + r * LANES + lane) < n  # (1, 128)
        # bins along sublanes, elements along lanes: no relayout needed.
        eq_hi = jnp.where(valid & (hi[r : r + 1, :] == hi_bins), one, zero)
        eq_lo = jnp.where(lo[r : r + 1, :] == lo_bins, one, zero)
        # One dot per row: the 4 byte-weighted hi one-hots and the count
        # one-hot stack along sublanes into (5*bh, 128), so the MXU sees
        # M=5*bh instead of five M=bh ops.  f32 accumulation is exact:
        # every product is an integer <= 255 (bf16-exact) and
        # tile_rows*128*255 < 2^24.
        w_hi = jnp.concatenate(
            [eq_hi * b[r : r + 1, :] for b in bytes_f32] + [eq_hi], axis=0
        )
        sums += jax.lax.dot_general(
            w_hi,
            eq_lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_ref[...] += sums.reshape(5, bh, bl).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("bins", "tile_rows", "interpret")
)
def dense_sums(
    keys,
    values,
    bins: int = 65536,
    tile_rows: int = 32,
    interpret: bool = False,
    n_valid=None,
):
    """(sums, counts) over the dense [0, bins) key space.

    keys: (n,) uint32, every key must be < bins (callers check — see
    ops/groupby.groupby_dense); values: (n,) uint32/int32 bit patterns;
    bins: power of two in [128, 65536]; tile_rows <= 512 (f32 exactness).
    n_valid: optional traced count — rows past it are ignored (the
    LazyTable valid-prefix contract); defaults to all n rows.
    Returns (sums[bins] uint32 — wrapping, counts[bins] int32).
    """
    assert 128 <= bins <= 65536 and bins & (bins - 1) == 0, bins
    assert tile_rows <= 512, "255 * tile_rows * 128 must stay below 2^24"
    bl = 128
    bh = bins // bl
    n = keys.shape[0]
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    e = tile_rows * LANES
    ntiles = cdiv(n, e)
    total = ntiles * e

    def pad2d(x):
        flat = jnp.zeros((total,), jnp.uint32).at[:n].set(
            jax.lax.bitcast_convert_type(x, jnp.uint32)
        )
        return jax.lax.bitcast_convert_type(flat, jnp.int32).reshape(
            ntiles, tile_rows, LANES
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, tile_rows, LANES), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, tile_rows, LANES), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((5, bh, bl), lambda i, s: (0, 0, 0)),
    )
    acc = pl.pallas_call(
        functools.partial(_dense_agg_kernel, tile_rows, bh, bl),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((5, bh, bl), jnp.int32),
        interpret=interpret,
    )(nv.reshape(1), pad2d(keys), pad2d(values))

    b = [
        jax.lax.bitcast_convert_type(acc[p], jnp.uint32).reshape(-1)
        for p in range(4)
    ]
    sums = b[0] + (b[1] << 8) + (b[2] << 16) + (b[3] << 24)  # wraps mod 2^32
    counts = acc[4].reshape(-1)
    return sums, counts


def _dense_extrema_kernel(
    tile_rows, bins, is_min, ident, scal_ref, k_ref, v_ref, acc_ref
):
    """Fold one tile into per-bin extrema + counts.

    acc_ref: (2, bins, 128) i32 revisited by every sequential grid step —
    plane 0 holds the running per-(bin, lane) extremum in order-isomorphic
    i32 space, plane 1 the per-(bin, lane) hit count.  The caller folds the
    128 lanes (min/max resp. sum) after the pass.  Signed compare-select
    only (uint32 minui/maxui fails Mosaic legalization on HW — NOTES.md).
    """
    n = scal_ref[0]
    t = pl.program_id(0)
    k = k_ref[0]  # (tile_rows, 128) i32 keys (all < bins)
    v = v_ref[0]  # (tile_rows, 128) i32 order-isomorphic values
    e = tile_rows * LANES

    @pl.when(t == 0)
    def _():
        acc_ref[0] = jnp.full((bins, LANES), ident, jnp.int32)
        acc_ref[1] = jnp.zeros((bins, LANES), jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    bin_iota = jax.lax.broadcasted_iota(jnp.int32, (bins, LANES), 0)
    ext = acc_ref[0]
    cnt = acc_ref[1]
    for r in range(tile_rows):
        valid = (t * e + r * LANES + lane) < n  # (1, 128)
        hit = valid & (k[r : r + 1, :] == bin_iota)  # (bins, 128)
        cand = jnp.where(hit, v[r : r + 1, :], jnp.int32(ident))
        if is_min:
            ext = jnp.where(cand < ext, cand, ext)
        else:
            ext = jnp.where(cand > ext, cand, ext)
        cnt = cnt + hit.astype(jnp.int32)
    acc_ref[0] = ext
    acc_ref[1] = cnt


@functools.partial(
    jax.jit, static_argnames=("bins", "is_min", "tile_rows", "interpret")
)
def dense_extrema(
    keys,
    ovals,
    bins: int = 1024,
    is_min: bool = True,
    tile_rows: int = 32,
    interpret: bool = False,
    n_valid=None,
):
    """(extrema, counts) over the dense [0, bins) key space.

    keys: (n,) uint32 with every key < bins (callers check); ovals: (n,)
    int32 whose SIGNED order matches the caller's value order (uint32 →
    xor sign bit, float32 → sign-magnitude flip; see ops/groupby).
    bins: power of two in [128, 8192] (the (bins,128) i32 accumulator must
    stay comfortably inside VMEM).  n_valid: optional traced count — rows
    past it are ignored; defaults to all n rows.  Returns (extrema[bins]
    int32 — the identity where the bin is empty, counts[bins] int32).
    """
    assert 128 <= bins <= 8192 and bins & (bins - 1) == 0, bins
    ident = (1 << 31) - 1 if is_min else -(1 << 31)
    n = keys.shape[0]
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    e = tile_rows * LANES
    ntiles = cdiv(n, e)
    total = ntiles * e

    def pad2d(x):
        flat = jnp.zeros((total,), jnp.uint32).at[:n].set(
            jax.lax.bitcast_convert_type(x, jnp.uint32)
        )
        return jax.lax.bitcast_convert_type(flat, jnp.int32).reshape(
            ntiles, tile_rows, LANES
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, tile_rows, LANES), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, tile_rows, LANES), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((2, bins, LANES), lambda i, s: (0, 0, 0)),
    )
    # the (2, bins, 128) accumulator + compare temporaries exceed the 16 MB
    # default scoped-vmem at bins = 8192 — raise the cap (v5e has 128 MB)
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    acc = pl.pallas_call(
        functools.partial(
            _dense_extrema_kernel, tile_rows, bins, is_min, ident
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, bins, LANES), jnp.int32),
        interpret=interpret,
        compiler_params=params,
    )(nv.reshape(1), pad2d(keys), pad2d(ovals))

    fold = jnp.min if is_min else jnp.max
    return fold(acc[0], axis=1), jnp.sum(acc[1], axis=1)
