"""Inner join on uint32 keys (the BASELINE's "hash join", TPU-native form).

Random-probe hash tables serialize on TPU; the vectorizable equivalent with
the same semantics is a sort-based join: sort the build side once with the
Pallas pipeline, then binary-search every probe key against the sorted run
(jnp.searchsorted — log2(n) vectorized gather rounds, no data-dependent
control flow).  This is the radix-partitioned build/probe of BASELINE
config 4 re-expressed for a machine whose fast primitive is sorting.

Duplicate build keys are supported via run expansion up to a static
`max_matches` per probe key (XLA needs static shapes; the result is padded
and accompanied by a validity count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radx_tpu.config import SortConfig, tuned
from radx_tpu.kernels import segscan
from radx_tpu.ops import sort as sort_ops


@functools.partial(jax.jit, static_argnames=("cfg", "how"))
def _join_merge_jit(build_keys, build_vals, probe_keys, probe_vals, missing,
                    cfg, how="inner"):
    """Gather-free single/left-match join core: tagged union sort +
    segmented forward-fill.  Returns full tagged-sorted arrays (see
    join_merge).  how="left" keeps every probe row, substituting `missing`
    (a scalar of build_vals' dtype) where no build key matched."""
    nb, np_ = build_keys.shape[0], probe_vals.shape[0]
    n = nb + np_
    keys = jnp.concatenate([build_keys, probe_keys])
    # tiebreak: build rows (0..nb-1) sort before probe rows (2^30 + i)
    tie = jnp.concatenate(
        [
            jax.lax.iota(jnp.int32, nb),
            jax.lax.iota(jnp.int32, np_) + jnp.int32(1 << 30),
        ]
    )
    bvals = jnp.concatenate(
        [build_vals, jnp.zeros((np_,), build_vals.dtype)]
    )
    pvals = jnp.concatenate(
        [jnp.zeros((nb,), probe_vals.dtype), probe_vals]
    )

    from radx_tpu.config import LANES, resolve_interpret
    from radx_tpu.kernels import bitonic

    total = 1 << (max(n, 1024) - 1).bit_length()

    def plane(x, fill):
        return (
            jnp.full((total,), fill, jnp.int32)
            .at[:n]
            .set(x)
            .reshape(total // LANES, LANES)
        )

    planes = [
        plane((keys ^ jnp.uint32(0x80000000)).astype(jnp.int32), 0x7FFFFFFF),
        plane(tie, 0x7FFFFFFF),
        plane(jax.lax.bitcast_convert_type(bvals, jnp.int32), 0),
        plane(jax.lax.bitcast_convert_type(pvals, jnp.int32), 0),
    ]
    outs = bitonic.sort_planes(
        planes, cfg.stable_chunk_rows, num_cmp=2,
        interpret=resolve_interpret(cfg),
    )
    skey = outs[0].reshape(-1)[:n]
    stie = outs[1].reshape(-1)[:n]
    sbval = outs[2].reshape(-1)[:n]
    spval = outs[3].reshape(-1)[:n]
    is_build = stie < (1 << 30)

    # Segmented forward-fill: carry the last build value through each
    # equal-key run (runs are contiguous after the sort) — ONE Pallas HBM
    # pass (kernels/segscan.py op="fill"); the r1 Hillis-Steele doubling
    # burned log2(n) full-array passes + concatenate temporaries.
    filled, has = segscan.segscan_flat(
        skey, sbval, "fill", cfg.stable_chunk_rows,
        resolve_interpret(cfg), has=is_build,
    )
    if how == "left":
        keep = (~is_build).astype(jnp.int32)
        filled = jnp.where(has, filled, missing)
    else:
        keep = (has & ~is_build).astype(jnp.int32)
    skey_u32 = jax.lax.bitcast_convert_type(skey, jnp.uint32) ^ jnp.uint32(
        0x80000000
    )
    return skey_u32, filled, spval, keep


def join_merge(build_keys, build_vals, probe_keys, probe_vals,
               cfg: SortConfig | None = None, how: str = "inner",
               missing=None):
    """Scalable inner or left join (single match per probe row).

    how="left" keeps EVERY probe row (SQL LEFT JOIN): unmatched rows carry
    `missing` as the build value (default: zero of build_vals' dtype).
    Right joins are the same call with the sides swapped.

    Tagged union sort (Pallas pipeline) + one associative forward-fill scan
    + pipeline compaction — no searchsorted, no gather, no scatter, so it
    scales to the BASELINE 100M x 100M config where the XLA searchsorted
    lowering falls over (observed TPU worker crash at 2^26).  Duplicate
    build keys resolve to the *last* build row.

    Returns (keys, build_vals, probe_vals, count): compacted matched rows
    (first `count` entries; order is key-sorted, not probe order).

    Keys may be uint32 / int32 / float32 (both sides the same dtype):
    non-uint32 keys run through the order-preserving encodings of
    ops/sort._encode_keys; float32 keys match by BIT PATTERN (-0.0 and
    +0.0 are distinct; nan == nan for the same payload bits).
    """
    cfg = cfg or tuned()
    build_keys = jnp.asarray(build_keys)
    probe_keys = jnp.asarray(probe_keys)
    build_vals = jnp.asarray(build_vals)
    probe_vals = jnp.asarray(probe_vals)
    if build_keys.dtype != probe_keys.dtype:
        raise TypeError("join key dtypes must match on both sides")
    key_dtype = build_keys.dtype
    enc_b = sort_ops._encode_keys(build_keys)  # validates the dtype
    enc_p = sort_ops._encode_keys(probe_keys)
    if build_keys.shape[0] >= 1 << 30 or probe_keys.shape[0] >= 1 << 30:
        raise ValueError("join_merge supports up to 2^30-1 rows per side")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    missing = (
        jnp.zeros((), build_vals.dtype)
        if missing is None
        else jnp.asarray(missing, build_vals.dtype)
    )
    skey, bval, pval, keep = _join_merge_jit(
        enc_b, build_vals, enc_p, probe_vals, missing, cfg, how
    )
    from radx_tpu.ops.filter import filter_columns

    (k_out, b_out, p_out), count = filter_columns(
        keep, [skey, bval, pval], cfg
    )
    return (
        sort_ops._decode_keys(k_out, key_dtype),
        jax.lax.bitcast_convert_type(b_out, build_vals.dtype),
        jax.lax.bitcast_convert_type(p_out, probe_vals.dtype),
        count,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_matches"))
def _join_multi_jit(
    build_keys, build_vals, probe_keys, probe_vals, cfg, max_matches
):
    """Gather-free bounded multi-match join core.

    Tagged union sort (as _join_merge_jit), then per-run build *ranks* via a
    segmented prefix count, then max_matches forward-fill planes — plane j
    carries the rank-j build value through its run.  Probe rows read all
    planes; no searchsorted, no gather, no scatter anywhere.
    """
    nb, np_ = build_keys.shape[0], probe_vals.shape[0]
    n = nb + np_
    M = max_matches
    keys = jnp.concatenate([build_keys, probe_keys])
    tie = jnp.concatenate(
        [
            jax.lax.iota(jnp.int32, nb),
            jax.lax.iota(jnp.int32, np_) + jnp.int32(1 << 30),
        ]
    )
    bvals = jnp.concatenate([build_vals, jnp.zeros((np_,), build_vals.dtype)])
    pvals = jnp.concatenate([jnp.zeros((nb,), probe_vals.dtype), probe_vals])

    from radx_tpu.config import LANES, resolve_interpret
    from radx_tpu.kernels import bitonic

    total = 1 << (max(n, 1024) - 1).bit_length()

    def plane(x, fill):
        return (
            jnp.full((total,), fill, jnp.int32)
            .at[:n]
            .set(x)
            .reshape(total // LANES, LANES)
        )

    planes = [
        plane((keys ^ jnp.uint32(0x80000000)).astype(jnp.int32), 0x7FFFFFFF),
        plane(tie, 0x7FFFFFFF),
        plane(jax.lax.bitcast_convert_type(bvals, jnp.int32), 0),
        plane(jax.lax.bitcast_convert_type(pvals, jnp.int32), 0),
    ]
    outs = bitonic.sort_planes(
        planes, cfg.stable_chunk_rows, num_cmp=2,
        interpret=resolve_interpret(cfg),
    )
    skey = outs[0].reshape(-1)[:n]
    stie = outs[1].reshape(-1)[:n]
    sbval = outs[2].reshape(-1)[:n]
    spval = outs[3].reshape(-1)[:n]
    is_build = stie < (1 << 30)

    # Build rank within the run (inclusive segmented count of build rows,
    # one Pallas pass).  Build rows sort before probe rows in a run
    # (tiebreak construction), so at a probe row the exclusive count
    # equals the run's build total.
    interp = resolve_interpret(cfg)
    cnt = segscan.segscan_flat(
        skey, is_build.astype(jnp.int32), "sum",
        cfg.stable_chunk_rows, interp,
    )
    rank = cnt - is_build.astype(jnp.int32)  # exclusive

    # Forward-fill plane j with the rank-j build value through each run —
    # ALL M planes ride ONE segscan pass (2(M+1) planes in VMEM) instead of
    # M sequential full-HBM passes (VERDICT r2 weak #4).
    hjs = [is_build & (rank == j) for j in range(M)]
    fjs = [
        jnp.where(hj, sbval, jnp.zeros((), sbval.dtype)) for hj in hjs
    ]
    fills, hass = segscan.segscan_flat(
        skey, fjs, "fill", cfg.stable_chunk_rows, interp, has=hjs
    )

    is_probe = (~is_build) & (stie != 0x7FFFFFFF)
    valid = jnp.stack(
        [is_probe & (j < rank) & hass[j] for j in range(M)]
    )  # (M, n)
    skey_u32 = jax.lax.bitcast_convert_type(skey, jnp.uint32) ^ jnp.uint32(
        0x80000000
    )
    truncated = jnp.any(is_build & (rank >= M))
    return skey_u32, jnp.stack(fills), spval, valid, truncated


def join_merge_multi(
    build_keys,
    build_vals,
    probe_keys,
    probe_vals,
    max_matches: int = 4,
    cfg: SortConfig | None = None,
):
    """Scalable inner join with bounded duplicate build keys.

    Same gather/scatter/searchsorted-free core as join_merge (tagged union
    sort + segmented scans), extended to up to `max_matches` build matches
    per probe row — closing the semantic gap join_merge's single-match
    contract leaves at BASELINE config-4 scale.

    Returns (keys, build_vals, probe_vals, valid, truncated):
      keys/probe_vals: (n,) key-sorted tagged union rows (n = nb + np);
      build_vals: (max_matches, n) — row j holds the rank-j build match;
      valid: (max_matches, n) bool — valid[j, i] marks a real (probe i,
        build rank j) output row;
      truncated: True if some key has more than max_matches build rows
        (matches beyond the bound are dropped; re-run with a larger bound).
    """
    cfg = cfg or tuned()
    build_keys = jnp.asarray(build_keys)
    probe_keys = jnp.asarray(probe_keys)
    build_vals = jnp.asarray(build_vals)
    probe_vals = jnp.asarray(probe_vals)
    if build_keys.dtype != probe_keys.dtype:
        raise TypeError("join key dtypes must match on both sides")
    key_dtype = build_keys.dtype
    enc_b = sort_ops._encode_keys(build_keys)  # uint32/int32/float32
    enc_p = sort_ops._encode_keys(probe_keys)
    if build_keys.shape[0] >= 1 << 30 or probe_keys.shape[0] >= 1 << 30:
        raise ValueError("join supports up to 2^30-1 rows per side")
    if max_matches < 1:
        raise ValueError("max_matches must be >= 1")
    k, bv, pv, valid, trunc = _join_multi_jit(
        enc_b, build_vals, enc_p, probe_vals, cfg, max_matches
    )
    return (
        sort_ops._decode_keys(k, key_dtype),
        jax.lax.bitcast_convert_type(bv, build_vals.dtype),
        jax.lax.bitcast_convert_type(pv, probe_vals.dtype),
        valid,
        trunc,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_matches"))
def _join_jit(build_keys, build_vals, probe_keys, probe_vals, cfg, max_matches):
    nb = build_keys.shape[0]
    sk, sv = sort_ops._sort_stable_jit(build_keys, build_vals, cfg, nb, True)
    sv = jax.lax.bitcast_convert_type(sv, build_vals.dtype)

    lo = jnp.searchsorted(sk, probe_keys, side="left")
    hi = jnp.searchsorted(sk, probe_keys, side="right")
    counts = (hi - lo).astype(jnp.int32)

    # expand up to max_matches per probe row
    j = jax.lax.broadcasted_iota(jnp.int32, (probe_keys.shape[0], max_matches), 1)
    idx = jnp.clip(lo[:, None] + j, 0, nb - 1)
    valid = j < jnp.minimum(counts, max_matches)[:, None]
    out_bk = jnp.where(valid, sk[idx], jnp.uint32(0))
    out_bv = jnp.where(valid, sv[idx], jnp.zeros((), sv.dtype))
    out_pv = jnp.where(valid, probe_vals[:, None], jnp.zeros((), probe_vals.dtype))
    truncated = jnp.any(counts > max_matches)
    return out_bk, out_bv, out_pv, valid, truncated


def join_inner(
    build_keys,
    build_vals,
    probe_keys,
    probe_vals,
    max_matches: int = 4,
    cfg: SortConfig | None = None,
):
    """Inner join: rows (probe i, build j) with probe_keys[i]==build_keys[j].

    Returns (key, build_val, probe_val, valid_mask, truncated):
    shape (n_probe, max_matches) padded tables; `valid_mask` marks real
    matches; `truncated` is True if any probe key had more than max_matches
    build matches (re-run with a larger max_matches).
    """
    cfg = cfg or tuned()
    build_keys = jnp.asarray(build_keys)
    probe_keys = jnp.asarray(probe_keys)
    build_vals = jnp.asarray(build_vals)
    probe_vals = jnp.asarray(probe_vals)
    if build_keys.dtype != probe_keys.dtype:
        raise TypeError("join key dtypes must match on both sides")
    key_dtype = build_keys.dtype
    enc_b = sort_ops._encode_keys(build_keys)  # uint32/int32/float32
    enc_p = sort_ops._encode_keys(probe_keys)
    if build_vals.shape != build_keys.shape:
        raise ValueError("build_vals must match build_keys")
    if probe_vals.shape != probe_keys.shape:
        raise ValueError("probe_vals must match probe_keys")
    if max_matches < 1:
        raise ValueError("max_matches must be >= 1")
    out_bk, out_bv, out_pv, valid, trunc = _join_jit(
        enc_b, build_vals, enc_p, probe_vals, cfg, max_matches
    )
    return (
        sort_ops._decode_keys(out_bk, key_dtype),
        out_bv,
        out_pv,
        valid,
        trunc,
    )
