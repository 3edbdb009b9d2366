"""Distributed sample-splitter sort over a device mesh (BASELINE config 5).

Net-new capability vs the reference (which is strictly single-GPU,
SURVEY §2e).  Round-2 redesign: every step is scatter/gather-free on the
device — the primitives are the bitonic Pallas pipeline, contiguous
dynamic slices, comparisons/reductions, and `ppermute`/`all_gather`
collectives.  Algorithm per shard:

  1. **local sort first** (the big compute — bitonic Pallas pipeline);
  2. **sample splitters**: regular samples from the *sorted* shard are
     `all_gather`ed (tiny) and sorted; D-1 splitter *keys* are picked at
     regular ranks.  Classic sample-sort balance bound: each device
     receives at most N/D + N/oversample keys under *any* distribution —
     strictly stronger than the round-1 top-16-bit binning (which
     collapsed when keys shared their top bits; the reference never
     handles skew at all, it uses fixed blocks);
  3. run boundaries in the sorted shard = D-1 "rank of splitter"
     reductions; packing into fixed slots = D contiguous dynamic slices
     (no giant gather);
  4. **exchange as D-1 `ppermute` waves** (ICI neighbours), each wave
     overlapped with the pairwise bitonic merges of runs that have
     already arrived (`overlap=True`), or one `all_to_all`-equivalent
     wave loop followed by a single multi-way merge (`overlap=False`);
  5. the received runs are merged — **not re-sorted** — by the
     alternating-direction run merge (kernels/bitonic.merge_sorted_runs):
     O(L·log D) work instead of the round-1 full O(L log²L) sort of the
     padded recv buffer.  Sources pre-flip the runs bound for odd arrival
     positions so no materialized flip is needed at the destination, and
     the parent merges of the tree emit alternating directions the same
     way.

  The concatenation of device 0's valid prefix, device 1's, ... is the
  globally sorted sequence.

Capacity: slots are static (XLA requires static shapes), the pow2 round-up
of `capacity` × ceil(N/D²) keys per (src, dst) pair.  Overflow cannot be
raised from inside jit, so the sort also returns a boolean overflow flag
computed with a global max — callers must check it (tested in
tests/test_dist_sort.py).

Payloads ride along as extra planes through the local sort, the slices,
the waves, and the merges — the distributed analogue of the reference's
never-dispatched indiction/permutation payload stubs
(radix/indiction.comp:22-28).  `stable=True` threads a global-index plane
through the comparisons, making pair sorts deterministic and argsort
stable across the whole mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radx_tpu.config import SortConfig, cdiv, resolve_interpret, tuned
from radx_tpu.kernels import bitonic

LANES = 128
_SIGN = np.uint32(0x80000000)
_PAD_KEY = np.int32(0x7FFFFFFF)
OVERSAMPLE = 64  # samples per device per splitter; recv bound N/D + N/(64·D)


def _pow2_pad(n: int, min_total: int = 1024) -> int:
    return 1 << (max(n, min_total) - 1).bit_length()


def _log2(x: int) -> int:
    assert x > 0 and (x & (x - 1)) == 0, f"{x} not a power of two"
    return x.bit_length() - 1


def _plane_fill(i, num_cmp):
    """Pad fill per plane: sentinel max for the key, and max for the
    tiebreak plane too — real keys equal to the 0x7FFFFFFF sentinel (i.e.
    uint32 0xFFFFFFFF) must sort BEFORE pads so the valid prefix keeps
    their payloads, which requires pads to lose every tiebreak."""
    if i == 0:
        return _PAD_KEY
    if i == 1 and num_cmp == 2:
        return jnp.int32(0x7FFFFFFF)
    return jnp.int32(0)


def _local_sort_planes(planes, n, cfg, num_cmp):
    """Pad i32 planes (1-D, length n) to a pow2 and bitonic-sort them."""
    total = _pow2_pad(n)
    padded = []
    for i, p in enumerate(planes):
        buf = jnp.full((total,), _plane_fill(i, num_cmp), jnp.int32).at[:n].set(p)
        padded.append(buf.reshape(total // LANES, LANES))
    outs = bitonic.sort_planes(
        padded,
        cfg.chunk_rows if num_cmp == 1 else cfg.stable_chunk_rows,
        num_cmp,
        interpret=resolve_interpret(cfg),
    )
    return [o.reshape(-1)[:n] for o in outs]


def _merge_pair(a_planes, b_planes, log_run, num_cmp, cfg, descending):
    """Bitonic-merge two sorted runs (a ascending, b descending) into one
    run of twice the length, ascending unless `descending`."""
    planes = [
        jnp.concatenate([a, b]).reshape(-1, LANES)
        for a, b in zip(a_planes, b_planes)
    ]
    out = bitonic.merge_sorted_runs(
        planes, log_run, num_cmp,
        cfg.chunk_rows if num_cmp == 1 else cfg.stable_chunk_rows,
        descending=descending,
        interpret=resolve_interpret(cfg),
    )
    return [o.reshape(-1) for o in out]


def _shard_body(keys, payloads, n_dev, slot, n, cfg, axis, stable, overlap):
    """Per-shard body (runs under shard_map). keys: (m,) uint32.

    n is the GLOBAL valid count: ragged inputs are padded to D·m by the
    wrapper, pads sit at the global tail, so this shard's valid prefix is
    m_valid = clip(n - me·m, 0, m).  Pads never enter samples, counts, or
    the exchange — they are simply not sliced."""
    m = keys.shape[0]
    me = jax.lax.axis_index(axis)
    m_valid = jnp.clip(n - me * m, 0, m)

    # (1) local sort — ascending by biased key (+ global index when stable)
    biased = (keys ^ _SIGN).astype(jnp.int32)
    planes = [biased]
    if stable:
        planes.append(me * m + jnp.arange(m, dtype=jnp.int32))
    planes += [jax.lax.bitcast_convert_type(p, jnp.int32) for p in payloads]
    num_cmp = 2 if stable else 1
    planes = _local_sort_planes(planes, m, cfg, num_cmp)
    s_key = planes[0]

    # (2) sample splitters from the sorted shard's VALID prefix.  Exact
    # i32 arithmetic: (j+1)*m_valid overflows i32 at 64·n >= 2^31, so
    # split m_valid = q·(ns+1) + r (j·r <= (ns+1)² stays small).
    ns = OVERSAMPLE * n_dev
    jj = jnp.arange(ns, dtype=jnp.int32) + 1
    q, r = m_valid // (ns + 1), m_valid % (ns + 1)
    pos = jj * q + (jj * r) // (ns + 1)
    samples = s_key[pos]
    gsamples = jax.lax.all_gather(samples, axis, tiled=True)  # (ns·D,)
    gsorted = jnp.sort(gsamples)
    spos = jnp.arange(1, n_dev, dtype=jnp.int32) * ns  # = j·(ns·D)//D exactly
    splitters = gsorted[spos]  # (D-1,) — device s gets [split[s-1], split[s])

    # (3) run boundaries: rank of each splitter in my sorted shard's valid
    # prefix (pads are sentinel-max and would otherwise count into the top
    # splitter's run when a splitter equals the sentinel)
    ranks = [
        jnp.minimum(
            jnp.sum((s_key < splitters[s]).astype(jnp.int32)), m_valid
        )
        for s in range(n_dev - 1)
    ]
    bounds = jnp.stack(
        [jnp.int32(0), *ranks, m_valid]
    )  # (D+1,) non-decreasing
    counts = bounds[1:] - bounds[:-1]  # (D,) keys bound for each device
    overflow = jax.lax.pmax(jnp.max(counts - slot), axis) > 0

    # pack runs into fixed sentinel-padded slots: D contiguous slices
    j = jax.lax.broadcasted_iota(jnp.int32, (n_dev, slot), 1)
    in_slot = (j < counts[:, None]).astype(jnp.int32)
    send = []
    for i, p in enumerate(planes):
        fill = _plane_fill(i, num_cmp)
        padded = jnp.concatenate([p, jnp.full((slot,), fill, jnp.int32)])
        rows = jnp.stack([
            jax.lax.dynamic_slice(padded, (bounds[s],), (slot,))
            for s in range(n_dev)
        ])  # (D, slot)
        send.append(jnp.where(in_slot != 0, rows, fill))
    send = jnp.stack(send)  # (P, D, slot)

    # source-side flip of runs bound for odd arrival positions, so the
    # destination's runs alternate ascending/descending by arrival index
    # (the merge_sorted_runs precondition) with no flip pass there
    arrival = (jax.lax.broadcasted_iota(jnp.int32, (1, n_dev, 1), 1) - me) % n_dev
    send = jnp.where((arrival & 1) != 0, jnp.flip(send, axis=-1), send)

    # (4) exchange counts (one tiled all_to_all of D ints) and runs
    # (D-1 ppermute waves), merging arrived runs between waves
    rcounts = jax.lax.all_to_all(
        counts.reshape(n_dev, 1), axis, split_axis=0, concat_axis=0,
        tiled=True,
    ).reshape(-1)
    valid = jnp.sum(rcounts)

    log_slot = _log2(slot)
    perm_cache = {}

    def wave(shift):
        dest = (me + shift) % n_dev
        blk = jax.lax.dynamic_slice_in_dim(send, dest, 1, axis=1)
        perm = perm_cache.setdefault(
            shift, [(i, (i + shift) % n_dev) for i in range(n_dev)]
        )
        return jax.lax.ppermute(blk, axis, perm)[:, 0]  # (P, slot)

    own = jax.lax.dynamic_slice_in_dim(send, me, 1, axis=1)[:, 0]

    # non-pow2 D: complete the merge structure with all-sentinel virtual
    # runs (constant planes — sorted in every direction, zero exchange
    # cost); the valley-free pow2 machinery then applies unchanged
    n_runs = 1 << (n_dev - 1).bit_length()
    n_planes_ = len(planes)

    def sentinel_run():
        return [
            jnp.full((slot,), _plane_fill(i, num_cmp), jnp.int32)
            for i in range(n_planes_)
        ]

    if overlap:
        # pairwise merge tree, folded into the wave loop: the merge of
        # arrivals (2i, 2i+1) is issued as soon as both are in, so XLA can
        # run it concurrently with the next ppermute wave
        stack = []  # (level, position, planes)

        def push(run_planes, a):
            stack.append((0, a, run_planes))
            while len(stack) >= 2 and stack[-1][0] == stack[-2][0]:
                lvl, _, b = stack.pop()
                _, pos1, a_pl = stack.pop()
                parent = pos1 >> 1
                merged = _merge_pair(
                    a_pl, b, log_slot + lvl, num_cmp, cfg,
                    descending=(parent & 1) == 1,
                )
                stack.append((lvl + 1, parent, merged))

        push([own[i] for i in range(own.shape[0])], 0)
        for shift in range(1, n_dev):
            r = wave(shift)
            push([r[i] for i in range(r.shape[0])], shift)
        for a in range(n_dev, n_runs):
            push(sentinel_run(), a)
        assert len(stack) == 1
        merged = stack[0][2]
    else:
        runs = [own] + [wave(shift) for shift in range(1, n_dev)]
        runs += [jnp.stack(sentinel_run()) for _ in range(n_runs - n_dev)]
        flat = jnp.concatenate(runs, axis=-1)  # (P, n_runs·slot)
        planes_in = [
            flat[i].reshape(-1, LANES) for i in range(flat.shape[0])
        ]
        out = bitonic.merge_sorted_runs(
            planes_in, log_slot, num_cmp,
            cfg.chunk_rows if num_cmp == 1 else cfg.stable_chunk_rows,
            interpret=resolve_interpret(cfg),
        )
        merged = [o.reshape(-1) for o in out]

    sorted_keys = merged[0].astype(jnp.uint32) ^ _SIGN
    outs = [sorted_keys] + merged[1:]
    return (*outs, valid.reshape(1), overflow.reshape(1))


def _run_sharded(keys, payloads, mesh, axis, capacity, cfg, stable, overlap):
    cfg = cfg or tuned()
    if keys.dtype != jnp.uint32:
        # int32 keys would silently bias/compare wrong — reject like
        # ops.sort.
        raise TypeError(f"keys must be uint32, got {keys.dtype}")
    for p in payloads:
        if p.shape != keys.shape or p.dtype.itemsize != 4:
            raise TypeError(
                f"payloads must be 32-bit arrays of shape {keys.shape}"
            )
    n_dev = mesh.shape[axis]
    n = keys.shape[0]
    # ragged n: pad to D·ceil(n/D) with sentinel keys at the global tail;
    # the shard body derives its valid prefix from n and never lets pads
    # into the exchange.  Non-pow2 D is handled by the body's virtual
    # sentinel runs.  (Both rejects lifted in round 4 — VERDICT r3 item 6.)
    m = cdiv(n, n_dev)
    padded_n = m * n_dev
    if padded_n != n:
        keys = jnp.concatenate(
            [keys, jnp.full((padded_n - n,), 0xFFFFFFFF, jnp.uint32)]
        )
        payloads = tuple(
            jnp.concatenate([p, jnp.zeros((padded_n - n,), p.dtype)])
            for p in payloads
        )
    slot = _pow2_pad(capacity * cdiv(n, n_dev * n_dev), min_total=LANES)

    # Payload-carrying sorts always thread the global-index tiebreak
    # internally: with num_cmp=1 a real key equal to the 0xFFFFFFFF pad
    # sentinel TIES with pads, and the valid-prefix slicing could then ship
    # a pad's zero payload in place of the real one (and one-sided tie
    # exchanges may duplicate riders).  The tiebreak makes the comparator a
    # total order, closing both; callers that asked stable=False simply
    # don't get the index plane back.
    internal_stable = stable or bool(payloads)
    body = functools.partial(
        _shard_body, n_dev=n_dev, slot=slot, n=n, cfg=cfg, axis=axis,
        stable=internal_stable, overlap=overlap,
    )
    n_extra = len(payloads) + (1 if internal_stable else 0)
    fn = shard_map(
        lambda k, *ps: body(k, ps),
        mesh=mesh,
        in_specs=(P(axis),) * (1 + len(payloads)),
        out_specs=(P(axis),) * (1 + n_extra) + (P(axis), P(axis)),
        # pallas_call outputs carry no varying-across-mesh annotation yet
        check_vma=False,
    )
    *planes, valid, overflow = fn(keys, *payloads)
    planes = [p.reshape(n_dev, -1) for p in planes]
    return planes, valid.reshape(-1), overflow.reshape(-1), stable


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "capacity", "cfg", "overlap"),
)
def sort_sharded(
    keys,
    mesh: Mesh,
    axis: str = "d",
    capacity: int = 4,
    cfg: SortConfig | None = None,
    overlap: bool = True,
):
    """Distributed sort of uint32 keys sharded over `axis` of `mesh`.

    Returns (sorted_padded, valid, overflow):
      sorted_padded — (D, L) uint32, row d = device d's sorted shard,
        sentinel-padded past `valid[d]`;
      valid — (D,) int32 count of real keys per device;
      overflow — (D,) bool, True anywhere means slot capacity was exceeded
        and the result must not be trusted (re-run with higher capacity).
    The concatenation of row 0's valid prefix, row 1's, ... is the globally
    sorted sequence.
    """
    planes, valid, overflow, _ = _run_sharded(
        keys, (), mesh, axis, capacity, cfg, stable=False, overlap=overlap
    )
    return planes[0], valid, overflow


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "capacity", "cfg", "stable", "overlap"),
)
def sort_pairs_sharded(
    keys,
    values,
    mesh: Mesh,
    axis: str = "d",
    capacity: int = 4,
    cfg: SortConfig | None = None,
    stable: bool = False,
    overlap: bool = True,
):
    """Distributed key+payload sort. values: any 32-bit dtype, same shape.

    Returns (sorted_keys, sorted_values, valid, overflow) with the same
    row/prefix semantics as sort_sharded.  `stable=True` preserves the
    original relative order of equal keys across the whole mesh (threads a
    global-index tiebreak plane through every comparison).
    """
    planes, valid, overflow, _ = _run_sharded(
        keys, (values,), mesh, axis, capacity, cfg,
        stable=stable, overlap=overlap,
    )
    vals = planes[-1]
    out_vals = jax.lax.bitcast_convert_type(
        vals, values.dtype
    ) if values.dtype != jnp.int32 else vals
    return planes[0], out_vals, valid, overflow


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "capacity", "cfg", "overlap"),
)
def argsort_sharded(
    keys,
    mesh: Mesh,
    axis: str = "d",
    capacity: int = 4,
    cfg: SortConfig | None = None,
    overlap: bool = True,
):
    """Distributed stable argsort: returns (sorted_keys, global_indices,
    valid, overflow).  global_indices[d, i] is the original flat position
    of sorted_padded[d, i]."""
    planes, valid, overflow, _ = _run_sharded(
        keys, (), mesh, axis, capacity, cfg, stable=True, overlap=overlap
    )
    return planes[0], planes[1], valid, overflow


def collect(sorted_padded, valid):
    """Host-side: concatenate valid prefixes into one sorted numpy array."""
    rows = np.asarray(jax.device_get(sorted_padded))
    counts = np.asarray(jax.device_get(valid))
    return np.concatenate([rows[d, : counts[d]] for d in range(rows.shape[0])])
