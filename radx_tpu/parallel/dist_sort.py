"""Distributed MSD-first sort over a device mesh (BASELINE config 5).

Net-new capability vs the reference (which is strictly single-GPU,
SURVEY §2e).  Algorithm — the TPU-native replacement for a multi-GPU
radix shuffle:

  1. every device histograms the top 16 bits of its shard (65536 bins) and
     the histograms are summed across the mesh with `psum` — the global
     digit distribution;
  2. skew-aware splitter assignment: bins are assigned to devices by their
     position in the exclusive cumulative histogram, so each device receives
     ~N/D keys *under the observed distribution* (not a fixed digit range —
     a uniform split would collapse under skew; the reference never handles
     skew at all, it uses fixed blocks);
  3. each device sorts its shard by (destination device, key) — so the
     shard becomes contiguous, already-sorted runs per destination — and
     scatters the runs into fixed-capacity slots;
  4. one `all_to_all` exchanges the slots (ICI within a slice, DCN across
     hosts);
  5. each device locally sorts what it received (bitonic Pallas pipeline;
     capacity padding uses the 0xFFFFFFFF sentinel, which sorts to the end).

  The concatenation of device 0's valid prefix, device 1's, ... is the
  globally sorted sequence.

Capacity: slots are static (XLA requires static shapes), `capacity` ×
ceil(N/D²) keys per (src, dst) pair.  Overflow cannot be raised from inside
jit, so `sort_sharded` also returns a boolean overflow flag computed with a
global max — callers must check it (tested in tests/test_dist_sort.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radx_tpu.config import SortConfig, cdiv, resolve_interpret
from radx_tpu.kernels import bitonic

LANES = 128
_SIGN = jnp.uint32(0x80000000)
_PAD_KEY = jnp.int32(0x7FFFFFFF)
PREFIX_BITS = 16  # splitter granularity; 2^16 bins ≈ 256 KiB of histogram


def _pow2_pad(n: int, min_total: int = 1024) -> int:
    return 1 << (max(n, min_total) - 1).bit_length()


def _local_sort_planes(planes, n, cfg, num_cmp):
    """Pad i32 planes (1-D, length n) to a pow2 and bitonic-sort them."""
    total = _pow2_pad(n)
    padded = []
    for i, p in enumerate(planes):
        fill = _PAD_KEY if i == 0 else jnp.int32(0)
        buf = jnp.full((total,), fill, jnp.int32).at[:n].set(p)
        padded.append(buf.reshape(total // LANES, LANES))
    outs = bitonic.sort_planes(
        padded,
        cfg.chunk_rows if num_cmp == 1 else cfg.stable_chunk_rows,
        num_cmp,
        interpret=resolve_interpret(cfg),
    )
    return [o.reshape(-1)[:n] for o in outs]


def _shard_body(keys, n_dev, slot, cfg, axis):
    """Per-shard body (runs under shard_map). keys: (m,) uint32."""
    m = keys.shape[0]
    prefix = (keys >> jnp.uint32(32 - PREFIX_BITS)).astype(jnp.int32)

    # (1) global prefix histogram
    hist = jnp.zeros((1 << PREFIX_BITS,), jnp.int32).at[prefix].add(1)
    ghist = jax.lax.psum(hist, axis)

    # (2) skew-aware bin -> device assignment from the cumulative histogram
    n_total = m * n_dev
    target = cdiv(n_total, n_dev)
    cum_excl = jnp.cumsum(ghist) - ghist
    dev_of_bin = jnp.minimum(cum_excl // target, n_dev - 1).astype(jnp.int32)

    dest = dev_of_bin[prefix]

    # (3) sort shard by (dest, key): contiguous per-destination sorted runs
    biased = (keys ^ _SIGN).astype(jnp.int32)
    s_dest, s_key = _local_sort_planes([dest, biased], m, cfg, num_cmp=2)

    # counts[s] = number of local keys bound for device s
    counts = jnp.zeros((n_dev,), jnp.int32).at[dest].add(1)
    offsets = jnp.cumsum(counts) - counts

    # scatter runs into fixed slots, sentinel-padded
    j = jax.lax.broadcasted_iota(jnp.int32, (n_dev, slot), 1)
    src_idx = jnp.clip(offsets[:, None] + j, 0, m - 1)
    gathered = s_key[src_idx]
    send = jnp.where(j < counts[:, None], gathered, _PAD_KEY)

    # (4) exchange slots and counts
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=True)
    rcounts = jax.lax.all_to_all(
        counts.reshape(n_dev, 1), axis, split_axis=0, concat_axis=0, tiled=True
    ).reshape(-1)
    valid = jnp.sum(rcounts)

    # (5) local sort of received keys (sentinels sort to the end)
    flat = recv.reshape(-1)
    (sorted_biased,) = _local_sort_planes([flat], flat.shape[0], cfg, num_cmp=1)
    sorted_keys = sorted_biased.astype(jnp.uint32) ^ _SIGN

    overflow = jax.lax.pmax(jnp.max(counts - slot), axis) > 0
    return sorted_keys, valid.reshape(1), overflow.reshape(1)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "capacity", "cfg")
)
def sort_sharded(
    keys,
    mesh: Mesh,
    axis: str = "d",
    capacity: int = 4,
    cfg: SortConfig | None = None,
):
    """Distributed sort of uint32 keys sharded over `axis` of `mesh`.

    Returns (sorted_padded, valid, overflow):
      sorted_padded — (D, D*slot) uint32, row d = device d's sorted shard,
        sentinel-padded past `valid[d]`;
      valid — (D,) int32 count of real keys per device;
      overflow — (D,) bool, True anywhere means capacity was exceeded and
        the result must not be trusted (re-run with higher capacity).
    The concatenation of row 0's valid prefix, row 1's, ... is the globally
    sorted sequence.
    """
    cfg = cfg or SortConfig()
    if keys.dtype != jnp.uint32:
        # int32 keys would take arithmetic right-shifts for the splitter
        # prefix and silently corrupt the histogram — reject like ops.sort.
        raise TypeError(f"keys must be uint32, got {keys.dtype}")
    n_dev = mesh.shape[axis]
    n = keys.shape[0]
    if n % n_dev:
        raise ValueError(f"n={n} must divide evenly across {n_dev} devices")
    m = n // n_dev
    slot = capacity * cdiv(n, n_dev * n_dev)

    body = functools.partial(
        _shard_body, n_dev=n_dev, slot=slot, cfg=cfg, axis=axis
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis)),
        # pallas_call outputs carry no varying-across-mesh annotation yet
        check_vma=False,
    )
    sorted_keys, valid, overflow = fn(keys)
    return (
        sorted_keys.reshape(n_dev, -1),
        valid.reshape(-1),
        overflow.reshape(-1),
    )


def collect(sorted_padded, valid):
    """Host-side: concatenate valid prefixes into one sorted numpy array."""
    import numpy as np

    rows = np.asarray(jax.device_get(sorted_padded))
    counts = np.asarray(jax.device_get(valid))
    return np.concatenate([rows[d, : counts[d]] for d in range(rows.shape[0])])
