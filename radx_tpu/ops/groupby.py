"""Group-by aggregation (the BASELINE's "hash aggregate", TPU-native form).

A hash table's random probes are hostile to the TPU memory system, and the
engine already owns a fast sort — so aggregation is sort-based, the classic
vector-machine equivalent with identical semantics: sort (key, value) pairs
with the Pallas pipeline, mark run boundaries, and reduce each run with a
segmented scan.  The digit-histogram machinery the reference uses per pass
(counting.comp) reappears here as the boundary/segment bookkeeping.

Aggregations: sum, count, min, max (uint32 values; float32 sums via the
f32 path).  Output is padded to the input length with `num_groups` valid
rows (static shapes — XLA cannot return data-dependent sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radx_tpu.config import SortConfig
from radx_tpu.ops import sort as sort_ops

_U32_MAX = jnp.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("cfg", "agg"))
def _groupby_jit(keys, values, cfg: SortConfig, agg: str):
    n = keys.shape[0]
    skeys, svals = sort_ops._sort_stable_jit(keys, values, cfg, n, True)
    svals = jax.lax.bitcast_convert_type(svals, values.dtype)

    prev = jnp.concatenate([skeys[:1] ^ jnp.uint32(1), skeys[:-1]])
    boundary = (skeys != prev).astype(jnp.int32)
    boundary = boundary.at[0].set(1)
    seg = jnp.cumsum(boundary) - 1  # 0-based group id, ascending
    num_groups = seg[-1] + 1

    if agg == "count":
        data = jnp.ones((n,), jnp.int32)
        out = jax.ops.segment_sum(data, seg, num_segments=n)
    elif agg == "sum":
        out = jax.ops.segment_sum(
            values_sorted_for(svals), seg, num_segments=n
        )
    elif agg == "min":
        out = jax.ops.segment_min(svals, seg, num_segments=n)
    elif agg == "max":
        out = jax.ops.segment_max(svals, seg, num_segments=n)
    else:  # pragma: no cover
        raise ValueError(agg)

    # unique keys: first element of each run, compacted by segment id
    ukeys = jnp.full((n,), _U32_MAX).at[seg].set(skeys)
    return ukeys, out, num_groups


def values_sorted_for(svals):
    # uint32 sums can overflow 32 bits; accumulate in int64 when enabled,
    # else in the input dtype (documented wraparound, like C).
    if svals.dtype == jnp.uint32 and jax.config.jax_enable_x64:
        return svals.astype(jnp.uint64)
    return svals


def groupby(keys, values, agg: str = "sum", cfg: SortConfig | None = None):
    """Aggregate `values` per unique uint32 key.

    Returns (unique_keys, aggregates, num_groups): arrays padded to len(keys)
    — rows beyond num_groups are padding (unique_keys there = 0xFFFFFFFF).
    Unique keys are ascending.
    """
    cfg = cfg or SortConfig()
    keys = jnp.asarray(keys)
    values = jnp.asarray(values)
    if keys.dtype != jnp.uint32:
        raise TypeError("keys must be uint32")
    if values.shape != keys.shape:
        raise ValueError("values must match keys shape")
    if agg not in ("sum", "count", "min", "max"):
        raise ValueError(f"unknown agg {agg!r}")
    if keys.shape[0] == 0:
        return keys, values, jnp.int32(0)
    return _groupby_jit(keys, values, cfg, agg)
