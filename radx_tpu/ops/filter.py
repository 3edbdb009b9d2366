"""Filter (predicate → compaction) — BASELINE config 3's first half.

TPU-native design: compaction is a *stable partition*, i.e. a 1-bit radix
pass — exactly the degenerate case of the sort engine (a predicate is a
1-bit digit).  We run the bitonic pipeline keyed on (1 - mask) with the
original index as tiebreak, which moves kept rows to the front in original
order with no scatter.  The reference has no relational layer at all; this
is the "filter" operator demanded by BASELINE.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from radx_tpu.config import LANES, SortConfig, resolve_interpret, tuned
from radx_tpu.kernels import bitonic


def _pad_total(n: int) -> int:
    return 1 << (max(n, 1024) - 1).bit_length()


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _compact_jit(mask, cols, cfg: SortConfig, n: int):
    total = _pad_total(n)

    # Composite sort key (one plane instead of notmask+index planes, and the
    # keys are unique so num_cmp=1 suffices — halves memory and compare
    # cost, which matters at the 1B-row BASELINE config):
    #   bit 30 = "dropped", bits 0..29 = original index → kept rows first,
    #   each side in original order; padding gets bit 31 region (sorts last).
    notmask = 1 - mask.astype(jnp.int32)
    composite = (notmask << 30) | jax.lax.iota(jnp.int32, n)
    key_plane = (
        jnp.full((total,), jnp.int32(0x7FFFFFFF))
        .at[:n]
        .set(composite)
        .reshape(total // LANES, LANES)
    )
    col_planes = [
        jax.lax.bitcast_convert_type(
            jnp.zeros((total,), c.dtype).at[:n].set(c), jnp.int32
        ).reshape(total // LANES, LANES)
        for c in cols
    ]
    outs = bitonic.sort_planes(
        [key_plane] + col_planes,
        cfg.stable_chunk_rows,
        num_cmp=1,
        interpret=resolve_interpret(cfg),
    )
    count = jnp.sum(mask.astype(jnp.int32))
    compacted = [o.reshape(-1)[:n] for o in outs[1:]]
    return compacted, count


def filter_columns(mask, cols, cfg: SortConfig | None = None):
    """Stable compaction of 32-bit columns by a boolean/0-1 mask.

    Returns (cols_out, count): each column reordered so rows where mask!=0
    occupy the first `count` slots in original order; the tail is garbage.
    """
    cfg = cfg or tuned()
    mask = jnp.asarray(mask)
    cols = [jnp.asarray(c) for c in cols]
    n = mask.shape[0]
    for c in cols:
        if c.shape != (n,):
            raise ValueError("all columns must match mask shape")
        if c.dtype.itemsize != 4:
            raise TypeError("columns must be 32-bit dtypes")
    if n == 0:
        return cols, jnp.int32(0)
    if n > 1 << 30:
        raise ValueError("filter supports up to 2^30 rows per call")
    compacted, count = _compact_jit(mask, cols, cfg, n)
    return [
        jax.lax.bitcast_convert_type(o, c.dtype)
        for o, c in zip(compacted, cols)
    ], count
