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

from radx_tpu.config import SortConfig
from radx_tpu.ops import sort as sort_ops


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
    cfg = cfg or SortConfig()
    build_keys = jnp.asarray(build_keys)
    probe_keys = jnp.asarray(probe_keys)
    build_vals = jnp.asarray(build_vals)
    probe_vals = jnp.asarray(probe_vals)
    for k in (build_keys, probe_keys):
        if k.dtype != jnp.uint32:
            raise TypeError("join keys must be uint32")
    if build_vals.shape != build_keys.shape:
        raise ValueError("build_vals must match build_keys")
    if probe_vals.shape != probe_keys.shape:
        raise ValueError("probe_vals must match probe_keys")
    if max_matches < 1:
        raise ValueError("max_matches must be >= 1")
    return _join_jit(
        build_keys, build_vals, probe_keys, probe_vals, cfg, max_matches
    )
