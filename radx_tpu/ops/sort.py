"""Single-chip sort API: sort / argsort / sort_pairs over uint32 keys.

Role-wise this is RadX's L4 "Sort API layer" (radx::Sort<Radix>::initialize/
command, radx_internal.hpp:104-134): it owns buffer preparation (padding,
sign-bias, plane packing — the analogue of InputInterface's keys/swap
descriptor pair) and dispatches to a strategy:

  * "bitonic" (default) — the flagship Pallas network (kernels/bitonic.py);
                          the production single-chip path (NOTES.md r4:
                          it beats the distribution sort at every size).
  * "radix"             — the radix distribution sort
                          (kernels/radix_sort.py): the reference's
                          counting → partition → scattering pipeline,
                          kept for algorithmic parity + skew analysis.
  * "lax"               — jax.lax.sort fallback; the analogue of RadX's
                          lowest-common-denominator "universal" SPIR-V
                          variant (radx_shaders.hpp:10,109): correct
                          anywhere XLA runs, never the fast path.

Unlike the reference (keys only; its payload pipelines are created but never
dispatched, radx_internal.hpp:139), payload sorting and stable argsort are
first-class here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from radx_tpu.config import LANES, SortConfig, resolve_interpret, tuned
from radx_tpu.kernels import bitonic, radix_sort

_SIGN = np.uint32(0x80000000)
_PAD_KEY = np.int32(0x7FFFFFFF)  # sign-biased 0xFFFFFFFF: sorts to the end


def _engine(planes, cfg: SortConfig, num_cmp: int, n: int,
            unique: bool = True):
    """Dispatch i32 planes to the configured Pallas engine (not "lax").

    strategy="radix" runs the radix distribution sort
    (kernels/radix_sort.py — the reference's counting → partition →
    scattering pipeline, radx_implement.inl:421-447, as histogram-driven
    splitters + slot-packed scatter + per-bucket merges) and falls back to
    the bitonic network under lax.cond when a slot overflows (adversarial
    duplicate skew) — so the dispatch stays fully jittable and total.
    The chunk height grows with N to keep the pack slots above their
    floor (radix_sort.pick_chunk_rows).
    """
    interpret = resolve_interpret(cfg)
    if num_cmp > 1:
        # 2-plane stable sorts (argsort's (key, iota), sort_u64's
        # (hi, lo)) run a taller chunk than the 3+-plane paths: measured
        # faster (config.stable2_chunk_rows note) and compile-safe at 2
        # planes
        chunk_rows = (
            cfg.stable2_chunk_rows
            if len(planes) == 2
            else cfg.stable_chunk_rows
        )
    elif len(planes) > 1:
        chunk_rows = cfg.rider_chunk_rows  # 2-plane (key, rider) optimum
    else:
        chunk_rows = cfg.chunk_rows
    if cfg.strategy == "radix":
        total = planes[0].shape[0] * LANES
        r_rows = radix_sort.pick_chunk_rows(total, chunk_rows)
        if radix_sort.plan(total, r_rows) is not None:
            outs, overflow = radix_sort.sort_radix(
                planes, r_rows, num_cmp,
                interpret=interpret, n_valid=n, unique=unique,
            )
            return jax.lax.cond(
                overflow,
                lambda ps: tuple(
                    bitonic.sort_planes(
                        list(ps), chunk_rows, num_cmp, interpret=interpret,
                        unique=unique,
                    )
                ),
                lambda ps: tuple(outs),
                tuple(planes),
            )
    return tuple(
        bitonic.sort_planes(
            planes, chunk_rows, num_cmp, interpret=interpret, unique=unique
        )
    )


def _pad_len(n: int, min_total: int = 1024) -> int:
    total = max(min_total, n)
    return 1 << (total - 1).bit_length()


def _key_plane(keys, total):
    """uint32 keys -> sign-biased i32 plane of shape (total//128, 128)."""
    biased = (keys ^ _SIGN).astype(jnp.int32)
    plane = jnp.full((total,), _PAD_KEY, jnp.int32).at[: keys.shape[0]].set(biased)
    return plane.reshape(total // LANES, LANES)


def _iota_plane(total):
    return jax.lax.iota(jnp.int32, total).reshape(total // LANES, LANES)


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _sort_keys_jit(keys, cfg: SortConfig, n: int):
    total = _pad_len(n)
    plane = _key_plane(keys, total)
    if cfg.strategy == "lax":
        out = jax.lax.sort(plane.reshape(-1))
    else:
        out = _engine([plane], cfg, 1, n)[0].reshape(-1)
    return (out[:n].astype(jnp.uint32)) ^ _SIGN


@functools.partial(jax.jit, static_argnames=("cfg", "n", "with_payload"))
def _sort_stable_jit(keys, payload, cfg: SortConfig, n: int, with_payload):
    total = _pad_len(n)
    kp = _key_plane(keys, total)
    ip = _iota_plane(total)
    planes = [kp, ip]
    if with_payload:
        pp = jax.lax.bitcast_convert_type(
            jnp.zeros((total,), payload.dtype).at[:n].set(payload), jnp.int32
        ).reshape(total // LANES, LANES)
        planes.append(pp)
    if cfg.strategy == "lax":
        flat = [p.reshape(-1) for p in planes]
        outs = jax.lax.sort(tuple(flat), num_keys=2)
    else:
        outs = [p.reshape(-1) for p in _engine(planes, cfg, 2, n)]
    sorted_keys = (outs[0][:n].astype(jnp.uint32)) ^ _SIGN
    perm = outs[1][:n]
    if with_payload:
        return sorted_keys, outs[2][:n]
    return sorted_keys, perm


@functools.partial(jax.jit, static_argnames=("cfg", "n", "neutral"))
def _sort_rider_jit(keys, payload_bits, cfg: SortConfig, n: int, neutral: int):
    """Unstable (key, rider) sort over the FULL padded array — 2 planes,
    num_cmp=1: the fast path for commutative consumers (aggregation),
    which need grouping but not stability, so the iota tiebreak plane of
    `_sort_stable_jit` is pure overhead (~1.5x the exchange work).

    Pads carry key 0xFFFFFFFF — they sort INTO the real max-key group
    (num_cmp=1 cannot order ties), so pad riders must be the consumer's
    neutral element (`neutral`, an i32 bit pattern): the max-key group's
    aggregate then stays exact.  Returns the FULL padded (keys_u32, rider
    bits) arrays of length _pad_len(n); ops/groupby.py drops the phantom
    all-pad group when no real key equals 0xFFFFFFFF.
    """
    total = _pad_len(n)
    kp = _key_plane(keys, total)
    pp = (
        jnp.full((total,), np.int32(neutral))
        .at[:n]
        .set(payload_bits)
        .reshape(total // LANES, LANES)
    )
    if cfg.strategy == "lax":
        k, p = jax.lax.sort(
            (kp.reshape(-1), pp.reshape(-1)), num_keys=1
        )
    else:
        # n_valid=total: pads are REAL rows here (key 0xFFFFFFFF + neutral
        # rider).  Passing n would let the radix engine's exact-concat
        # re-sentinel rider fills past n with 0, clobbering the neutral.
        outs = _engine([kp, pp], cfg, 1, total, unique=False)
        k, p = outs[0].reshape(-1), outs[1].reshape(-1)
    return (k.astype(jnp.uint32)) ^ _SIGN, p


def _as_u32(keys):
    keys = jnp.asarray(keys)
    if keys.dtype != jnp.uint32:
        raise TypeError(f"keys must be uint32, got {keys.dtype}")
    if keys.ndim != 1:
        raise ValueError("keys must be 1-D")
    return keys


def _decompose_blocks(n: int, block_elems: int):
    """Binary piece decomposition for arbitrary N: blocks = ceil(n/C)
    rounded up to at most 5 significant bits (pad overhead <= 1/16 + C/n),
    so the piece count is <= 5.  Returns (blocks, piece block counts,
    largest first)."""
    blocks = -(-n // block_elems)
    t = blocks.bit_length()
    if t > 5:
        g = 1 << (t - 5)
        blocks = -(-blocks // g) * g
        t = blocks.bit_length()
    sizes = [1 << b for b in range(t) if (blocks >> b) & 1]
    return blocks, sizes[::-1]


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _sort_arbn_keys_jit(keys, cfg: SortConfig, n: int):
    """Arbitrary-N sort without pow2 padding blowup (VERDICT r1 item 7; the
    reference handles any N via validity ballots,
    RadX2-SM7-DEV/includes.glsl:171-182).  Pieces of pow2 size (binary
    decomposition of ceil(n/C), <= 5 pieces) are engine-sorted — all but
    the last descending via the order-reversing i32 bit-not — then folded
    smallest-first through valley merges on virtual-tail bitonic networks
    (kernels/bitonic.merge_valley_ascending).  Total pad <= 1/32·n + C."""
    c_rows = cfg.chunk_rows
    blocks, sizes = _decompose_blocks(n, c_rows * LANES)
    total = blocks * c_rows * LANES
    plane = _key_plane(keys, total)
    interpret = resolve_interpret(cfg)
    row_off = 0
    pieces = []
    for idx, sz in enumerate(sizes):
        rows_p = sz * c_rows
        sl = jax.lax.slice_in_dim(plane, row_off, row_off + rows_p, axis=0)
        if idx == len(sizes) - 1:
            pieces.append(_engine([sl], cfg, 1, rows_p * LANES)[0])
        else:
            # non-last pieces sort DESCENDING natively: the bitonic network
            # with every direction bit flipped — the reversed order costs
            # exactly the same passes, no elementwise inversion.  Sentinel
            # pads, if any spill into these pieces, are just large values —
            # the valley merges push them to the global tail.
            pieces.append(
                bitonic.sort_planes(
                    [sl], c_rows, 1, interpret=interpret, descending=True
                )[0]
            )
        row_off += rows_p
    # Fold smallest-first: [piece_desc ++ suffix_asc] is a bitonic valley;
    # every fold merges ascending on a virtual +inf-tailed network.
    acc = pieces[-1]
    for pd in reversed(pieces[:-1]):
        valley = jnp.concatenate([pd, acc], axis=0)
        acc = bitonic.merge_valley_ascending(
            [valley], c_rows, 1, interpret=interpret
        )[0]
    out = acc.reshape(-1)
    return (out[:n].astype(jnp.uint32)) ^ _SIGN


@functools.partial(jax.jit, static_argnames=("cfg", "n", "with_payload"))
def _sort_arbn_stable_jit(keys, payload, cfg: SortConfig, n: int,
                         with_payload: bool):
    """Arbitrary-N stable sort (argsort / pairs): the piece + valley-merge
    scheme of _sort_arbn_keys_jit with the (key, iota) lexicographic planes.
    Descending pieces invert BOTH compare planes (bit-not reverses the
    lexicographic order); the payload plane rides along uninverted.
    Stability: the (key, original index) comparator is a total order, so
    the merged result is the unique stable permutation no matter how the
    input was cut into pieces."""
    c_rows = cfg.stable_chunk_rows
    blocks, sizes = _decompose_blocks(n, c_rows * LANES)
    total = blocks * c_rows * LANES
    planes = [_key_plane(keys, total), _iota_plane(total)]
    if with_payload:
        planes.append(
            jax.lax.bitcast_convert_type(
                jnp.zeros((total,), payload.dtype).at[:n].set(payload),
                jnp.int32,
            ).reshape(total // LANES, LANES)
        )
    interpret = resolve_interpret(cfg)
    row_off = 0
    pieces = []
    for idx, sz in enumerate(sizes):
        rows_p = sz * c_rows
        sls = [
            jax.lax.slice_in_dim(p, row_off, row_off + rows_p, axis=0)
            for p in planes
        ]
        if idx == len(sizes) - 1:
            pieces.append(list(_engine(sls, cfg, 2, rows_p * LANES)))
        else:
            # non-last pieces: native descending (key, tie) sort — see
            # _sort_arbn_keys_jit
            pieces.append(
                bitonic.sort_planes(
                    sls, c_rows, 2, interpret=interpret, descending=True
                )
            )
        row_off += rows_p
    acc = pieces[-1]
    for pd in reversed(pieces[:-1]):
        valley = [
            jnp.concatenate([a, b], axis=0) for a, b in zip(pd, acc)
        ]
        acc = bitonic.merge_valley_ascending(
            valley, c_rows, 2, interpret=interpret
        )
    outs = [p.reshape(-1) for p in acc]
    sorted_keys = (outs[0][:n].astype(jnp.uint32)) ^ _SIGN
    if with_payload:
        return sorted_keys, outs[2][:n]
    return sorted_keys, outs[1][:n]


def _use_decomposition(n: int, cfg: SortConfig) -> bool:
    """Route to the piece-merge path when pow2 padding would waste >10%
    and the size is large enough for the extra kernel shapes to pay off."""
    if cfg.strategy == "lax" or n < (1 << 22):
        return False
    total_pow2 = _pad_len(n)
    return total_pow2 * 10 > n * 11


def sort(keys, cfg: SortConfig | None = None):
    """Ascending sort of uint32 keys. Returns a uint32 array of same shape.

    Any N is supported: pow2-adjacent sizes pad to the next pow2; sizes
    where that would waste >10% route through the binary-decomposition +
    valley-merge path (pad bounded at ~3%)."""
    cfg = cfg or tuned()
    keys = _as_u32(keys)
    n = keys.shape[0]
    if n <= 1:
        return keys
    if _use_decomposition(n, cfg):
        return _sort_arbn_keys_jit(keys, cfg, n)
    return _sort_keys_jit(keys, cfg, n)


def argsort(keys, cfg: SortConfig | None = None):
    """Stable argsort: int32 permutation, ties keep original order."""
    cfg = cfg or tuned()
    keys = _as_u32(keys)
    n = keys.shape[0]
    if n <= 1:
        return jnp.zeros((n,), jnp.int32)
    if _use_decomposition(n, cfg):
        return _sort_arbn_stable_jit(keys, None, cfg, n, False)[1]
    return _sort_stable_jit(keys, None, cfg, n, False)[1]


def _encode_keys(keys):
    """Order-preserving uint32 encoding for supported key dtypes.

    uint32: identity; int32: flip sign bit; float32: sign-magnitude to
    lexicographic (non-negative -> set sign bit, negative -> complement) —
    total order with -inf < ... < -0.0 < +0.0 < ... < +inf < nan.
    """
    keys = jnp.asarray(keys)
    if keys.ndim != 1:
        raise ValueError("keys must be 1-D")
    if keys.dtype == jnp.uint32:
        return keys
    if keys.dtype == jnp.int32:
        return jax.lax.bitcast_convert_type(keys, jnp.uint32) ^ _SIGN
    if keys.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(keys, jnp.uint32)
        return jnp.where(
            (bits & _SIGN) != 0, ~bits, bits | _SIGN
        )
    raise TypeError(f"unsupported key dtype {keys.dtype}")


def _decode_keys(enc, dtype):
    if dtype == jnp.uint32:
        return enc
    if dtype == jnp.int32:
        return jax.lax.bitcast_convert_type(enc ^ _SIGN, jnp.int32)
    bits = jnp.where((enc & _SIGN) != 0, enc ^ _SIGN, ~enc)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


_SIGN64 = np.uint64(0x8000000000000000)


def _encode_keys64(keys: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 encoding of 64-bit key dtypes (numpy side:
    JAX runs x32 here, so 64-bit keys are split into two uint32 planes
    before they ever reach a device).  Same construction as _encode_keys:
    uint64 identity, int64 sign-bit flip, float64 sign-magnitude to
    lexicographic (total order -inf < ... < -0.0 < +0.0 < ... < +inf <
    nan, matching np.sort's nan-last placement)."""
    if keys.dtype == np.uint64:
        return keys
    if keys.dtype == np.int64:
        return keys.view(np.uint64) ^ _SIGN64
    bits = keys.view(np.uint64)
    return np.where((bits & _SIGN64) != 0, ~bits, bits | _SIGN64)


def _decode_keys64(enc: np.ndarray, dtype) -> np.ndarray:
    if dtype == np.uint64:
        return enc
    if dtype == np.int64:
        return (enc ^ _SIGN64).view(np.int64)
    bits = np.where((enc & _SIGN64) != 0, enc ^ _SIGN64, ~enc)
    return bits.view(np.float64)


def _sort_any64(keys: np.ndarray, descending: bool, cfg) -> np.ndarray:
    """64-bit dtype sort: order-preserving uint64 encoding, split into
    (hi, lo) uint32 planes, lexicographic two-plane engine sort
    (sort_u64), recombine + decode.  Descending inverts both planes
    (bit-not of the 64-bit encoding reverses the lexicographic order)."""
    enc = _encode_keys64(keys)
    if descending:
        enc = ~enc
    hi = (enc >> np.uint64(32)).astype(np.uint32)
    lo = (enc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    sh, sl = sort_u64(hi, lo, cfg)
    out = (
        np.asarray(sh).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(sl).astype(np.uint64)
    if descending:
        out = ~out
    return _decode_keys64(out, keys.dtype)


def sort_any(keys, descending: bool = False, cfg: SortConfig | None = None):
    """Sort uint32 / int32 / float32 / uint64 / int64 / float64 keys
    (ascending or descending).

    Implemented by order-preserving bit encodings over the uint32 engine —
    the reference supports uint32 only (SURVEY §2); wider dtype coverage is
    part of the query-executor surface.  64-bit dtypes take numpy arrays
    (x32 JAX would silently truncate them) and run through the two-plane
    lexicographic engine (sort_u64)."""
    cfg = cfg or tuned()
    np_keys = np.asarray(keys) if isinstance(keys, np.ndarray) else None
    if np_keys is not None and np_keys.dtype in (
        np.dtype(np.uint64), np.dtype(np.int64), np.dtype(np.float64)
    ):
        if np_keys.ndim != 1:
            raise ValueError("keys must be 1-D")
        return _sort_any64(np_keys, descending, cfg)
    keys = jnp.asarray(keys)
    enc = _encode_keys(keys)
    if descending:
        enc = ~enc
    out = sort(enc, cfg)
    if descending:
        out = ~out
    return _decode_keys(out, keys.dtype)


def _sort_pairs_any64(keys: np.ndarray, payload, descending: bool, cfg):
    """Stable 64-bit-key pairs: LSD two-pass composition over the stable
    engine — stable sort by the LOW uint32 half carrying (hi, payload),
    then stable sort by the HIGH half carrying (lo, payload).  Stability of
    each pass makes the result the unique stable (hi, lo, original-index)
    order (the reference's own LSD argument, radx_implement.inl:421-447,
    lifted from 8-bit digits to 32-bit halves)."""
    enc = _encode_keys64(keys)
    if descending:
        enc = ~enc
    hi = (enc >> np.uint64(32)).astype(np.uint32)
    lo = (enc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo_s, (hi_s, p_s) = sort_multi(lo, [hi, payload], cfg)
    hi_f, (lo_f, p_f) = sort_multi(np.asarray(hi_s), [lo_s, p_s], cfg)
    out = (
        np.asarray(hi_f).astype(np.uint64) << np.uint64(32)
    ) | np.asarray(lo_f).astype(np.uint64)
    if descending:
        out = ~out
    return _decode_keys64(out, keys.dtype), p_f


def sort_pairs_any(keys, payload, descending=False, cfg=None):
    """Stable key+payload sort for uint32 / int32 / float32 keys, plus
    uint64 / int64 / float64 numpy keys (x32 JAX would truncate them; the
    64-bit path splits into two uint32 planes and runs a stable LSD
    two-pass).  ±0.0 float keys order as -0.0 < +0.0 (the same total order
    as the 32-bit float path)."""
    cfg = cfg or tuned()
    np_keys = np.asarray(keys) if isinstance(keys, np.ndarray) else None
    if np_keys is not None and np_keys.dtype in (
        np.dtype(np.uint64), np.dtype(np.int64), np.dtype(np.float64)
    ):
        if np_keys.ndim != 1:
            raise ValueError("keys must be 1-D")
        return _sort_pairs_any64(np_keys, payload, descending, cfg)
    keys = jnp.asarray(keys)
    enc = _encode_keys(keys)
    if descending:
        enc = ~enc
    k, p = sort_pairs(enc, payload, cfg)
    if descending:
        k = ~k
    return _decode_keys(k, keys.dtype), p


def sort_u64(hi, lo, cfg: SortConfig | None = None):
    """Sort 64-bit keys given as (hi, lo) uint32 halves — lexicographic
    two-plane compare (num_cmp=2), a capability with no reference analogue.
    Returns sorted (hi, lo)."""
    cfg = cfg or tuned()
    hi = _as_u32(jnp.asarray(hi))
    lo = _as_u32(jnp.asarray(lo))
    if hi.shape != lo.shape:
        raise ValueError("hi/lo must match")
    n = hi.shape[0]
    if n <= 1:
        return hi, lo
    return _sort_u64_jit(hi, lo, cfg, n)


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _sort_u64_jit(hi, lo, cfg: SortConfig, n: int):
    total = _pad_len(n)
    hp = _key_plane(hi, total)
    lp = _key_plane(lo, total)
    outs = _engine([hp, lp], cfg, 2, n)
    h = (outs[0].reshape(-1)[:n].astype(jnp.uint32)) ^ _SIGN
    l = (outs[1].reshape(-1)[:n].astype(jnp.uint32)) ^ _SIGN
    return h, l


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _sort_multi_jit(keys, payloads, cfg: SortConfig, n: int):
    """Stable sort of uint32 keys with k ride-along i32 payload planes.

    All payload columns travel through the bitonic exchanges as extra
    planes — no post-sort gather (the XLA gather at 2^28 is the pathological
    primitive the engine avoids; see NOTES.md)."""
    total = _pad_len(n)
    planes = [_key_plane(keys, total), _iota_plane(total)]
    for p in payloads:
        planes.append(
            jax.lax.bitcast_convert_type(
                jnp.zeros((total,), p.dtype).at[:n].set(p), jnp.int32
            ).reshape(total // LANES, LANES)
        )
    if cfg.strategy == "lax":
        outs = jax.lax.sort(
            tuple(p.reshape(-1) for p in planes), num_keys=2
        )
    else:
        outs = [p.reshape(-1) for p in _engine(planes, cfg, 2, n)]
    sorted_keys = (outs[0][:n].astype(jnp.uint32)) ^ _SIGN
    return sorted_keys, [o[:n] for o in outs[2:]]


def sort_multi(keys, payloads, cfg: SortConfig | None = None):
    """Stable sort of uint32 keys carrying any number of 32-bit payload
    columns through the pipeline.  Returns (sorted_keys, payloads_out)."""
    cfg = cfg or tuned()
    keys = _as_u32(keys)
    payloads = [jnp.asarray(p) for p in payloads]
    for p in payloads:
        if p.shape != keys.shape:
            raise ValueError("payloads must match keys shape")
        if p.dtype.itemsize != 4:
            raise TypeError("payloads must be 32-bit dtypes")
    n = keys.shape[0]
    if n <= 1:
        return keys, payloads
    k, outs = _sort_multi_jit(keys, tuple(payloads), cfg, n)
    return k, [
        jax.lax.bitcast_convert_type(o, p.dtype)
        for o, p in zip(outs, payloads)
    ]


@functools.partial(jax.jit, static_argnames=("cfg", "n"))
def _sort_pairs_unique_jit(keys, payload_bits, cfg: SortConfig, n: int):
    """2-plane (key, payload) sort, num_cmp=1 — no iota tiebreak plane.

    Contract (caller-asserted): keys are UNIQUE and none equals
    0xFFFFFFFF.  Uniqueness makes stability vacuous (no ties to order) and
    the reserved sentinel keeps pad rows strictly after every real row, so
    the [:n] slice is exact.  ~1.5x less exchange work than the stable
    3-plane path."""
    total = _pad_len(n)
    kp = _key_plane(keys, total)
    pp = (
        jnp.zeros((total,), jnp.int32)
        .at[:n]
        .set(payload_bits)
        .reshape(total // LANES, LANES)
    )
    if cfg.strategy == "lax":
        k, v = jax.lax.sort((kp.reshape(-1), pp.reshape(-1)), num_keys=1)
    else:
        outs = _engine([kp, pp], cfg, 1, n)
        k, v = outs[0].reshape(-1), outs[1].reshape(-1)
    return (k[:n].astype(jnp.uint32)) ^ _SIGN, v[:n]


def sort_pairs(keys, payload, cfg: SortConfig | None = None,
               assume_unique: bool = False):
    """Stable key+payload sort — the capability RadX stubs but never ships
    (indiction/permutation dispatches absent from Radix::command,
    radx_implement.inl:421-447).

    assume_unique=True: the caller asserts keys are unique and none equals
    0xFFFFFFFF (the padding sentinel).  The sort then drops the iota
    tiebreak plane — 2 planes instead of 3 through every exchange
    (stability is vacuous without ties) — measurably faster on the
    permutation-style workloads the reference benchmarks
    (src/test/sort.cpp:348-350 sorts a shuffled 0..N-1 permutation).
    Violating the contract silently mis-attaches payloads among equal
    keys / drops the 0xFFFFFFFF row's payload — it is an assertion, not a
    hint."""
    cfg = cfg or tuned()
    keys = _as_u32(keys)
    payload = jnp.asarray(payload)
    if payload.shape != keys.shape:
        raise ValueError("payload must match keys shape")
    if payload.dtype.itemsize != 4:
        raise TypeError("payload must be a 32-bit dtype")
    n = keys.shape[0]
    if n <= 1:
        return keys, payload
    if assume_unique:
        k, p = _sort_pairs_unique_jit(
            keys, jax.lax.bitcast_convert_type(payload, jnp.int32), cfg, n
        )
    elif _use_decomposition(n, cfg):
        k, p = _sort_arbn_stable_jit(keys, payload, cfg, n, True)
    else:
        k, p = _sort_stable_jit(keys, payload, cfg, n, True)
    return k, jax.lax.bitcast_convert_type(p, payload.dtype)
