"""Prototype: factored one-hot MXU permutation of 2048-element subtiles.

The NOTES.md round-2 design: applying out[dest[i]] = x[i] for a subtile of
S = 2048 as  tmp = oh_hi^T @ (oh_lo * x)  with dest factored into
(hi, lo) = (dest >> 5, dest & 31) — exact because dest is a permutation, so
every (hi, lo) cell receives exactly one term.  u32 payload split into two
exact-in-f32 u16 halves.

Measures correctness (vs numpy take) and throughput over a grid of
subtiles, each with its own permutation.  Usage:
    python tools/probe_mxu_permute.py [cpu]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 2048
ROWS = S // 128


def _permute_kernel(x_ref, dest_ref, out_ref):
    # blocks arrive as (1, S, 1): element index along sublanes, so the
    # one-hot construction broadcasts straight into (S, 64)/(S, 32)
    col = dest_ref[0]  # (S, 1) i32
    xcol = x_ref[0]  # (S, 1) i32 (u32 bits)
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    # bf16 operands: the v5e MXU computes in bf16 (Mosaic demotes f32
    # matmuls — observed as 8-bit-mantissa rounding), so split the payload
    # into 4 byte planes: 0/1 one-hots and bytes <= 255 are bf16-exact, and
    # each output cell is a single product accumulated in f32.
    oh_hi = ((col >> 5) == hi_iota).astype(jnp.bfloat16)  # (S, 64)
    oh_lo = ((col & 31) == lo_iota).astype(jnp.bfloat16)  # (S, 32)

    # (S, 128) operand without jnp.concatenate (bf16 lane-concat miscompiles
    # on this Mosaic version): lane j holds one-hot(lo) * byte_{3 - j//32}.
    j128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    match = ((col & 31) == (j128 & 31)).astype(jnp.bfloat16)  # (S, 128)
    # lane j carries byte 3 - j//32: select it with a per-lane shift
    shift = 8 * (3 - (j128 >> 5))  # (1, 128)
    bytes_bcast = (
        jax.lax.shift_right_logical(xcol, shift) & 0xFF
    ).astype(jnp.bfloat16)  # (S, 128)
    b = match * bytes_bcast

    tmp = jax.lax.dot_general(
        oh_hi,
        b,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (64, 128): 4 byte planes of 32 lanes each
    # byte-plane recombination happens outside the kernel: in-kernel lane
    # slicing of this matmul result miscompiles (half the lanes of the
    # second 32-lane group read as 0 on this Mosaic version)
    out_ref[0] = tmp


def permute(x, dest, interpret):
    """x, dest: (T, 16, 128) i32; out[t][dest[t][i]] = x[t][i]."""
    T = x.shape[0]
    spec = pl.BlockSpec((1, S, 1), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((1, 64, 128), lambda i: (i, 0, 0))
    tmp = pl.pallas_call(
        _permute_kernel,
        grid=(T,),
        in_specs=[spec, spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((T, 64, 128), jnp.int32),
        interpret=interpret,
    )(x.reshape(T, S, 1), dest.reshape(T, S, 1))
    out = (
        (tmp[:, :, 0:32] << 24)
        | (tmp[:, :, 32:64] << 16)
        | (tmp[:, :, 64:96] << 8)
        | tmp[:, :, 96:128]
    )
    return out.reshape(T, ROWS, 128)


def main():
    interpret = "cpu" in sys.argv
    rng = np.random.default_rng(0)
    T = 256  # 512K elements
    x = rng.integers(0, 2**32, (T, ROWS, 128), dtype=np.uint32).astype(np.int64)
    x = (x - 2**31).astype(np.int32)  # arbitrary i32 bits
    dest = np.stack([rng.permutation(S).astype(np.int32).reshape(ROWS, 128) for _ in range(T)])

    f = jax.jit(functools.partial(permute, interpret=interpret))
    out = np.asarray(jax.device_get(f(jnp.asarray(x), jnp.asarray(dest))))
    want = np.empty_like(x)
    for t in range(T):
        want[t].reshape(-1)[dest[t].reshape(-1)] = x[t].reshape(-1)
    print("correct:", np.array_equal(out, want), flush=True)

    if not interpret:
        def chain(k):
            @jax.jit
            def g(v, d):
                for _ in range(k):
                    v = permute(v, d, False)
                return v
            return g
        f1, f8 = chain(1), chain(8)
        xj, dj = jnp.asarray(x), jnp.asarray(dest)
        def run(fn):
            t0 = time.perf_counter()
            jax.device_get(fn(xj, dj).reshape(-1)[:8])
            return time.perf_counter() - t0
        run(f1), run(f8)
        t1 = min(run(f1) for _ in range(3))
        t8 = min(run(f8) for _ in range(3))
        per = (t8 - t1) / 7
        n = T * S
        print(f"permute: {per*1e3:.3f} ms per pass over {n} elems = "
              f"{n/per/1e9:.2f} G elems/s", flush=True)


if __name__ == "__main__":
    main()
