"""Validate the Pallas building blocks the bitonic sorter needs.

Checks (interpret mode on CPU; real compile on TPU):
  * broadcasted_iota inside kernels
  * pltpu.roll with *dynamic* shift on lane axis and sublane axis
  * jax.lax.fori_loop with dynamic distance driving roll/select
  * a full single-tile bitonic sort vs np.sort
"""

import os
import sys

if "cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = jax.devices()[0].platform != "tpu"
print("platform:", jax.devices()[0].platform, "interpret:", INTERP, flush=True)


def bitonic_tile_kernel(x_ref, o_ref):
    """Sort a (R,128) i32 tile ascending in flat row-major order."""
    R, L = x_ref.shape
    n = R * L
    logn = n.bit_length() - 1
    x = x_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    flat = rows * L + lanes

    def substage(dj, x, k):
        d = (1 << dj).astype(jnp.int32) if hasattr(dj, "dtype") else jnp.int32(1 << dj)
        # partner value at flat index (flat ^ d), via two cyclic rolls
        lane_sh = d % L
        row_sh = d // L
        plus = pltpu.roll(pltpu.roll(x, -lane_sh, 1), -row_sh, 0)
        minus = pltpu.roll(pltpu.roll(x, lane_sh, 1), row_sh, 0)
        has_bit = (flat & d) != 0
        p = jnp.where(has_bit, minus, plus)
        up = (flat & k) == 0  # ascending region
        keep_min = ((flat & d) == 0) == up
        lo = jnp.minimum(x, p)
        hi = jnp.maximum(x, p)
        return jnp.where(keep_min, lo, hi)

    def stage(kk, x):
        k = jnp.int32(1) << kk

        def sub(i, x):
            dj = kk - 1 - i
            return substage(jnp.int32(1) * dj, x, k)

        return jax.lax.fori_loop(0, kk, sub, x)

    def all_stages(x):
        def body(kk, x):
            return stage(kk, x)

        return jax.lax.fori_loop(1, logn + 1, body, x)

    o_ref[:] = all_stages(x)


def run_tile(R=8):
    rng = np.random.default_rng(0)
    x = rng.integers(-(2**31), 2**31, (R, 128), dtype=np.int32)
    out = pl.pallas_call(
        bitonic_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(jnp.asarray(x))
    got = np.asarray(jax.device_get(out)).reshape(-1)
    want = np.sort(x.reshape(-1))
    ok = np.array_equal(got, want)
    print(f"bitonic tile R={R}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        print("got ", got[:16], "...", got[-8:])
        print("want", want[:16], "...", want[-8:])
    return ok


if __name__ == "__main__":
    ok = True
    for R in (8, 32, 256):
        ok &= run_tile(R)
    sys.exit(0 if ok else 1)
