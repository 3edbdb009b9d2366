"""Probe a single primitive honestly: usage: probe_one.py <op> <log2n> [iters].

Timing: iters serial-dependent applications inside one jit, then device_get
of a small data-dependent slice (the only reliable sync over the axon relay;
block_until_ready alone under-reports).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    op, log2n = sys.argv[1], int(sys.argv[2])
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n = 1 << log2n
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
    extra = ()
    if op in ("gather", "scatter"):
        extra = (jnp.asarray(rng.permutation(n).astype(np.int32)),)

    fns = {
        "copy": lambda x: x + jnp.uint32(1),
        "laxsort": jax.lax.sort,
        "laxsort_pairs": lambda x: jax.lax.sort((x, x ^ jnp.uint32(7)), num_keys=1)[1],
        "gather": lambda x, i: x[i],
        "scatter": lambda x, i: jnp.zeros_like(x).at[i].set(x, unique_indices=True),
        "cumsum": lambda x: jnp.cumsum(x.astype(jnp.int32)).astype(jnp.uint32),
        "digit_shuffle": lambda x: jax.lax.sort((x & jnp.uint32(0xFF), x), num_keys=1)[1],
        "hist256": lambda x: jnp.broadcast_to(
            jnp.sum(
                jax.nn.one_hot(
                    (x & jnp.uint32(0xFF)).astype(jnp.int32).reshape(-1, 512),
                    256,
                    dtype=jnp.bfloat16,
                ),
                axis=(0, 1),
            ).astype(jnp.uint32),
            (x.shape[0] // 256, 256),
        ).reshape(-1),
    }
    f = fns[op]

    def loop(x, *e):
        def body(i, x):
            return f(x ^ i.astype(jnp.uint32), *e)

        return jax.lax.fori_loop(0, iters, body, x)

    g = jax.jit(loop)

    def run():
        return jax.device_get(g(keys, *extra)[:16]).sum()

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    run()
    t0 = time.perf_counter()
    run()
    dt = (time.perf_counter() - t0) / iters
    print(
        f"RESULT {op:16s} n=2^{log2n}  {dt*1e3:9.3f} ms/iter  "
        f"{n/dt/1e9:8.3f} Gkeys/s  (compile+first {compile_s:.1f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
