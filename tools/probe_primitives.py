"""Microbenchmark the permutation-primitive candidates on the real chip.

The central design risk (SURVEY §7 "hard parts" #1) is the global stable
scatter: TPU has no native random-access scatter.  This probe measures every
candidate global-movement primitive so the scatter strategy in
radx_tpu.config.SortConfig is chosen from data, not guesses.

Timing methodology: the remote-tunnel dispatch overlaps with host wall-clock,
so each op is iterated K times *inside* a single jit with a serial data
dependency (xor with the loop index defeats CSE); one block_until_ready at
the end. Per-iteration time = total / K.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_op(f, x, extra=None, iters=8, warmup=1):
    """Time f applied iters times with a serial dependency inside one jit."""

    def loop(x, *extra):
        def body(i, x):
            y = f(x ^ i.astype(jnp.uint32), *extra)
            return y.astype(jnp.uint32) if y.dtype != jnp.uint32 else y

        return jax.lax.fori_loop(0, iters, body, x)

    g = jax.jit(loop)
    args = (x,) + tuple(extra or ())

    def run():
        # device_get of a data-dependent scalar: cannot complete before the
        # computation actually ran (block_until_ready alone is unreliable
        # over the axon tunnel).
        return jax.device_get(jnp.max(g(*args)[:64]))

    run()  # compile
    for _ in range(warmup):
        run()
    t0 = time.perf_counter()
    run()
    return (time.perf_counter() - t0) / iters


def report(name, n, dt):
    print(
        f"{name:36s} n={n:>10d}  {dt*1e3:9.3f} ms  {n/dt/1e9:8.3f} Gkeys/s",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)

    for n in (1 << 23, 1 << 26):
        keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        jax.block_until_ready((keys, perm))

        report("copy (read+write)", n, bench_op(lambda x: x + jnp.uint32(1), keys))
        report("lax.sort u32", n, bench_op(jax.lax.sort, keys))
        report(
            "lax.sort pairs (ret keys)",
            n,
            bench_op(lambda x: jax.lax.sort((x, x ^ jnp.uint32(7)), num_keys=1)[0], keys),
        )
        report("gather x[perm]", n, bench_op(lambda x, i: x[i], keys, extra=(perm,)))
        report(
            "scatter .at[perm].set",
            n,
            bench_op(
                lambda x, i: jnp.zeros_like(x).at[i].set(x, unique_indices=True),
                keys,
                extra=(perm,),
            ),
        )
        report("cumsum i32", n, bench_op(lambda x: jnp.cumsum(x.astype(jnp.int32)).astype(jnp.uint32), keys))

        def hist(x):
            d = (x & jnp.uint32(0xFF)).astype(jnp.int32)
            oh = jax.nn.one_hot(d.reshape(-1, 512), 256, dtype=jnp.bfloat16)
            h = jnp.sum(oh, axis=(0, 1)).astype(jnp.uint32)
            return jnp.broadcast_to(h, (x.shape[0] // 256, 256)).reshape(-1)

        report("one-hot histogram256 (bf16)", n, bench_op(hist, keys))

        report(
            "lax.sort 8-bit digit shuffle",
            n,
            bench_op(
                lambda x: jax.lax.sort((x & jnp.uint32(0xFF), x), num_keys=1)[1], keys
            ),
        )

        def argsort_perm(x):
            return jax.lax.sort(
                (x, jax.lax.iota(jnp.int32, x.shape[0])), num_keys=1
            )[1].astype(jnp.uint32)

        report("argsort (sort key+iota)", n, bench_op(argsort_perm, keys))
        print(flush=True)


if __name__ == "__main__":
    main()
