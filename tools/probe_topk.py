"""Measure top_k on HW vs full-sort-then-slice and jax.lax.top_k.

The selection path (ops/topk.py) runs one chunk-sort grid pass + a tiny
final sort; the full sort pays every cross-chunk merge level on top of the
same chunk pass.  Expected win grows with N (the merge levels are the log²
term).  Chained timing per utils/timing.py discipline; correctness asserted
against the stable NumPy model before any timing is reported.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radx_tpu.config import tuned
from radx_tpu.ops.sort import _encode_keys
from radx_tpu.ops import topk as topk_mod
from radx_tpu.utils.timing import time_op


def main():
    cfg = tuned()
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    for logn in (22, 24, 26):
        n = 1 << logn
        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        x = jnp.asarray(keys)

        # correctness first
        vals, idx = topk_mod.top_k(x, k, True, cfg)
        enc = keys.astype(np.uint64)
        order = np.argsort(~enc, kind="stable")[:k].astype(np.int32)
        assert np.array_equal(np.asarray(jax.device_get(idx)), order)
        assert np.array_equal(np.asarray(jax.device_get(vals)), keys[order])

        # chained timing: fold the (tiny) output back into the input to
        # chain data dependencies without changing the distribution
        # real data dependency between chained steps (a `* 0` fold lets
        # XLA DCE the whole op): XOR the top value back into every key —
        # an XOR by a constant keeps the uniform distribution uniform.
        def step_topk(v):
            tv, ti = topk_mod._top_k_jit(~_encode_keys(v), cfg, n, k, True)
            return v ^ tv[0]

        def step_sortslice(v):
            tv, ti = topk_mod._top_k_jit(~_encode_keys(v), cfg, n, k, False)
            return v ^ tv[0]

        def step_lax(v):
            tv, ti = jax.lax.top_k(v, k)
            return v ^ tv[0]

        for name, f in (
            ("topk_select", step_topk),
            ("sort_then_slice", step_sortslice),
            ("lax.top_k", step_lax),
        ):
            m = time_op(f, x, name=f"{name} 2^{logn} k={k}", items=n)
            print(m.row(), flush=True)


if __name__ == "__main__":
    main()
