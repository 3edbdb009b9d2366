"""radx_tpu — a TPU-native vectorized query-execution engine.

Built from scratch (JAX / XLA / Pallas / pjit) with the capabilities of the
RadX Vulkan radix-sort library (/root/reference), re-designed TPU-first:

  * Single-chip sorts of uint32/int32/float32 keys (+ payloads) as Pallas
    kernels.  Two engines behind one API (ops/sort.py): the flagship
    bitonic merge network (static data movement — rolls, lane gathers,
    block exchanges), and the radix distribution sort
    (strategy="radix", kernels/radix_sort.py) realizing the reference's
    counting → partition → scattering pipeline at chunk granularity:
    per-chunk digit histograms + hierarchical scans (kernels/radix.py,
    the counting.comp/partition.comp analogues on the MXU) drive
    skew-aware splitters, the slot-pack kernel scatters runs, and
    per-bucket VMEM slot-merges finish.  RadX's subgroup-partitioned
    ballot ranking
    (ballotlib.glsl:112-144) becomes one-hot / nibble-outer-product matmul
    ranking on the MXU in VMEM tiles (kernels/radix.py, kernels/aggregate.py).
  * Relational operators on the same primitives: filter, hash aggregate
    (sort-based + dense MXU one-hot contraction), merge/hash join.
  * Multi-chip / multi-host scaling via jax.sharding.Mesh + shard_map
    (parallel/dist_sort.py): local sort → all_gather'ed sample splitters
    (skew-bounded: every device receives ≤ N/D + N/(64·D) keys under any
    distribution) → slot-packed ppermute exchange waves overlapped with
    pairwise run merges.
  * Bit-exact CPU oracles (NumPy + native C++) as the correctness gate.
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA/Mosaic compile cache — the analogue of the reference's
    vk::PipelineCache (radx_implement.inl:269-273), which it creates but
    never serializes.  Ours persists across processes: remote Mosaic
    compiles of the unrolled sort networks cost minutes, once."""
    # CPU-only runs (CI interpret mode; conftest sets JAX_PLATFORMS=cpu)
    # must NOT use the persistent cache: interpret-mode executables
    # serialize to multi-GB blobs whose compression pass segfaults the
    # process (observed on test_relational's join_merge_multi).  This JAX
    # version has no max-entry-size knob, so gate on the platform instead.
    if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import jax

        cache = _os.environ.get(
            "RADX_TPU_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from radx_tpu.config import SortConfig, DEFAULT, tuned  # noqa: F401,E402
from radx_tpu.ops.sort import (  # noqa: F401,E402
    argsort,
    sort,
    sort_any,
    sort_pairs,
    sort_pairs_any,
    sort_u64,
)
from radx_tpu.ops.filter import filter_columns  # noqa: F401,E402
from radx_tpu.ops.topk import top_k  # noqa: F401,E402
from radx_tpu.ops.distinct import unique  # noqa: F401,E402
from radx_tpu.ops.groupby import groupby, groupby_dense  # noqa: F401,E402
from radx_tpu.ops.table import Table  # noqa: F401,E402
from radx_tpu.ops.lazy import LazyTable  # noqa: F401,E402

__version__ = "0.4.0"
