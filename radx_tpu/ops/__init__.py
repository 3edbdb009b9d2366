"""Public operator layer — the analogue of RadX's Sort API layer
(radx::Sort<Radix> / radx::InputInterface, radx_internal.hpp:49-134), plus
the relational operators (filter / hash aggregate / hash join) that extend
the engine into a vectorized query executor.
"""

from radx_tpu.ops import sort  # noqa: F401  (submodule, not the function)
