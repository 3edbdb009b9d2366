"""Multi-chip / multi-host layer — the capability the reference lacks
entirely (SURVEY §2e: no NCCL/MPI/sockets anywhere; single device, single
queue).  TPU-native design: jax.sharding.Mesh + shard_map; XLA collectives
(psum for global digit histograms, all_to_all for the key shuffle) ride ICI
within a slice and DCN across hosts.
"""

from radx_tpu.parallel.mesh import make_mesh  # noqa: F401
from radx_tpu.parallel import dist_sort  # noqa: F401
