"""Utilities: timing/profiling/metrics (SURVEY §5 tracing), failure
detection (guard), and sanitizers (debug)."""

from radx_tpu.utils.timing import time_op, Metrics  # noqa: F401
from radx_tpu.utils.guard import (  # noqa: F401
    DeviceTimeout,
    retry_deterministic,
    watchdog,
)
