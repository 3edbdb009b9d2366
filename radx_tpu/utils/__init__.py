"""Utilities: timing/profiling/metrics — SURVEY §5's tracing subsystem."""

from radx_tpu.utils.timing import time_op, Metrics  # noqa: F401
