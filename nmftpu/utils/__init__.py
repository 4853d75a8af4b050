"""Utilities: metrics/observability (SURVEY.md §5.1, §5.5) and misc."""

from nmftpu.utils.metrics import (
    JsonlLogger,
    flops_per_iteration,
    trace_session,
)

__all__ = ["JsonlLogger", "flops_per_iteration", "trace_session"]
