"""Structured Streaming parity (reference §2.8 semantics, strictly
stronger: event-time windows + watermarks where the reference has only
processing-time timers)."""

from .windows import (  # noqa: F401
    session_gap_agg,
    stateful_count_conclude,
    streaming_count,
    streaming_incremental_tokens,
    tumbling_count,
)
