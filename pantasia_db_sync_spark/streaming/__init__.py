"""Structured Streaming variant of the sync transform (SURVEY.md §2.G).

The reference emulates a stream with a poll-sleep loop over time
periods (/root/reference/app/main.py:43-94); here the same semantics
are native Structured Streaming:

- tip tracking + late-data buffer  → ``withWatermark`` (G1/G5)
- 120-minute period chunking       → tumbling ``F.window``      (G2)
- 10 s poll backoff                → ``trigger(processingTime)`` (G3)
- per-period transactional commit  → ``foreachBatch`` + TableStore (A8)
- graceful SIGINT shutdown         → ``query.stop()``            (G6)
- replay idempotence               → ``dropDuplicatesWithinWatermark`` (G5)
"""

from .sync_stream import (
    dedup_stream,
    running_totals_stream,
    events_stream,
    foreach_batch_sync,
    latest_state_stream,
    session_window_counts,
    sliding_window_counts,
    tumbling_window_counts,
)

__all__ = [
    "events_stream",
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_window_counts",
    "dedup_stream",
    "running_totals_stream",
    "latest_state_stream",
    "foreach_batch_sync",
]
