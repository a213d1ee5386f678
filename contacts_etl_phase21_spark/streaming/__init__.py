"""Structured Streaming extension (SURVEY.md §2.11).

The reference is batch-only; this package adds the streaming ingestion
variant the engine needs at scale: watermarked windowed aggregation and
sessionization over the events table, with batch twins for oracle
checking.
"""

from contacts_etl_phase21_spark.streaming.events import (
    read_events_stream, sessionized_counts_batch,
    sliding_window_counts_batch, stream_sessionized_counts,
    stream_sliding_counts, stream_windowed_counts,
    windowed_counts_batch,
)
from contacts_etl_phase21_spark.streaming.er_ingest import (
    incremental_er_assignments,
)
from contacts_etl_phase21_spark.streaming.stateful import (
    first_event_batch, stream_first_event,
)

__all__ = [
    "read_events_stream", "stream_windowed_counts",
    "stream_sliding_counts", "stream_sessionized_counts",
    "sliding_window_counts_batch",
    "windowed_counts_batch", "sessionized_counts_batch",
    "first_event_batch", "stream_first_event",
    "incremental_er_assignments",
]
