"""Structured Streaming variants of the ingest + merge path."""

from .ingest import (
    dedup_urls,
    queue_status_stream,
    run_merge_sink,
    stream_source,
    windowed_counts,
)

__all__ = [
    "dedup_urls",
    "queue_status_stream",
    "run_merge_sink",
    "stream_source",
    "windowed_counts",
]
