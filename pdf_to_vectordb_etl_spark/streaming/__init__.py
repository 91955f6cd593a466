"""Structured Streaming surface (SURVEY §2.11 T1-T4)."""

from .pipeline import (  # noqa: F401
    read_page_stream,
    run_incremental_etl,
    stream_event_counts,
)
