"""Structured Streaming operators (engine extension; the reference is
strictly batch — SURVEY.md §2j)."""

from data_export_tool_spark.streaming.events import (  # noqa: F401
    hourly_counts_stream,
    read_events_stream,
    sessionize_stream,
)
