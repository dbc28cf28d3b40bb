"""Structured Streaming surface (SURVEY.md §2.11 — engine extension).

The reference has no streaming (batch pipeline over daily snapshot
CSVs); its closest analogues are the batch window ops (W2-W11) and
NaN-interpolation "late data" handling. This module exposes the same
event-table semantics as true streams: tumbling / sliding / session
windows with watermark-based late-data handling, plus a stateful
running aggregate. The batch queries in queries/events_ts.py are the
oracle-checked twins; tests assert stream == batch on the same data
(the Structured Streaming guarantee worth testing, and the property
that makes a 100 TB backfill and the live stream share one code path).
"""

from engage_spark.streaming.jobs import (  # noqa: F401
    click_purchase_join_stream,
    dedup_events_stream,
    cdc_merge_stream,
    incremental_ingest_stream,
    running_user_stats_stream,
    sessionize_stream,
    sliding_counts_stream,
    stream_events_from_parquet,
    stream_parquet,
    tumbling_counts_stream,
)
