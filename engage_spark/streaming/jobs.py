"""Streaming jobs over the events table.

Each job is a readStream→transform pair returning an unstarted
DataFrame; callers attach writeStream with their sink/trigger. Tests
run Trigger.AvailableNow against the driver parquet and compare to the
batch twins — same transformation code path, which is the point:
window(), watermark and session_window work identically in batch and
streaming, so one declaration serves both the live stream and the
backfill.

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped instead of growing state forever); session windows merge in
the state store keyed by (user_id, session); shuffle partitioning is
the same exchange as the batch groupBy — nothing here is
driver-resident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engage_spark.io import table

WATERMARK = "1 hour"


def stream_events_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (file source; schema pinned —
    streaming sources need explicit schemas).

    The file source wants a directory, so the scan targets sf_dir with
    a pathGlobFilter. The testdata writes TIMESTAMP(NANOS), which the
    reader surfaces as long under the legacy flag (same handling as
    io.table); microsecond timestamps are rebuilt in the stream."""
    from engage_spark.io import _nano_ts_fields

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    batch_schema = table(spark, sf_dir, "events").schema
    nano_fields = set(_nano_ts_fields(path))
    raw_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nano_fields else f.dataType)
            for f in batch_schema.fields
        ]
    )
    df = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    for name in nano_fields:
        df = df.withColumn(name, F.expr(f"timestamp_micros({name} div 1000)"))
    return df


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """1-hour tumbling window counts/sums with watermark late-data
    handling — streaming twin of ev_tumbling_window_agg."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(events: DataFrame) -> DataFrame:
    """6-hour window sliding every hour — streaming twin of
    ev_sliding_window_agg."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "6 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("win_start"), "n_events")
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based) per user — the streaming-native form
    of the batch gap-sessionization (ev_sessionize_gap). State-store
    sessions merge as events arrive; the watermark closes them."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Streaming exact dedup — the exactly-once guard an at-least-once
    event log needs (re-delivered rows collapse to one). The streaming
    twin of x1_exact_dedup's hash-groupBy shape, keyed on event_id.

    ``dropDuplicatesWithinWatermark`` is the scale-correct form: plain
    streaming dropDuplicates keeps EVERY seen key in the state store
    forever (unbounded at 100 TB/day); the watermark variant evicts keys
    once they age past the horizon, bounding state to one key per event
    inside the window while still catching any duplicate delivered
    within it."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, out_dir: str, name: str) -> None:
    """Drain the stream with Trigger.AvailableNow into a parquet sink —
    the batch-of-a-stream execution mode (used by tests and backfills)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{out_dir}/{name}")
        .option("checkpointLocation", f"{out_dir}/{name}_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_stats_stream(events: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count and EWMA of `value`, carried in the state store
    across micro-batches (the streaming form of a per-group recurrence —
    the same family as the reference's cumulative kernels W10/W11, but
    with state that outlives any single batch).

    State is O(1) per user (count, ewma); the state store shuffles on
    user_id exactly like a batch groupBy, so a 100 TB backfill and the
    live stream have the same partitioning story.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("ewma_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, ewma = state.get if state.exists else (0, None)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                n += 1
                ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        state.update((n, ewma))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_value": [ewma]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
