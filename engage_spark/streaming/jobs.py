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
