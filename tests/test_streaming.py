"""Streaming == batch on the same data (the Structured Streaming
contract the module is built on)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.streaming import (
    sessionize_stream,
    stream_events_from_parquet,
    tumbling_counts_stream,
)
from engage_spark.streaming.jobs import run_available_now


def _drain(spark, stream_df, tmp_path, name) -> pd.DataFrame:
    run_available_now(stream_df, str(tmp_path), name)
    return spark.read.parquet(f"{tmp_path}/{name}").toPandas()


def test_tumbling_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = tumbling_counts_stream(stream_events_from_parquet(spark, sf_dir))
    got = _drain(spark, stream, tmp_path, "tumbling").sort_values(
        ["win_start", "event_type"]
    ).reset_index(drop=True)

    ev = table(spark, sf_dir, "events")
    exp = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"), "event_type",
            "n_events", "sum_value",
        )
        .toPandas()
        .sort_values(["win_start", "event_type"])
        .reset_index(drop=True)
    )
    # append-mode watermark semantics: windows not yet closed when the
    # stream drains stay in state. Every EMITTED row must match batch
    # exactly; anything withheld must be within the watermark horizon
    # of the stream's end.
    merged = got.merge(exp, on=list(got.columns), how="left", indicator=True)
    assert (merged._merge == "both").all(), "streamed row not in batch result"
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = pd.Timestamp(max_ts) - pd.Timedelta(hours=2)  # watermark+window
    missing = exp.merge(got, on=list(got.columns), how="left", indicator=True)
    held_back = missing[missing._merge != "both"]
    assert (pd.to_datetime(held_back.win_start) >= horizon).all()
    assert len(got) >= len(exp) - 4  # only the tail is withheld


def test_session_stream_matches_batch(spark, sf_dir, tmp_path):
    stream = sessionize_stream(stream_events_from_parquet(spark, sf_dir))
    got = _drain(spark, stream, tmp_path, "sessions")

    ev = table(spark, sf_dir, "events")
    exp = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
        .toPandas()
    )
    # emitted sessions match the batch twin exactly; withheld ones are
    # only those still open within the watermark horizon at stream end
    merged = got.merge(exp, on=list(got.columns), how="left", indicator=True)
    assert (merged._merge == "both").all(), "streamed session not in batch result"
    max_ts = pd.Timestamp(ev.agg(F.max("ts")).collect()[0][0])
    horizon = max_ts - pd.Timedelta(hours=1)
    missing = exp.merge(got, on=list(got.columns), how="left", indicator=True)
    held_back = missing[missing._merge != "both"]
    assert (pd.to_datetime(held_back.session_end) >= horizon).all()
    # sessions are per-user, disjoint in time
    g = got.sort_values(["user_id", "session_start"])
    for _, u in g.groupby("user_id"):
        starts = u.session_start.to_numpy()
        ends = u.session_end.to_numpy()
        assert (starts[1:] >= ends[:-1]).all()


def test_watermark_present_in_plan(spark, sf_dir):
    stream = tumbling_counts_stream(stream_events_from_parquet(spark, sf_dir))
    assert stream.isStreaming
    plan = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_running_stats_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState: final per-user (count, ewma) after
    draining the whole stream equals a batch computation of the same
    recurrence."""
    from engage_spark.streaming import running_user_stats_stream

    stream = running_user_stats_stream(stream_events_from_parquet(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM user_stats")
        .toPandas()
        .sort_values("user_id")
        .drop_duplicates("user_id", keep="last")  # update mode re-emits per batch
        .reset_index(drop=True)
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    alpha = 0.2
    rows = []
    for uid, g in ev.groupby("user_id"):
        ewma = None
        for v in g["value"]:
            ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        rows.append((uid, len(g), ewma))
    exp = pd.DataFrame(rows, columns=["user_id", "n_events", "ewma_value"])
    merged = got.merge(exp, on="user_id", suffixes=("_got", "_exp"))
    assert len(merged) == len(exp)
    assert (merged.n_events_got == merged.n_events_exp).all()
    assert (merged.ewma_value_got - merged.ewma_value_exp).abs().max() < 1e-9


def test_streaming_dedup_collapses_redelivered_events(spark, sf_dir, tmp_path):
    """Feed the same events file twice (an at-least-once redelivery) —
    the watermarked streaming dedup must emit each event_id once."""
    import shutil

    from pyspark.sql import types as T

    from engage_spark.io import _nano_ts_fields
    from engage_spark.streaming import dedup_events_stream

    src = f"{sf_dir}/events.parquet"
    redelivered = tmp_path / "redelivered"
    redelivered.mkdir()
    shutil.copy(src, redelivered / "delivery_1.parquet")
    shutil.copy(src, redelivered / "delivery_2.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = table(spark, sf_dir, "events").schema
    nano = set(_nano_ts_fields(src))
    raw_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nano else f.dataType)
            for f in batch_schema.fields
        ]
    )
    stream = spark.readStream.schema(raw_schema).format("parquet").load(
        str(redelivered)
    )
    for name in nano:
        stream = stream.withColumn(name, F.expr(f"timestamp_micros({name} div 1000)"))

    got = _drain(spark, dedup_events_stream(stream), tmp_path, "dedup")
    n_unique = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert len(got) == n_unique
    assert got.event_id.is_unique
