"""Structured-Streaming twins registered as driver-checked queries.

The streaming transformations live in `engage_spark.streaming.jobs`;
pytest already drains them with Trigger.AvailableNow and compares to
the batch forms. These queries put that same execution path under
the DRIVER's hash-compare signal: each runs a real streaming query
(readStream → watermark/window/state → memory sink, AvailableNow
trigger), then returns the sink table, which must hash-match the same
DuckDB oracle the batch twin uses. Streaming correctness stops being
"trust the pytest" and becomes a green CORRECTNESS row.

Scale notes: AvailableNow is the backfill execution mode — the same
declaration runs unbounded with a real sink; the memory sink here holds
only the aggregated/deduped result at check scale (windows x types, or
one row per unique event), never the raw stream. Watermarks bound the
state store exactly as in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.registry import query
from engage_spark.streaming.jobs import (
    click_purchase_join_stream,
    running_user_stats_stream,
    sliding_counts_stream,
    stream_events_from_parquet,
    tumbling_counts_stream,
)

# memory-sink names must be unique per started query within a session
_SINK_SEQ = {"n": 0}


def _drain_to_memory(stream_df: DataFrame, prefix: str, mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink and return the sink table."""
    _SINK_SEQ["n"] += 1
    name = f"{prefix}_{_SINK_SEQ['n']}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@query(
    "st_tumbling_window_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    covers=["STREAM-T"],
)
def st_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window aggregate, executed as an actual
    streaming query (readStream → watermark → window agg → memory sink,
    AvailableNow) and checked against the SAME oracle as its batch twin
    ev_tumbling_window_agg. Complete output mode: with AvailableNow the
    watermark only advances at batch end, so append would withhold the
    final open windows; complete emits every window, which is what the
    batch-equivalence check needs."""
    ev = stream_events_from_parquet(spark, sf_dir)
    out = _drain_to_memory(tumbling_counts_stream(ev), "st_tumbling", "complete")
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "st_sliding_window_agg",
    oracle="""
    WITH offs(off) AS (VALUES (0), (1))
    SELECT strftime(
               time_bucket(INTERVAL 30 MINUTE, ts) - off * INTERVAL 30 MINUTE,
               '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*)::BIGINT AS n_events
    FROM events, offs
    GROUP BY 1
    """,
    covers=["STREAM-S"],
)
def st_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window counts as an actual streaming query, same oracle
    as the batch twin ev_sliding_window_agg (1-hour window / 30-minute
    slide: every event lands in exactly two windows). Complete output
    mode for the same reason as st_tumbling_window_agg — the
    batch-equivalence check needs the final open windows too."""
    ev = stream_events_from_parquet(spark, sf_dir)
    out = _drain_to_memory(sliding_counts_stream(ev), "st_sliding", "complete")
    return out.select(
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
    )


@query(
    "st_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    covers=["STREAM-J"],
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchase attributed to the same
    user's clicks within the preceding hour) executed as a real
    streaming self-join with watermarks on both sides, hash-checked
    against the plain SQL interval join. Append mode: inner-join matches
    emit as both rows arrive; the watermark+interval bound is what keeps
    the two buffers finite (see streaming.jobs.click_purchase_join_stream)."""
    ev = stream_events_from_parquet(spark, sf_dir)
    out = _drain_to_memory(click_purchase_join_stream(ev), "st_ssjoin", "append")
    return out.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts_s"),
    )


@query(
    "st_dedup_events",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    """,
    covers=["STREAM-T", "X1"],
)
def st_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery, driver-checked:
    the event stream is unioned with ITSELF (every event delivered
    twice — the redelivery pattern an at-least-once log produces), then
    `dropDuplicatesWithinWatermark` on event_id collapses the copies.
    The oracle is simply the original events table: dedup must restore
    exactly-once. Both delivered copies are byte-identical, so the
    output is deterministic regardless of which copy wins the state
    race. State stays bounded: keys evict once they age past the
    watermark horizon (see streaming.jobs.dedup_events_stream)."""
    ev = stream_events_from_parquet(spark, sf_dir)
    redelivered = ev.union(ev)
    deduped = redelivered.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = _drain_to_memory(deduped, "st_dedup", "append")
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )


@query(
    "st_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    )) >= 1800 OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*)::BIGINT AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    covers=["STREAM-SESS"],
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows executed as a real streaming query
    (`session_window` merging in the state store), hash-checked against
    the batch gap-sessionization oracle. Boundary semantics differ by
    design between the two formulations: `session_window` closes a
    session when the next event is >= gap away (window is [ts, ts+gap)),
    while the batch lag-formulation in ev_sessionize_gap splits on
    strictly >; the oracle here uses >= to match the streaming
    operator exactly — the driver hash-compare would catch a
    boundary-semantics regression on either side."""
    from engage_spark.streaming.jobs import sessionize_stream

    ev = stream_events_from_parquet(spark, sf_dir)
    out = _drain_to_memory(sessionize_stream(ev), "st_session", "complete")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


@query(
    "st_stateful_running_stats",
    # The EWMA recurrence y_0 = x_0, y_i = a*x_i + (1-a)*y_{i-1}
    # (pandas ewm(adjust=False) seeded per applyInPandasWithState's
    # carried state) is deterministic and has the closed form
    # y_{n-1} = (1-a)^{n-1} x_0 + sum_{i>=1} a (1-a)^{n-1-i} x_i —
    # a pow-weighted window sum DuckDB can compute exactly. The 1e-9
    # nudge before round() keeps binary-exact .5 boundaries from
    # hashing apart between the recurrence and the expanded sum.
    oracle="""
    WITH ordered AS (
        SELECT user_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) - 1 AS i,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events
    )
    SELECT user_id,
           max(n)::BIGINT AS n_events,
           round(sum(
               CASE WHEN i = 0 THEN pow(0.8, n - 1) * value
                    ELSE 0.2 * pow(0.8, n - 1 - i) * value END
           ) + 1e-9, 6) AS ewma_value
    FROM ordered GROUP BY user_id
    """,
    covers=["STREAM-STATE"],
)
def st_stateful_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState operator under the driver's signal:
    per-user running event count + EWMA of `value` (alpha=0.2), state
    carried in the state store across micro-batches. The cross-batch
    recurrence is deterministic, so it IS oracle-able in closed form:
    the final EWMA equals the pow((1-a), n-1-i)-weighted sum of the
    user's event-time-ordered values (see the oracle). Update output
    mode re-emits a user's row per batch; the AvailableNow drain over
    the single-file source runs one batch, so the sink holds exactly
    the final state per user. tests/test_streaming.py additionally
    asserts multi-batch parity against the same batch recurrence."""
    ev = stream_events_from_parquet(spark, sf_dir)
    out = _drain_to_memory(
        running_user_stats_stream(ev), "st_userstats", "update"
    )
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("ewma_value") + F.lit(1e-9), 6).alias("ewma_value"),
    )


@query(
    "st_doc_quality_stream",
    oracle=None,  # set below — shares llm_text.QUALITY_ORACLE verbatim
    covers=["STREAM-MAP", "X4"],
)
def st_doc_quality_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation quality gate as a STREAMING ingestion transform:
    readStream over the documents parquet → the exact quality_select
    projection the batch query uses → append-mode memory sink,
    AvailableNow. A map-only transform has one truth regardless of
    execution mode, so this streaming query hash-checks against the
    SAME DuckDB oracle as x_text_quality — the pattern for scoring
    documents AS THEY ARRIVE in a streaming ingestion pipeline (no
    state store, no watermark; output rate = input rate)."""
    from engage_spark.queries.llm_text import quality_select
    from engage_spark.streaming.jobs import stream_parquet

    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    stream = stream_parquet(
        spark, sf_dir, schema, schema_src=path, glob="documents.parquet"
    )
    return _drain_to_memory(quality_select(stream), "st_docq", "append")


# a map-only streaming twin shares its batch oracle verbatim
from engage_spark.queries.llm_text import QUALITY_ORACLE as _QO  # noqa: E402
from engage_spark.registry import REGISTRY as _REG  # noqa: E402

_REG["st_doc_quality_stream"].oracle = _QO


@query(
    "st_cdc_merge_upsert",
    # Oracle: the netted CDC batch (seq=2 wins per key) replayed as a
    # SQL MERGE, emitted for BOTH time-travel sides — a hash match
    # proves the STREAMING foreachBatch front end commits exactly one
    # versioned MERGE: latest-wins netting, partition-moving updates,
    # inserts, deletes, and exact pre/post history through the stream.
    oracle="""
    WITH src AS (SELECT doc_id, lang, source, n_chars FROM documents),
    winners AS (
      SELECT doc_id,
             CASE WHEN doc_id % 30 = 0 THEN 'xx' ELSE lang END AS lang,
             source, n_chars + 2000 AS n_chars, false AS is_delete
      FROM src WHERE doc_id % 10 = 0 AND doc_id % 17 <> 3
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, lang, 'ins' AS source,
             777::BIGINT AS n_chars, false AS is_delete
      FROM src WHERE doc_id % 13 = 5
      UNION ALL
      SELECT doc_id, lang, source, n_chars, true AS is_delete
      FROM src WHERE doc_id % 17 = 3
    ),
    merged AS (
      SELECT s.doc_id, s.lang, s.source, s.n_chars FROM src s
      WHERE s.doc_id NOT IN (SELECT doc_id FROM winners)
      UNION ALL
      SELECT doc_id, lang, source, n_chars FROM winners WHERE NOT is_delete
    )
    SELECT 1::BIGINT AS as_of, lang, count(*)::BIGINT AS n,
           sum(n_chars)::BIGINT AS chars, sum(doc_id)::BIGINT AS id_sum
    FROM src GROUP BY lang
    UNION ALL
    SELECT 2::BIGINT AS as_of, lang, count(*)::BIGINT AS n,
           sum(n_chars)::BIGINT AS chars, sum(doc_id)::BIGINT AS id_sum
    FROM merged GROUP BY lang
    """,
    covers=["STREAM-CDC", "S4", "S5"],
)
def st_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC MERGE (r14): a change stream carrying TWO
    conflicting updates per key (seq 1 and seq 2 — latest must win),
    partition-moving re-classifications, inserts, and deletes drains
    through cdc_merge_stream (foreachBatch → io.upsert_dataset) onto a
    VERSION-LOGGED lang-partitioned corpus, then both time-travel
    sides of the single stream commit are aggregated. The one
    registered query that exercises streaming ingest + netting + the
    versioned partitioned MERGE + time travel end to end under the
    driver's hash check."""
    import shutil

    from engage_spark.io import table, write_parquet
    from engage_spark.queries.sinks import _scratch
    from engage_spark.streaming.jobs import cdc_merge_stream
    from engage_spark.versioning import read_version, version_log_enable

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tgt = _scratch("st_cdc_target")
    src = _scratch("st_cdc_in")
    ckpt = _scratch("st_cdc_ckpt")
    for p in (tgt, src, ckpt):
        shutil.rmtree(p, ignore_errors=True)  # idempotent across reruns
    write_parquet(d, tgt, partition_by=["lang"])
    version_log_enable(spark, tgt)                                 # v1

    def upd(bump: int, seq: int) -> DataFrame:
        return (
            d.filter((F.col("doc_id") % 10 == 0)
                     & (F.col("doc_id") % 17 != 3))
            .withColumn(
                "lang",
                F.when(F.col("doc_id") % 30 == 0, F.lit("xx")).otherwise(
                    F.col("lang")
                ),
            )
            .withColumn("n_chars", (F.col("n_chars") + bump).cast("long"))
            .withColumn("is_delete", F.lit(False))
            .withColumn("seq", F.lit(seq).cast("long"))
        )

    ins = d.filter(F.col("doc_id") % 13 == 5).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "lang",
        F.lit("ins").alias("source"),
        F.lit(777).cast("long").alias("n_chars"),
        F.lit(False).alias("is_delete"),
        F.lit(1).cast("long").alias("seq"),
    )
    dels = (
        d.filter(F.col("doc_id") % 17 == 3)
        .withColumn("is_delete", F.lit(True))
        .withColumn("seq", F.lit(1).cast("long"))
    )
    (
        upd(1000, 1).unionByName(upd(2000, 2))
        .unionByName(ins).unionByName(dels)
        .coalesce(1).write.parquet(f"{src}/b1.parquet")
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, lang string, source string, n_chars long, "
            "is_delete boolean, seq long"
        )
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = cdc_merge_stream(
        stream, tgt, ["doc_id"], ckpt,
        partition_by=["lang"], delete_col="is_delete", order_col="seq",
    )
    q.awaitTermination()

    def _agg(df: DataFrame, v: int) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        ).select(F.lit(v).cast("long").alias("as_of"), "*")

    return _agg(read_version(spark, tgt, 1), 1).unionByName(
        _agg(read_version(spark, tgt, 2), 2)
    )
