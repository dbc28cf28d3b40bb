"""Time-series / event-stream operators over the `events` table.

The reference is pure batch (SURVEY.md §2.11: no streaming), so these
are the batch forms — tumbling/sliding windows, sessionization, JSON
props — chosen to be 1:1 with their Structured Streaming equivalents in
`engage_spark.streaming` (same `window()` expressions run under
`readStream` with a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "ev_tumbling_window_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    covers=["STREAM-T"],
)
def ev_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — batch form of the
    streaming `groupBy(window('ts','1 hour'))` (no reference
    counterpart; engine extension per SURVEY §2.11)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "ev_sliding_window_agg",
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
def ev_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide — each event lands in two
    windows (batch form of streaming sliding windows)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


@query(
    "ev_sessionize_gap",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    )) > 1800 OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, event_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*)::BIGINT AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    covers=["STREAM-SESS"],
)
def ev_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): lag + running
    sum of session-start flags. Batch form of streaming
    `session_window`; one shuffle on user_id."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("new_session", new_sess)
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "ev_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k_value
    FROM events
    """,
    covers=["JSON-ext"],
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from a string column (engine extension;
    the reference imports json but never uses it on data,
    covid_simulator.py:16)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "ev_conversion_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
    )
    SELECT 1::BIGINT AS step, 'view' AS step_name,
           (SELECT count(*) FROM v)::BIGINT AS n_users
    UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
    UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
    """,
    covers=["STREAM-T", "A1"],
)
def ev_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): a user
    counts at step N only with an event strictly after their step-N-1
    time. Each stage is an aggregate-then-join on user_id: the stage
    tables carry ONE row per qualifying user (not per event), so every
    join input is user-cardinality — the exchange never scales with
    event volume, only with users. The event-analytics staple the
    events surface was missing."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, on="user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, on="user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("n_users"),
        )

    return step(1, "view", v).unionAll(step(2, "click", c)).unionAll(
        step(3, "purchase", p)
    )


@query(
    "ev_retention_cohorts",
    oracle="""
    WITH firstday AS (
        SELECT user_id, min(date_trunc('day', ts)) AS cohort
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           datediff('day', cohort, day)::BIGINT AS day_offset,
           count(*)::BIGINT AS n_users
    FROM activity JOIN firstday USING (user_id)
    GROUP BY 1, 2
    """,
    covers=["STREAM-T", "A1"],
)
def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day, and
    for each (cohort, day-offset) the count of users active that day.
    Two aggregations on user/day keys — the distinct-activity table is
    one row per (user, active day), so the join is bounded by users x
    active-days, not events. The other event-analytics staple."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firstday = ev.groupBy("user_id").agg(F.min(day).alias("cohort"))
    activity = ev.select("user_id", day.alias("day")).distinct()
    return (
        activity.join(firstday, on="user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
