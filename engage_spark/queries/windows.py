"""Window / ordered-sequence operators (SURVEY.md §2.5, W1-W8, W12; §2.6 O1-O4).

The reference implements every one of these as a per-group Python loop
over date-sorted slices — the heart of its pipeline. Here they are
Spark window functions: one shuffle on the partition key, then
whole-stage-codegen'd frame evaluation; no Python in the hot path.
Events are keyed (user_id, ts, event_id) — event_id breaks ts ties so
orderings are total and deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.registry import query

# Deterministic per-user ordering (ts then event_id tiebreak).
_ORD = "ORDER BY ts, event_id"


def _w(*keys):
    return Window.partitionBy(*keys).orderBy("ts", "event_id")


@query(
    "w2_w3_lag_and_diff",
    oracle=f"""
    SELECT event_id, user_id,
           round(coalesce(lag(value, 1) OVER (PARTITION BY user_id {_ORD}), 0.0), 4)
               AS lag_value,
           round(value - coalesce(lag(value, 1) OVER (PARTITION BY user_id {_ORD}), 0.0), 4)
               AS d_value
    FROM events
    """,
    covers=["W1", "W2", "W3"],
)
def w2_w3_lag_and_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 features + first differences with 0.0 default on the first
    row (lag_confirmed / d_removed, covid_simulator.py:411-418,429-438)."""
    ev = table(spark, sf_dir, "events")
    w = _w("user_id")
    lag = F.coalesce(F.lag("value", 1).over(w), F.lit(0.0))
    return ev.select(
        "event_id",
        "user_id",
        F.round(lag, 4).alias("lag_value"),
        F.round(F.col("value") - lag, 4).alias("d_value"),
    )


@query(
    "w4_trim_leading_prefix",
    oracle=f"""
    SELECT event_id, user_id, value FROM (
        SELECT event_id, user_id, value,
               max(CASE WHEN value > 15 THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id {_ORD}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS seen
        FROM events
    ) WHERE seen = 1
    """,
    covers=["W4"],
)
def w4_trim_leading_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim the leading prefix of a series before the first 'signal' row
    (`df.loc[df['confirmed'].ne(0).idxmax():]`, covid_simulator.py:180):
    running-max flag over an unbounded-preceding frame, then filter."""
    ev = table(spark, sf_dir, "events")
    w = _w("user_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn(
            "seen", F.max(F.when(F.col("value") > 15, 1).otherwise(0)).over(w)
        )
        .filter(F.col("seen") == 1)
        .select("event_id", "user_id", "value")
    )


@query(
    "w5_head_n_per_group",
    oracle=f"""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id {_ORD}) AS rn
        FROM events
    ) WHERE rn <= 30
    """,
    covers=["W5", "O4"],
)
def w5_head_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-N per group (first 30 infected days for R₀,
    covid_simulator.py:393-394)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("rn", F.row_number().over(_w("user_id")))
        .filter(F.col("rn") <= 30)
        .select("user_id", "event_id", "value")
    )


@query(
    "w6_tail_n_per_group",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn <= 30
    """,
    covers=["W6", "M7"],
)
def w6_tail_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-N per group (train/test split: last n_test rows,
    weather_pred.py:87-88,286-287)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 30)
        .select("user_id", "event_id", "value")
    )


@query(
    "w7_conditional_increase_sum",
    oracle=f"""
    WITH d AS (
        SELECT user_id,
               value - lag(value) OVER (PARTITION BY user_id {_ORD}) AS dv,
               row_number() OVER (PARTITION BY user_id {_ORD}) AS rn
        FROM events
    )
    SELECT user_id,
           round(sum(CASE WHEN dv > 0 THEN dv ELSE 0 END), 4) AS pos_sum,
           round(sum(CASE WHEN dv < 0 THEN -dv ELSE 0 END), 4) AS neg_sum
    FROM d WHERE rn <= 30 GROUP BY user_id
    """,
    covers=["W7"],
)
def w7_conditional_increase_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sum of positive day-over-day increases over the first 30 rows per
    group (R₀ numerator/denominator, covid_simulator.py:396-409)."""
    ev = table(spark, sf_dir, "events")
    w = _w("user_id")
    d = ev.select(
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("dv"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 30)
    return d.groupBy("user_id").agg(
        F.round(F.sum(F.when(F.col("dv") > 0, F.col("dv")).otherwise(0.0)), 4).alias(
            "pos_sum"
        ),
        F.round(F.sum(F.when(F.col("dv") < 0, -F.col("dv")).otherwise(0.0)), 4).alias(
            "neg_sum"
        ),
    )


@query(
    "w8_sliding_feature_window",
    oracle=f"""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id {_ORD}
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
           ), 6) AS window_mean,
           count(value) OVER (
               PARTITION BY user_id {_ORD}
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
           )::BIGINT AS window_n
    FROM events
    """,
    covers=["W8"],
)
def w8_sliding_feature_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding fixed-size feature windows (`split_sequence`,
    weather_pred.py:91-103): a ROWS frame of the trailing 3 values.
    (The LSTM kernel builds full window tensors inside applyInPandas;
    this is the declarative form.)"""
    ev = table(spark, sf_dir, "events")
    w = _w("user_id").rowsBetween(-3, -1)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("window_mean"),
        F.count("value").over(w).alias("window_n"),
    )


@query(
    "w12_rownumber_index",
    oracle=f"""
    SELECT event_id, user_id,
           (row_number() OVER (PARTITION BY user_id {_ORD}) - 1)::BIGINT AS date_idx
    FROM events
    """,
    covers=["W12"],
)
def w12_rownumber_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0-based row index within group (`date_idx`,
    covid_data_transform.py:242)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.row_number().over(_w("user_id")) - 1).cast("long").alias("date_idx"),
    )


@query(
    "o2_sorted_distinct",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    covers=["O1", "O2"],
)
def o2_sorted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct inventory (covid_data_transform.py:26,41,187-188).
    (Hash compare is order-insensitive; orderBy kept for the API shape.)"""
    c = table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct().orderBy(
        "c_mktsegment", "c_nationkey"
    )


@query(
    "o3_first_row_after_sort",
    oracle="""
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events ORDER BY ts, event_id LIMIT 1
    """,
    covers=["O3"],
)
def o3_first_row_after_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First row after sort (earliest matching date,
    covid_simulator.py:349-350) — total order via tiebreak key."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.orderBy("ts", "event_id")
        .limit(1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )
