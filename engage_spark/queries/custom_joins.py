"""Custom join operators Spark lacks natively (engine extension).

The reference aligns series by exact-date equi joins
(covid_data_transform.py:95-96,239) — no as-of/range joins anywhere —
but any time-series engine needs them, so they're implemented as
compositions of existing DataFrame ops (the (a) strategy of the build
brief), never nested-loop scans:

  as-of join  → union both sides + one window pass (merge-join shape:
                one shuffle on the key, linear scan per group)
  range join  → decompose bands into fixed-width bins → equi join on
                bin + residual predicate (hash join, not NLJ)

Both are oracle-checked: DuckDB has native ASOF JOIN and evaluates the
range predicate directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.registry import query


def asof_join(
    left: DataFrame, right: DataFrame, on: str, ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, the latest right row with right.ts <= left.ts
    within the same `on` key (inner semantics: unmatched left rows drop).

    Plan shape: union(tagged left, tagged right) → window
    last(..., ignorenulls) ordered by (ts, right-first) → filter left.
    ONE shuffle on the key; no per-row lookups, no nested loop — the
    same merge pass a native as-of join would do.
    """
    r = right.select(
        F.col(on), F.col(ts),
        F.lit(1).alias("__is_r"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rdata"),
    )
    l = left.withColumn("__is_r", F.lit(0)).withColumn(
        "__rdata", F.lit(None).cast(r.schema["__rdata"].dataType)
    )
    unioned = l.select(*left.columns, "__is_r", "__rdata").unionByName(
        r.select(
            *[
                F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
            ],
            "__is_r",
            "__rdata",
        )
    )
    # right rows sort before left rows at equal ts → "at or before" is inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.desc("__is_r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last("__rdata", ignorenulls=True).over(w)
    )
    return (
        matched.filter((F.col("__is_r") == 0) & F.col("__match").isNotNull())
        .select(*left.columns, F.col("__match").alias("asof"))
    )


@query(
    "ext_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           c.click_id AS last_click_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
    FROM purchases p
    ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    covers=["J1"],
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it. Right side deduped to one row per (user, ts) so
    the match is deterministic on both engines."""
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .withColumn("click_ts_s", F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(purchases, clicks, on="user_id", ts="ts",
                    right_cols=["click_id", "click_ts_s"])
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("asof.click_id").alias("last_click_id"),
        F.col("asof.click_ts_s").alias("click_ts"),
    )


# ---------------------------------------------------------------------------
# Range join via bin decomposition

_BANDS = [(0.0, 5.0, "tiny"), (5.0, 20.0, "small"), (20.0, 50.0, "mid"),
          (50.0, 200.0, "large")]
_BIN = 10.0


@query(
    "ext_range_join_binned",
    oracle=f"""
    WITH bands(lo, hi, band) AS (VALUES
        {", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _BANDS)})
    SELECT b.band, count(*)::BIGINT AS n,
           round(sum(e.value) + 1e-9, 4) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    covers=["J6"],
)
def ext_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join without a nested-loop scan: each band explodes
    into the fixed-width bins it overlaps, the fact side computes its
    bin, and the join is a plain hash equi join on bin + a residual
    range predicate. At 100 TB this is the difference between a
    BroadcastNestedLoopJoin over every row and a hash join whose build
    side is |bands|·(width/bin) rows."""
    ev = table(spark, sf_dir, "events").withColumn(
        "bin", F.floor(F.col("value") / _BIN).cast("int")
    )
    band_rows = []
    for lo, hi, name in _BANDS:
        first_bin = int(lo // _BIN)
        last_bin = int((hi - 1e-9) // _BIN)
        for b in range(first_bin, last_bin + 1):
            band_rows.append((b, lo, hi, name))
    from engage_spark.session import local_frame

    bands = local_frame(
        spark, band_rows, "bin long, lo double, hi double, band string"
    )
    joined = ev.join(F.broadcast(bands), on="bin").filter(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value") + 1e-9, 4).alias("sum_value"),
    )