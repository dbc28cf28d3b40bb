"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle entirely — the storage-level answer to repeated
big-to-big joins at 100 TB (SURVEY.md §4.3 / build-brief partitioning
guidance). Verified by plan inspection: no Exchange above either scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engage_spark.io import table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    ev = table(spark, sf_dir, "events")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS user_day_bucketed")
    (
        ev.write.bucketBy(N_BUCKETS, "user_id")
        .sortBy("user_id")
        .option("path", str(base / "ev"))
        .saveAsTable("ev_bucketed")
    )
    user_day = ev.groupBy("user_id").agg(F.avg("value").alias("user_mean"))
    (
        user_day.write.bucketBy(N_BUCKETS, "user_id")
        .sortBy("user_id")
        .option("path", str(base / "ud"))
        .saveAsTable("user_day_bucketed")
    )
    yield spark.table("ev_bucketed"), spark.table("user_day_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS user_day_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    ev, ud = bucketed
    joined = ev.join(ud.hint("merge"), on="user_id").select(
        "user_id", "event_id", "value", "user_mean"
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"unexpected shuffle:\n{plan[:1500]}"
    assert "SortMergeJoin" in plan


def test_bucketed_join_results_match_unbucketed(spark, sf_dir, bucketed):
    ev_b, ud_b = bucketed
    got = (
        ev_b.join(ud_b, on="user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("value") - F.col("user_mean")), 4).alias("resid"))
        .collect()[0]
    )
    ev = table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id").agg(F.avg("value").alias("user_mean"))
    exp = (
        ev.join(ud, on="user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("value") - F.col("user_mean")), 4).alias("resid"))
        .collect()[0]
    )
    assert got.n == exp.n
    assert abs(got.resid - exp.resid) < 1e-3
