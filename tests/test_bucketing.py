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


def test_read_bucketed_recovers_spec_in_fresh_catalog(
    spark, sf_dir, tmp_path
):
    """The durable `_bucket_spec` sidecar (r13): after the catalog
    entries are DROPPED (simulating a fresh session/driver),
    read_bucketed re-registers both tables from the sidecar and the
    join still runs with ZERO Exchange — the one-time bucketed write
    keeps amortizing across sessions, not just within the writer's."""
    from engage_spark.io import read_bucketed, write_bucketed

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ud = ev.groupBy("user_id").agg(F.avg("value").alias("user_mean"))
    write_bucketed(
        spark, ev, "spec_ev_b", ["user_id"], N_BUCKETS,
        path=str(tmp_path / "spec_ev"),
    )
    write_bucketed(
        spark, ud, "spec_ud_b", ["user_id"], N_BUCKETS,
        path=str(tmp_path / "spec_ud"),
    )
    n_expected = spark.table("spec_ev_b").count()
    # wipe the catalog entries — what a brand-new driver would see
    spark.sql("DROP TABLE spec_ev_b")
    spark.sql("DROP TABLE spec_ud_b")
    assert not spark.catalog.tableExists("spec_ev_b")
    ev_b = read_bucketed(spark, str(tmp_path / "spec_ev"), "spec_ev_b")
    ud_b = read_bucketed(spark, str(tmp_path / "spec_ud"), "spec_ud_b")
    assert ev_b.count() == n_expected  # schema + data visible
    joined = ev_b.join(ud_b.hint("merge"), on="user_id").select(
        "user_id", "event_id", "value", "user_mean"
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"re-registered spec lost buckets:\n{plan[:1500]}"
    assert "SortMergeJoin" in plan
    # second open: catalog hit, same result
    assert read_bucketed(
        spark, str(tmp_path / "spec_ev"), "spec_ev_b"
    ).count() == n_expected
    spark.sql("DROP TABLE IF EXISTS spec_ev_b")
    spark.sql("DROP TABLE IF EXISTS spec_ud_b")


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
