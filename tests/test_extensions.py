"""Error bounds for the sketch aggregates (rows-only at the driver)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.registry import load_all


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    approx = load_all()["ext_approx_sketches"].fn(spark, sf_dir).toPandas()
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .toPandas()
    )
    m = approx.merge(exact, on="event_type")
    assert len(m) > 0
    # HLL++ at rsd=0.02: allow 3 sigma
    rel_err = (m.approx_users - m.users).abs() / m.users
    assert (rel_err < 0.06).all(), rel_err.max()
    # percentile_approx at accuracy 10000 on this data: near-exact
    assert ((m.approx_p50 - m.p50).abs() / m.p50.abs().clip(lower=1) < 0.05).all()