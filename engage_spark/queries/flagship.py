"""Flagship query — a TPC-H Q1-style pricing summary.

Exercises in one plan: pruned parquet scan with pushed-down predicate,
arithmetic expressions, multi-column hash aggregate with map-side
partials, and ordered output. This is the driver's smoke query
(`__spark_entry__.entry`) and the headline bench query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT)::BIGINT / 10000.0, 2) AS sum_disc_price,
           round(sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000)::BIGINT)::BIGINT / 1000000.0, 2)
               AS sum_charge,
           round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
           round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
           round(avg(l_discount) + 1e-9, 4) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    covers=["S1", "P5", "A1", "A2", "A6", "O1"],
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape) — the flagship.

    The reference's closest analogue is its grouped mean/sum passes
    (covid_data_transform.py:28,43,77); this is the canonical Spark form:
    single scan → single shuffle of partial aggregates.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2024-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            (F.round(F.sum(F.round(disc_price * 10000).cast("long")) / 10000.0, 2)).alias("sum_disc_price"),
            (F.round(F.sum(F.round(disc_price * (1 + F.col("l_tax")) * 1000000).cast("long")) / 1000000.0, 2)).alias("sum_charge"),
            F.round(F.avg("l_quantity") + 1e-9, 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice") + 1e-9, 4).alias("avg_price"),
            F.round(F.avg("l_discount") + 1e-9, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
