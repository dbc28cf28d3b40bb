"""Set operations (SURVEY.md §2.7, U1-U4) and extensions (intersect/except)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "u1_union_homogeneous",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
    """,
    covers=["U1"],
)
def u1_union_homogeneous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of homogeneous tables (multi-file concat,
    covid_data_transform.py:152). In Spark a union is a no-shuffle
    narrow op — partitions of both children are simply both scanned."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_orderstatus") == "O")
    )


@query(
    "u2_union_missing_columns",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
    """,
    covers=["U2"],
)
def u2_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union with differing columns — missing columns become null
    (covid ∪ us_covid, covid_data_transform.py:117,179) →
    `unionByName(allowMissingColumns=True)`."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 2 == 1).select("o_orderkey", "o_totalprice")
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "u4_rekey_collapse_aggregate",
    oracle="""
    SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN c_mktsegment ELSE 'OTHER' END
               AS segment,
           c_nationkey,
           round(avg(c_acctbal) + 1e-9, 4) AS avg_bal,
           count(*)::BIGINT AS n
    FROM customer
    GROUP BY 1, 2
    """,
    covers=["U4", "A7"],
)
def u4_rekey_collapse_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replace-group pattern: the reference deletes non-US rows and
    re-inserts country-level aggregates (`aggregate_loc_covid`,
    covid_data_transform.py:25-52). Spark-first: re-key with a CASE and
    aggregate in ONE pass — no delete+insert, no loop."""
    c = table(spark, sf_dir, "customer")
    seg = F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_mktsegment")).otherwise(
        "OTHER"
    )
    return (
        c.groupBy(seg.alias("segment"), F.col("c_nationkey"))
        .agg(
            F.round(F.avg("c_acctbal") + 1e-9, 4).alias("avg_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "u5_intersect_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    covers=["U-ext"],
)
def u5_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersect (not in the reference; free in Spark — SURVEY §2.7
    'not present' row, implemented as an engine extension)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )
