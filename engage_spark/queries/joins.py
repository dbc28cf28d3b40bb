"""Joins (SURVEY.md §2.3, J1-J8).

The reference's pandas `merge` is a single-node hash join; here Catalyst
picks broadcast-hash vs sort-merge per side sizes (AQE can demote at
runtime). Dimension tables (region/nation/supplier/part) are broadcast
explicitly where we know they're small at any scale factor — at 100 TB
the fact tables shuffle on the join key only when both sides are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "j1_inner_join_multikey",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_quantity,
           round(b.revenue, 4) AS revenue
    FROM lineitem a
    INNER JOIN (
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    ) b ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
    covers=["J1", "J2"],
)
def j1_inner_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key inner equi-join (3-key merge,
    covid_data_transform.py:95-96). Both sides shuffle on the composite
    key once; Catalyst reuses the exchange."""
    li = table(spark, sf_dir, "lineitem")
    rev = li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .join(rev, on=["l_orderkey", "l_linenumber"], how="inner")
        .select(
            "l_orderkey", "l_linenumber", "l_quantity",
            F.round("revenue", 4).alias("revenue"),
        )
    )


@query(
    "j3_left_outer_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    covers=["J3"],
)
def j3_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer equi-join (covid_data_transform.py:165)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


@query(
    "j4_right_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    covers=["J4"],
)
def j4_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping all dimension rows
    (covid ⟕ weather keeps all weather rows,
    covid_data_transform.py:239)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "j5_self_join_suffixes",
    oracle="""
    WITH f AS (
        SELECT o_custkey, round(avg(o_totalprice) + 1e-9, 4) AS avg_price_f
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey
    ), o AS (
        SELECT o_custkey, round(avg(o_totalprice) + 1e-9, 4) AS avg_price_o
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
    )
    SELECT f.o_custkey, f.avg_price_f, o.avg_price_o,
           round(o.avg_price_o - f.avg_price_f + 1e-9, 4) AS price_delta
    FROM f INNER JOIN o ON f.o_custkey = o.o_custkey
    """,
    covers=["J5", "M8"],
)
def j5_self_join_suffixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after self-join with suffixed columns (scenario compare,
    covid_simulator.py:622). Pre-renamed columns instead of pandas
    suffixes; the diff column mirrors the after-vs-before delta."""
    o = table(spark, sf_dir, "orders")
    f = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.round(F.avg("o_totalprice") + 1e-9, 4).alias("avg_price_f"))
    )
    op = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.round(F.avg("o_totalprice") + 1e-9, 4).alias("avg_price_o"))
    )
    return f.join(op, "o_custkey", "inner").select(
        "o_custkey",
        "avg_price_f",
        "avg_price_o",
        F.round(F.col("avg_price_o") - F.col("avg_price_f") + 1e-9, 4).alias("price_delta"),
    )


@query(
    "j6_broadcast_dim_join",
    oracle="""
    SELECT n.n_name, r.r_name,
           round(sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT)::BIGINT / 10000.0, 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    covers=["J6"],
)
def j6_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state scalar lookup loop (covid_simulator.py:264-265,571-584)
    → one broadcast-hash join of the small dims into the fact table:
    zero shuffle of lineitem for the join, one shuffle for the final
    group-by."""
    li = table(spark, sf_dir, "lineitem")
    dim = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "n_name", "r_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                        * 10000
                    ).cast("long")
                )
                / 10000.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "j7_semi_join_membership",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_custkey IN (
        SELECT o_custkey FROM orders GROUP BY o_custkey
        HAVING sum(o_totalprice) > 300000
    )
    """,
    covers=["J7"],
)
def j7_semi_join_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep groups whose key is in a computed list
    (`list_loc` membership, covid_data_transform.py:241-260) →
    `left_semi` join; no row duplication, key side aggregated first."""
    c = table(spark, sf_dir, "customer")
    keys = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .filter(F.col("spend") > 300000)
        .select("o_custkey")
    )
    return c.join(keys, c.c_custkey == keys.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "j8_anti_join_dropgroups",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 250000
    )
    """,
    covers=["J8"],
)
def j8_anti_join_dropgroups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop groups failing a predicate (no-population groups,
    covid_data_transform.py:262-281) → `left_anti` join against the
    offending keys. (Predicate chosen so the result is non-empty at
    every testdata scale factor — a 0-row match is a weak check.)"""
    c = table(spark, sf_dir, "customer")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )
