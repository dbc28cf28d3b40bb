"""Scans, projections, filters, casts, conditionals (SURVEY.md §2.1-§2.2).

Reference sites cited per-query; each maps a pandas-eager idiom to a
lazy Catalyst-optimized plan. All scans here are parquet: column pruning
and predicate pushdown reach the file source (verify with
``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "s1_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2001-01-01'
    """,
    covers=["S1", "S3", "P1", "P6"],
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned scan + pushed-down filter.

    Reference: eager `pd.read_csv(...)[INCLUDE_COL]` + boolean mask
    (covid_data_transform.py:70,127,158). Spark pushes both the
    projection and the `<` predicate into the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "2001-01-01")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
        )
    )


@query(
    "p2_projection_exclude",
    oracle="SELECT s_suppkey, s_name FROM supplier",
    covers=["P2"],
)
def p2_projection_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exclude-list projection (`~columns.isin(EXCLUDE_COL)`,
    covid_data_transform.py:59) → `df.drop`; Catalyst still prunes the
    scan down to the kept columns."""
    return table(spark, sf_dir, "supplier").drop("s_nationkey", "s_acctbal")


@query(
    "p3_p4_rename_literal",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS total_price,
           'engage' AS engine, 1.0 AS intercept
    FROM orders
    """,
    covers=["P3", "P4"],
)
def p3_p4_rename_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename (covid_data_transform.py:71) + literal column
    (`Intercept=1.0`, covid_simulator.py:375)."""
    return (
        table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("total_price"),
        )
        .withColumn("engine", F.lit("engage"))
        .withColumn("intercept", F.lit(1.0))
    )


@query(
    "p5_arith_derived",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) + 1e-9, 4) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 1e-9, 4) AS charged,
           round(l_quantity / 10.0 + 1e-9, 4) AS qty_tenths
    FROM lineitem
    """,
    covers=["P5", "F17"],
)
def p5_arith_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived columns (`TAVG/10`, `removed = death+recovered`,
    covid_simulator.py:361,427)."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(rev + 1e-9, 4).alias("revenue"),
        F.round(rev * (1 + F.col("l_tax")) + 1e-9, 4).alias("charged"),
        F.round(F.col("l_quantity") / 10.0 + 1e-9, 4).alias("qty_tenths"),
    )


@query(
    "p7_compound_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000)
       OR (o_orderstatus = 'O' AND o_totalprice < 20000)
    """,
    covers=["P6", "P7"],
)
def p7_compound_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean mask (`&`, `|`; covid_simulator.py:349,450,508)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000))
        | ((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 20000))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "p8_conditional_column",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS discounted
    FROM lineitem
    """,
    covers=["P8"],
)
def p8_conditional_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`np.where` conditionals (covid_simulator.py:49,151,377) →
    `when/otherwise` (codegen'd CASE, no Python)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("discounted"),
    )


@query(
    "p9_mapping_join_coalesce",
    oracle="""
    WITH mapping(old_name, new_name) AS (
        VALUES ('UNITED STATES', 'USA'), ('UNITED KINGDOM', 'UK'),
               ('GERMANY', 'DEU')
    )
    SELECT n.n_nationkey,
           coalesce(m.new_name, n.n_name) AS n_name_fixed
    FROM nation n LEFT JOIN mapping m ON n.n_name = m.old_name
    """,
    covers=["P9"],
)
def p9_mapping_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-driven rename: the reference loops over a mapping CSV
    updating rows in place (`rename_location`,
    covid_data_transform.py:16-22). Spark-first: broadcast-join the
    mapping table and `coalesce(new, old)` — one pass, no loop."""
    nation = table(spark, sf_dir, "nation")
    from engage_spark.session import local_frame

    mapping = local_frame(
        spark,
        [("UNITED STATES", "USA"), ("UNITED KINGDOM", "UK"), ("GERMANY", "DEU")],
        "old_name string, new_name string",
    )
    return (
        nation.join(F.broadcast(mapping), nation.n_name == mapping.old_name, "left")
        .select(
            "n_nationkey",
            F.coalesce("new_name", "n_name").alias("n_name_fixed"),
        )
    )


@query(
    "p10_cast",
    oracle="""
    SELECT l_orderkey,
           l_quantity::INTEGER AS qty_int,
           l_linenumber::VARCHAR AS line_str,
           strftime(l_shipdate, '%Y%m%d')::INTEGER AS date_int
    FROM lineitem
    """,
    covers=["P10"],
)
def p10_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`astype(int/str)` casts incl. the reference's int-yyyymmdd date
    encoding (covid_data_transform.py:120,154,156)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.date_format("l_shipdate", "yyyyMMdd").cast("int").alias("date_int"),
    )


@query(
    "p11_null_fill",
    oracle="""
    SELECT e.event_id,
           coalesce(nullif(e.event_type, 'error'), 'UNK') AS type_filled,
           coalesce(nullif(e.value, 0.0), -1.0) AS value_filled
    FROM events e
    """,
    covers=["P11", "F3"],
)
def p11_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-fill with per-column defaults / 'UNK' / -1
    (covid_data_transform.py:73,118-119; covid_simulator.py:163).
    Testdata has no nulls, so nulls are injected with `nullif` first."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_filled"),
        F.nullif(F.col("value"), F.lit(0.0)).alias("value_filled"),
    ).na.fill({"type_filled": "UNK", "value_filled": -1.0})


@query(
    "p13_first_value_per_group",
    oracle="""
    SELECT DISTINCT c_nationkey,
           first_value(c_acctbal) OVER (
               PARTITION BY c_nationkey ORDER BY c_custkey
           ) AS first_bal
    FROM customer
    """,
    covers=["P13"],
)
def p13_first_value_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First value per group broadcast to the group
    (`population.dropna().iloc[0]`, covid_data_transform.py:272-276;
    covid_simulator.py:47-51) → `first_value` window + distinct."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        c.select(
            "c_nationkey",
            F.first("c_acctbal").over(w).alias("first_bal"),
        ).distinct()
    )


@query(
    "p12_drop_allnull_columns",
    oracle="""
    SELECT event_id, value FROM events
    """,
    covers=["P12"],
)
def p12_drop_allnull_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop all-null columns (`dropna(axis='columns')`,
    weather_pred.py:259). Spark-first: one aggregate pass counts
    non-nulls per column (driver-side schema decision), then drop.
    Here an injected all-null column is dropped, keeping event_id/value."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "value", F.lit(None).cast("double").alias("all_null")
    )
    counts = ev.select(
        *[F.count(F.col(c)).alias(c) for c in ev.columns]
    ).first()
    keep = [c for c in ev.columns if counts[c] > 0]
    return ev.select(*keep)
