"""Scalar string / date / math functions (SURVEY.md §2.8, F1-F18).

Each reference idiom (pandas `.str.*`, `.apply(lambda ...)`, list
comprehensions over columns) becomes a built-in JVM expression —
row-at-a-time Python never touches the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "f_string_ops",
    oracle="""
    SELECT p_partkey,
           trim(p_name) AS name_trim,
           regexp_replace(p_name, '[^a-zA-Z]', '', 'g') AS name_alpha,
           regexp_replace(p_name, ' ', '_', 'g') AS name_underscore,
           substr(p_brand, 1, 2) AS brand_prefix,
           concat_ws(' : ', p_brand, p_type) AS brand_type,
           upper(p_type) AS type_upper,
           length(p_name)::BIGINT AS name_len
    FROM part
    """,
    covers=["F1", "F2", "F5", "F6", "F7", "F8", "F9"],
)
def f_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: trim (covid_data_transform.py:124), regex strip
    non-alpha (covid_simulator.py:551-552), replace
    (covid_data_transform.py:107), substring country code
    (covid_data_transform.py:163), concat with separator
    (covid_data_transform.py:187-188)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_replace("p_name", "[^a-zA-Z]", "").alias("name_alpha"),
        F.regexp_replace("p_name", " ", "_").alias("name_underscore"),
        F.substring("p_brand", 1, 2).alias("brand_prefix"),
        F.concat_ws(" : ", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").cast("long").alias("name_len"),
    )


@query(
    "f_date_ops",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y%m%d') AS date_compact,
           strftime(o_orderdate, '%Y-%m-%d') AS date_iso,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS date_plus30,
           date_diff('day', DATE '2024-01-01', o_orderdate::DATE)::BIGINT AS days_since,
           CASE WHEN o_orderdate > TIMESTAMP '2024-06-01' THEN 1 ELSE 0 END AS after_cutoff
    FROM orders
    """,
    covers=["F4", "F10", "F11", "F12", "F14"],
)
def f_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date parse/format/arithmetic: `%Y%m%d` compaction
    (covid_data_transform.py:155), reformat (covid_simulator.py:343),
    timedelta add (covid_simulator.py:345-346), `julianday` comparison
    (covid_simulator.py:369) → `datediff`/direct comparison."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").alias("date_compact"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_iso"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "date_plus30"
        ),
        F.datediff(F.to_date("o_orderdate"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.when(F.col("o_orderdate") > F.lit("2024-06-01").cast("timestamp"), 1)
        .otherwise(0)
        .alias("after_cutoff"),
    )


@query(
    "f13_date_range_explode",
    oracle="""
    SELECT o_orderkey, strftime(unnest(generate_series(
               o_orderdate::DATE, o_orderdate::DATE + 6, INTERVAL 1 DAY
           ))::DATE, '%Y-%m-%d') AS day
    FROM orders WHERE o_orderkey < 100
    """,
    covers=["F13"],
)
def f13_date_range_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range generation (`pd.date_range(start, periods=n)`,
    covid_simulator.py:340-342) → `sequence` + `explode`; distributed
    row generation instead of a driver-side index."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.to_date("o_orderdate"),
                F.date_add(F.to_date("o_orderdate"), 6),
            )
        ).alias("d"),
    ).select("o_orderkey", F.date_format("d", "yyyy-MM-dd").alias("day"))


@query(
    "f15_case_banding",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 5 THEN 'freezing'
                WHEN value < 10 THEN 'cold'
                WHEN value < 15 THEN 'mild'
                WHEN value < 20 THEN 'warm'
                ELSE 'hot' END AS band,
           CASE WHEN value < 5 THEN 1 ELSE 0 END AS is_freezing,
           CASE WHEN value >= 5 AND value < 10 THEN 1 ELSE 0 END AS is_cold,
           CASE WHEN value >= 10 AND value < 15 THEN 1 ELSE 0 END AS is_mild,
           CASE WHEN value >= 15 AND value < 20 THEN 1 ELSE 0 END AS is_warm,
           CASE WHEN value >= 20 THEN 1 ELSE 0 END AS is_hot
    FROM events
    """,
    covers=["F15"],
)
def f15_case_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature banding into 5 exclusive flags (CASE WHEN bands,
    covid_simulator.py:363-367)."""
    ev = table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.when(v < 5, "freezing")
        .when(v < 10, "cold")
        .when(v < 15, "mild")
        .when(v < 20, "warm")
        .otherwise("hot")
        .alias("band"),
        F.when(v < 5, 1).otherwise(0).alias("is_freezing"),
        F.when((v >= 5) & (v < 10), 1).otherwise(0).alias("is_cold"),
        F.when((v >= 10) & (v < 15), 1).otherwise(0).alias("is_mild"),
        F.when((v >= 15) & (v < 20), 1).otherwise(0).alias("is_warm"),
        F.when(v >= 20, 1).otherwise(0).alias("is_hot"),
    )


@query(
    "f17_f18_math_null_tests",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_quantity - 25), 4) AS abs_dev,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(power(l_discount, 2), 6) AS disc_sq,
           CASE WHEN nullif(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_is_null
    FROM lineitem
    """,
    covers=["F16", "F17", "F18"],
)
def f17_f18_math_null_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/sqrt/square (weather_pred.py:84,106) and isnull tests
    (covid_data_transform.py:218,273); `ifnull` ≡ coalesce (F16)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_quantity") - 25), 4).alias("abs_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.when(F.isnull(F.nullif(F.col("l_tax"), F.lit(0.0))), 1)
        .otherwise(0)
        .alias("tax_is_null"),
    )


@query(
    "f_collection_ops",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks)::BIGINT AS n_toks,
           array_to_string(list_slice(toks, 1, 3), ',') AS first3,
           list_sort(toks)[len(toks)] AS max_tok,
           len(list_distinct(toks))::BIGINT AS n_unique,
           CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END AS has_the,
           len(flatten([toks, toks]))::BIGINT AS n_doubled,
           list_reverse(toks)[1] AS last_tok
    FROM t
    """,
    covers=["F1", "F5"],
)
def f_collection_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection-function battery over the token arrays: slice +
    array_join, array_sort + element_at, array_distinct, array_contains,
    flatten, reverse — each projected to a scalar so the cross-engine
    hash compare is representation-independent. All codegen'd JVM array
    ops, map-only, no shuffle."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr(r"split(lower(trim(text)), '\\s+')")
    t = d.select("doc_id", toks.alias("__toks"))
    return t.select(
        "doc_id",
        F.size("__toks").cast("long").alias("n_toks"),
        F.array_join(F.slice("__toks", 1, 3), ",").alias("first3"),
        F.element_at(F.array_sort("__toks"), -1).alias("max_tok"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_unique"),
        F.when(F.array_contains("__toks", "the"), 1).otherwise(0).alias("has_the"),
        F.size(F.flatten(F.array("__toks", "__toks"))).cast("long").alias("n_doubled"),
        F.element_at(F.reverse("__toks"), 1).alias("last_tok"),
    )
