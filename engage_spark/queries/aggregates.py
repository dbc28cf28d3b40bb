"""Aggregations (SURVEY.md §2.4, A1-A12).

All hash aggregates with map-side partial aggregation — at scale the
shuffle carries only per-group partials, never raw rows. Z-scores and
normalizations use window aggregates over the group rather than a
collect-and-rejoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "a1_groupby_mean_all_numeric",
    oracle="""
    SELECT c_mktsegment,
           round(avg(c_acctbal) + 1e-9, 4) AS avg_acctbal,
           round(avg(c_nationkey) + 1e-9, 4) AS avg_nationkey
    FROM customer GROUP BY c_mktsegment
    """,
    covers=["A1"],
)
def a1_groupby_mean_all_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by mean of all numeric columns (`groupby(...).mean()`,
    covid_data_transform.py:28,167)."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.avg("c_acctbal") + 1e-9, 4).alias("avg_acctbal"),
        F.round(F.avg("c_nationkey") + 1e-9, 4).alias("avg_nationkey"),
    )


@query(
    "a2_a3_groupby_sum_max",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(max(l_extendedprice), 2) AS max_price,
           count(*)::BIGINT AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    covers=["A2", "A3", "A6"],
)
def a2_a3_groupby_sum_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by sum/max/count (covid_data_transform.py:43,77,241)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "a5_global_min_max_mean",
    oracle="""
    SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(max(o_orderdate), '%Y-%m-%d') AS last_date,
           round(avg(o_totalprice) + 1e-9, 4) AS avg_price,
           count(*)::BIGINT AS n
    FROM orders
    """,
    covers=["A5"],
)
def a5_global_min_max_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/mean (`min(date)`, covid_data_transform.py:127;
    `np.max(population)`, covid_simulator.py:187)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
        F.round(F.avg("o_totalprice") + 1e-9, 4).alias("avg_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "a6_group_size_gate",
    oracle="""
    SELECT user_id, count(*)::BIGINT AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events GROUP BY user_id
    HAVING count(*) >= 50
    """,
    covers=["A6", "J8"],
)
def a6_group_size_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-size + freshness gate (`len(temp_df2) < 365*2` and stale
    last-date checks, weather_pred.py:187-189) → HAVING, not a loop."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
        )
        .filter(F.col("n_events") >= 50)
    )


@query(
    "a8_maxabs_normalize",
    oracle="""
    WITH denom AS (
        SELECT user_id, max(abs(value)) AS max_abs FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           round(e.value / d.max_abs + 1e-9, 6) AS value_norm
    FROM events e JOIN denom d ON e.user_id = d.user_id
    """,
    covers=["A8"],
)
def a8_maxabs_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-abs normalization per group (weather_pred.py:231-233):
    group agg + broadcast-join back + divide."""
    ev = table(spark, sf_dir, "events")
    denom = ev.groupBy("user_id").agg(F.max(F.abs(F.col("value"))).alias("max_abs"))
    return (
        ev.join(F.broadcast(denom), "user_id")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") / F.col("max_abs") + 1e-9, 6).alias("value_norm"),
        )
    )


@query(
    "a9_distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
    covers=["A9"],
)
def a9_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct values of a column (`drop_duplicates()` on a Series,
    covid_simulator.py:35,171)."""
    return table(spark, sf_dir, "events").select("event_type").distinct()


@query(
    "a10_row_dedup_subset",
    oracle="""
    SELECT o_custkey, o_orderstatus, count(*)::BIGINT AS n
    FROM (
        SELECT DISTINCT o_custkey, o_orderstatus FROM orders
    ) GROUP BY o_custkey, o_orderstatus
    """,
    covers=["A10"],
)
def a10_row_dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row dedup on a column subset (covid_data_transform.py:110;
    covid_simulator.py:372)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderstatus")
        .dropDuplicates()
        .groupBy("o_custkey", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "a11_zscore_standardize",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type) + 1e-9, 6) AS value_z
    FROM events
    """,
    covers=["A11"],
)
def a11_zscore_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization (covid_simulator.py:72,82,89,102) as a
    window aggregate — no second pass, no join."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        F.round(
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
            + 1e-9,
            6,
        ).alias("value_z"),
    )


@query(
    "a12_rmse_metric",
    oracle="""
    WITH m AS (SELECT user_id, avg(value) AS mu FROM events GROUP BY user_id)
    SELECT e.user_id,
           round(sqrt(avg(power(e.value - m.mu, 2))) + 1e-9, 6) AS rmse
    FROM events e JOIN m ON e.user_id = m.user_id
    GROUP BY e.user_id
    """,
    covers=["A12", "M9"],
)
def a12_rmse_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RMSE metric aggregate (weather_pred.py:83-84,338): per-group RMSE
    of value against the group-mean predictor."""
    ev = table(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(F.avg("value").alias("mu"))
    return (
        ev.join(F.broadcast(m), "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.sqrt(F.avg(F.pow(F.col("value") - F.col("mu"), 2))) + 1e-9, 6).alias(
                "rmse"
            )
        )
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "x_profile_columns",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, count({c})::BIGINT AS n,
               sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               min({c})::DOUBLE AS min_v, max({c})::DOUBLE AS max_v,
               round(avg({c}) + 1e-9, 4) AS mean_v
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    covers=["A5", "A9"],
)
def x_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the `ANALYZE`/data-quality pass a pipeline runs
    before training): per-column non-null count, null count, exact
    distinct count, min/max/mean — one row per column.

    One aggregation pass computes every metric; the multi-column exact
    DISTINCT makes Catalyst plan an Expand (one row copy per distinct
    aggregate) before the shuffle — exact profiling is a deliberate
    luxury. At 100 TB swap `countDistinct` for
    `approx_count_distinct` (HLL++, fixed state, no Expand) — the
    sketch variant of this query is ext_approx_sketches. The wide
    single row unpivots to long via `stack` (map-side, no shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.round(F.avg(c) + 1e-9, 4).alias(f"{c}__mean"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__min, {c}__max, {c}__mean"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n, n_null, n_distinct, min_v, max_v, mean_v)"
        )
    )


@query(
    "x_expectations_check",
    # one CASE-sum per rule over the same table — the SQL spelling of
    # the single-pass aggregation api.validate_expectations builds
    oracle="""
    WITH v AS (
      SELECT 'not_null:text' AS rule_id,
             sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_violations
      FROM documents
      UNION ALL
      SELECT 'unique:doc_id',
             (count(doc_id) - count(DISTINCT doc_id))::BIGINT
      FROM documents
      UNION ALL
      SELECT 'in_range:n_chars',
             sum(CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 1 OR n_chars > 400)
                 THEN 1 ELSE 0 END)::BIGINT
      FROM documents
      UNION ALL
      SELECT 'in_set:lang',
             sum(CASE WHEN lang IS NOT NULL
                       AND lang NOT IN ('en', 'de', 'fr')
                 THEN 1 ELSE 0 END)::BIGINT
      FROM documents
      UNION ALL
      SELECT 'regex:source',
             sum(CASE WHEN source IS NOT NULL
                       AND NOT regexp_matches(source, '^src[0-9]$')
                 THEN 1 ELSE 0 END)::BIGINT
      FROM documents
      UNION ALL
      SELECT 'consistent:n_chars',
             sum(CASE WHEN NOT (n_chars = length(text))
                 THEN 1 ELSE 0 END)::BIGINT
      FROM documents
    )
    SELECT rule_id, n_violations, n_violations = 0 AS passed FROM v
    """,
    covers=["A5", "A9"],
)
def x_expectations_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (api.validate_expectations) over
    the documents table — the expectations pass a pipeline runs before
    training or publishing a batch: presence, key uniqueness, numeric
    range, categorical domain, format regex, and a CROSS-COLUMN
    consistency expression (n_chars must equal length(text)). The rule
    mix deliberately includes failing rules (zh/es docs violate the
    lang domain; long docs violate the range; src10+ violate the
    regex) and passing ones, so the hash pins exact violation counts,
    not just zero/nonzero. Single scan: every row-predicate folds into
    one aggregation; the unique rule rides the same agg as an exact
    distinct count."""
    from engage_spark import api

    d = table(spark, sf_dir, "documents")
    return api.validate_expectations(
        d,
        [
            {"rule": "not_null", "col": "text"},
            {"rule": "unique", "col": "doc_id"},
            {"rule": "in_range", "col": "n_chars", "lo": 1, "hi": 400},
            {"rule": "in_set", "col": "lang", "values": ["en", "de", "fr"]},
            {"rule": "regex", "col": "source", "pattern": "^src[0-9]$"},
            {
                "rule": "expr",
                "id": "consistent:n_chars",
                "expr": "n_chars = length(text)",
            },
        ],
    )
