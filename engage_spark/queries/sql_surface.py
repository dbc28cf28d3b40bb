"""SQL surface (SURVEY.md §2.9) — the reference's two embedded-SQL queries,
re-expressed as `spark.sql` over temp views (Catalyst replaces SQLite).

Dialect deltas handled here: `ifnull` → Spark supports it natively,
`julianday(a) > julianday(b)` → direct date comparison, `||` concat →
Spark supports `||`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from engage_spark.io import table
from engage_spark.registry import query


@query(
    "sql1_ordinal_groupby_ifnull",
    oracle="""
    SELECT user_id, event_type,
           round(avg(coalesce(nullif(value, 0.0), 0.0)) + 1e-9, 4) AS avg_value,
           count(*)::BIGINT AS n
    FROM events
    GROUP BY 1, 2
    """,
    covers=["A7", "SQL1"],
)
def sql1_ordinal_groupby_ifnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-replica (on the events analog) of the reference's first embedded-SQL query (`test_covid`,
    covid_simulator.py:63-69): projection + `avg(ifnull(c,0))` +
    GROUP BY ordinals (Spark supports ordinal group-by natively)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT user_id, event_type,
               round(avg(ifnull(nullif(value, 0.0D), 0.0D)) + 1e-9D, 4) AS avg_value,
               count(*) AS n
        FROM events_v
        GROUP BY 1, 2
        """
    )


@query(
    "sql2_causal_features",
    oracle="""
    SELECT DISTINCT
        event_type || '-' || (user_id % 5)::VARCHAR AS cohort,
        round(value / 10.0, 4) AS value_scaled,
        CASE WHEN value < 5 THEN 1 ELSE 0 END AS is_freezing,
        CASE WHEN value >= 5 AND value < 10 THEN 1 ELSE 0 END AS is_cold,
        CASE WHEN value >= 10 AND value < 15 THEN 1 ELSE 0 END AS is_mild,
        CASE WHEN value >= 15 AND value < 20 THEN 1 ELSE 0 END AS is_warm,
        CASE WHEN value >= 20 THEN 1 ELSE 0 END AS is_hot,
        CASE WHEN ts > TIMESTAMP '2024-06-01 00:00:00' THEN 1 ELSE 0 END AS gov_action
    FROM events
    """,
    covers=["SQL2", "F8", "F15", "F14", "A10"],
)
def sql2_causal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-replica (on the events analog) of the reference's second embedded-SQL query
    (`causal_simulation`, covid_simulator.py:359-372): column aliasing,
    arithmetic (`TAVG/10`), `||` string concat, five CASE WHEN bands, a
    julianday-style date comparison, then `dropDuplicates` on the result.
    """
    table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT event_type || '-' || CAST(user_id % 5 AS STRING) AS cohort,
               round(value / 10.0, 4) AS value_scaled,
               CASE WHEN value < 5 THEN 1 ELSE 0 END AS is_freezing,
               CASE WHEN value >= 5 AND value < 10 THEN 1 ELSE 0 END AS is_cold,
               CASE WHEN value >= 10 AND value < 15 THEN 1 ELSE 0 END AS is_mild,
               CASE WHEN value >= 15 AND value < 20 THEN 1 ELSE 0 END AS is_warm,
               CASE WHEN value >= 20 THEN 1 ELSE 0 END AS is_hot,
               CASE WHEN ts > TIMESTAMP '2024-06-01 00:00:00' THEN 1 ELSE 0 END
                   AS gov_action
        FROM events_v
        """
    ).dropDuplicates()
