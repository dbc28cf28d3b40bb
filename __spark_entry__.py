"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 as a named
(spark, sf_dir) -> DataFrame callable.
``oracle_sql()`` — matching DuckDB ANSI-SQL per query (omitted for
non-SQL-expressible kernel ops → driver does rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engage_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (keys subset of queries())."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
