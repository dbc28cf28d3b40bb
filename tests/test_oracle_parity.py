"""Mirror of the driver's t2 gate: every registered query with an oracle
must match DuckDB on the same parquet tables (rowcount + schema +
order-insensitive values)."""

from __future__ import annotations

import pytest

from engage_spark.registry import load_all
from engage_spark.testing import compare_frames, duckdb_conn

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    oracle_pdf = con.execute(q.oracle).df()
    result = compare_frames(name, spark_pdf, oracle_pdf)
    assert result.ok, result.detail


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    q = REGISTRY[name]
    pdf = q.fn(spark, sf_dir).toPandas()
    assert len(pdf) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert e.queries().keys() >= set(e.oracle_sql().keys())
