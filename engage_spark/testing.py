"""Oracle-parity harness mirroring the driver's t2 check.

Runs each registered query on Spark AND its DuckDB oracle SQL over the
same parquet tables, then compares row-count, schema (column names) and
values order-insensitively (columns sorted by name, rows sorted by all
columns, numeric tolerance for float residue).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from engage_spark.io import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # normalize bytes/None representations
            df[c] = df[c].map(lambda x: x if x is None else x)
    # stable order: sort by stringified rows
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   rtol: float = 1e-6, atol: float = 1e-6) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name, False,
            f"schema mismatch: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}")
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False,
            f"rowcount mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
            avf = av.astype(float).to_numpy()
            bvf = bv.astype(float).to_numpy()
            both_nan = np.isnan(avf) & np.isnan(bvf)
            close = np.isclose(avf, bvf, rtol=rtol, atol=atol) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                return CompareResult(
                    name, False,
                    f"value mismatch col={c} row={i}: {avf[i]!r} vs {bvf[i]!r}")
        else:
            av_s = av.astype(str).to_numpy()
            bv_s = bv.astype(str).to_numpy()
            if not (av_s == bv_s).all():
                neq = av_s != bv_s
                i = int(np.argmax(neq))
                return CompareResult(
                    name, False,
                    f"value mismatch col={c} row={i}: {av_s[i]!r} vs {bv_s[i]!r}")
    return CompareResult(name, True)


def run_parity(spark, sf_dir: str, names: list[str] | None = None,
               verbose: bool = True) -> list[CompareResult]:
    """Run every registered query with an oracle and compare."""
    from engage_spark.registry import load_all

    registry = load_all()
    con = duckdb_conn(sf_dir)
    results = []
    for qname, q in registry.items():
        if names and qname not in names:
            continue
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                ok = len(spark_pdf) >= 0
                results.append(CompareResult(qname, ok, f"rows-only: {len(spark_pdf)}"))
            else:
                oracle_pdf = con.execute(q.oracle).df()
                results.append(compare_frames(qname, spark_pdf, oracle_pdf))
        except Exception as e:  # noqa: BLE001 — harness reports, doesn't crash
            results.append(CompareResult(qname, False, f"EXCEPTION: {e}"))
        if verbose:
            r = results[-1]
            print(("PASS " if r.ok else "FAIL ") + r.name + (" " + r.detail if r.detail else ""))
    return results
