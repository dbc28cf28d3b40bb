"""Driver simulation for /root/repo/__spark_entry__.py (verify skill).

Fresh-process import of the entry module, local[8] Spark, DuckDB oracle
views over sf0.01, per-query compare: rowcount + sorted column names +
sha256 of row-sorted / column-sorted / float-rounded(6dp) values.
Exit 1 on any FAIL.
"""

import hashlib
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("DRIVER_SIM_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda x: round(x, 6) if isinstance(x, float) else x
            )
    s = pdf.astype(str)
    if not len(s):
        return hashlib.sha256(b"").hexdigest()
    key = s.agg("|".join, axis=1).sort_values(kind="mergesort")
    return hashlib.sha256("\n".join(key).encode()).hexdigest()


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("drive_entry")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # probe 1: entry() twice, stable schema, rows >= 0
    e1 = entrymod.entry(spark)
    schema1 = e1.schema
    n1 = e1.count()
    e2 = entrymod.entry(spark)
    assert e2.schema == schema1, "entry() schema not stable"
    assert n1 >= 0
    print(f"entry(): {n1} rows, schema stable")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle_sql keys not subset of queries"

    # probe 2: nonexistent sf_dir raises cleanly
    some = next(iter(qs))
    try:
        qs[some](spark, "/root/testdata/does_not_exist").limit(1).collect()
        print("WARN: nonexistent sf_dir did not raise")
    except Exception as e:
        print(f"nonexistent sf_dir -> {type(e).__name__} (clean)")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF}/{t}.parquet')"
        )

    # optional argv filters: run only queries whose name contains any
    # of the given substrings (targeted re-checks while iterating)
    pats = sys.argv[1:]
    if pats:
        qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
        print(f"filtered to {len(qs)} queries: {sorted(qs)}")

    n_pass = n_rows_only = n_fail = 0
    for name, fn in qs.items():
        try:
            pdf = fn(spark, SF).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:160]}")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(pdf)} rows")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        if len(pdf) != len(opdf):
            print(f"FAIL {name}: rowcount {len(pdf)} vs {len(opdf)}")
            n_fail += 1
            continue
        if sorted(pdf.columns) != sorted(opdf.columns):
            print(
                f"FAIL {name}: schema {sorted(pdf.columns)} vs {sorted(opdf.columns)}"
            )
            n_fail += 1
            continue
        if canon_hash(pdf) != canon_hash(opdf):
            print(f"FAIL {name}: value hash mismatch ({len(pdf)} rows)")
            n_fail += 1
            continue
        print(f"PASS {name}")
        n_pass += 1

    print(f"\nSUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
