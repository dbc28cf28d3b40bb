"""Measure the r15 log-owned read path: versioned read planning must be
flat in live-file count (no per-read directory walk), with the walk
cost reported alongside as what the old shape paid per read.

Setup: one versioned dataset per file count (a single append commit of
N right-sized files + a logical delete so the DV path is exercised).
For each N we time:
  - t_walk_s:  one `_live_names` walk (what every read USED to pay,
               twice: once in reconcile's drift diff, once in
               _read_names resolution)
  - t_plan_s:  log-owned read_version planning (log read + replay +
               DataFrame construction over explicit file paths)
  - t_count_s: the full count() on top (scan cost, for context)

Usage: python scripts/measure_logowned_reads.py [file_counts...]
Prints ONE JSON line per file count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("logowned-reads")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.io import delete_rows, write_parquet
    from engage_spark.versioning import (
        _live_names,
        latest_version,
        read_version,
        version_log_enable,
    )

    for n_files in counts:
        path = f"/tmp/_logowned_{n_files}"
        shutil.rmtree(path, ignore_errors=True)
        df = spark.range(max(200_000, n_files * 64)).select(
            F.col("id").alias("k"),
            (F.col("id") % 997).alias("a"),
        )
        write_parquet(df.repartition(n_files), path)
        version_log_enable(spark, path)
        delete_rows(
            spark, path,
            spark.range(50).select(F.col("id").alias("k")), "k",
        )
        hi = latest_version(spark, path)

        t0 = time.perf_counter()
        names = _live_names(spark, path)
        t_walk = time.perf_counter() - t0
        assert len(names) == n_files

        # warm JVM metadata caches out of the comparison
        read_version(spark, path, hi)
        t0 = time.perf_counter()
        got = read_version(spark, path, hi)
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = got.count()
        t_count = time.perf_counter() - t0
        assert n > 0
        print(json.dumps({
            "op": "logowned_reads",
            "files": n_files,
            "t_walk_s": round(t_walk, 4),
            "t_plan_s": round(t_plan, 4),
            "t_count_s": round(t_count, 4),
        }), flush=True)
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
