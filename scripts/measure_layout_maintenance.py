"""Measure the r11 layout-maintenance ops at a blown-up scale:

(A) deletion vectors — read_with_deletes wall vs a raw scan at 0 /
    100 / 5000 deleted keys (the claim: a takedown-batch-sized
    broadcast anti-join, flat in dataset size and near-flat in
    tombstone count), plus delete_rows takedown latency itself.
(B) incremental vs full OPTIMIZE after a 1% narrow-region append (the
    claim: optimize_incremental rewrites only the overlap victims, so
    its wall tracks the appended slice, not the table).

Usage: python scripts/measure_layout_maintenance.py [n_rows]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("layout-maintenance")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.io import (
        apply_deletes,
        delete_rows,
        optimize_dataset,
        optimize_incremental,
        read_with_deletes,
        zorder_append,
        zorder_layout_stats,
        zorder_write,
    )

    def frame(n_rows: int, lo: int, hi: int, id0: int = 0, b_mod: int = 1024):
        span = hi - lo
        return spark.range(n_rows).select(
            (F.col("id") + id0).alias("k"),
            (F.lit(lo) + (F.col("id") * span) / n_rows).cast("long").alias("a"),
            (F.col("id") % b_mod).alias("b"),
        )

    base = "/tmp/layout_maint"
    shutil.rmtree(base, ignore_errors=True)
    p = f"{base}/ds"
    zorder_write(spark, frame(n, 0, 10_000_000), p, ["a", "b"], bits=12,
                 num_files=32)

    def best(fn, reps=3):
        b = None
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            t = time.perf_counter() - t0
            b = t if b is None else min(b, t)
        return round(b, 3)

    # (A) deletion vectors
    raw_scan = best(lambda: spark.read.parquet(p).groupBy().sum("a").collect())
    rwd_0 = best(lambda: read_with_deletes(spark, p).groupBy().sum("a").collect())
    t0 = time.perf_counter()
    delete_rows(spark, p, range(0, 1000, 10), "k")  # 100 keys
    takedown_100_s = round(time.perf_counter() - t0, 3)
    rwd_100 = best(
        lambda: read_with_deletes(spark, p).groupBy().sum("a").collect()
    )
    delete_rows(spark, p, range(10_000, 59_000, 10), "k")  # +4900 keys
    rwd_5000 = best(
        lambda: read_with_deletes(spark, p).groupBy().sum("a").collect()
    )
    t0 = time.perf_counter()
    vac = apply_deletes(spark, p)
    vacuum_s = round(time.perf_counter() - t0, 3)

    # (B) incremental vs full OPTIMIZE after a 1% CURVE-LOCALIZED
    # append (narrow in BOTH clustered dims — the time-ordered-append
    # shape; an append spanning a secondary dim's full range has wide
    # z-intervals and degrades victim selection toward a full rewrite,
    # the same condition under which footer pruning would degrade)
    zorder_append(
        spark, frame(n // 100, 0, 100_000, id0=50_000_000, b_mod=16), p,
        num_files=2,
    )
    drift = zorder_layout_stats(spark, p)
    t0 = time.perf_counter()
    inc = optimize_incremental(spark, p)
    inc_s = round(time.perf_counter() - t0, 3)
    after = zorder_layout_stats(spark, p)
    # full rewrite of the same data for comparison
    t0 = time.perf_counter()
    optimize_dataset(spark, p, f"{base}/full", ["a", "b"], bits=12)
    full_s = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "n_rows": n,
        "raw_scan_s": raw_scan,
        "read_with_deletes_0_s": rwd_0,
        "read_with_deletes_100_s": rwd_100,
        "read_with_deletes_5000_s": rwd_5000,
        "takedown_100_s": takedown_100_s,
        "vacuum_s": vacuum_s,
        "vacuumed_keys": vac["deleted_keys"],
        "drift_overlap_pairs": drift["overlap_pairs"],
        "incremental_s": inc_s,
        "incremental_rewritten": inc["rewritten_files"],
        "incremental_kept": inc["kept_files"],
        "post_overlap_pairs": after["overlap_pairs"],
        "full_optimize_s": full_s,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
