"""Measure that draining the change data feed costs what the CHANGES
touched, not what the corpus weighs.

Setup: Z-ordered datasets at 1x and FACTORx rows, version log enabled,
then the SAME fixed-size change set applied to each — one appended
batch (v2) and one takedown-batch logical delete with keys drawn from
ONE physical file (v3). read_changes(1) must then read the appended
files plus a footer-pruned key probe of the prior snapshot; its wall
should stay ~flat as the corpus grows. A full-snapshot-diff consumer
(the x_snapshot_diff shape) is timed alongside as the anti-baseline.

Usage: python scripts/measure_cdf_scaling.py [n_rows] [factor]
Prints ONE JSON line:
  {"op": "cdf_scaling", "n1": ..., "nN": ..., "append": ..., "batch":
   ..., "t_drain_1x": ..., "t_drain_Nx": ..., "growth": ...,
   "t_fulldiff_Nx": ..., "rows_1x": ..., "rows_Nx": ...}
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
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    append_n, batch = 5_000, 500
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("cdf-scaling")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.io import delete_rows, zorder_append, zorder_write
    from engage_spark.versioning import read_changes, version_log_enable

    base = "/tmp/_cdf_scaling"
    shutil.rmtree(base, ignore_errors=True)
    out = {"op": "cdf_scaling", "n1": n1, "nN": n1 * factor,
           "append": append_n, "batch": batch}

    for tag, n in (("1x", n1), (f"{factor}x", n1 * factor)):
        path = f"{base}/{tag}"
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("a"),
            (F.col("id") * 31 % 7919).alias("b"),
        )
        files = max(4, n // 250_000)
        zorder_write(spark, df, path, ["a", "b"], bits=16, num_files=files)
        version_log_enable(spark, path)                            # v1
        # the real consumer: layout-preserving file-copy bootstrap at
        # v1, then an incremental drain AFTER the mutations below
        from engage_spark.versioning import sync_mirror

        mirror = f"{path}_mirror"
        sync_mirror(spark, path, mirror, "k")
        inc = spark.range(n, n + append_n).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("a"),
            (F.col("id") * 31 % 7919).alias("b"),
        )
        zorder_append(spark, inc, path, num_files=1)               # v2
        # takedown keys clustered in ONE physical file, the realistic
        # shape for an id-range takedown on a clustered layout
        one_file = spark.read.parquet(path).select(
            F.input_file_name().alias("f"), "k"
        )
        f0 = one_file.select("f").first()["f"]
        keys = (
            one_file.filter(F.col("f") == f0).select("k").limit(batch)
        )
        delete_rows(spark, path, keys, "k")                        # v3
        # steady state: pass-3 min (codegen/worker warmup amortized)
        walls = []
        for _ in range(3):
            t0 = time.time()
            rows = read_changes(spark, path, 1).count()
            walls.append(time.time() - t0)
        out[f"t_drain_{tag}"] = round(min(walls), 3)
        out[f"rows_{tag}"] = rows
        # full consumer: the incremental apply of the same fixed
        # change set onto the copy-bootstrapped mirror
        t0 = time.time()
        sync_mirror(spark, path, mirror, "k")
        out[f"t_sync_{tag}"] = round(time.time() - t0, 3)

    # anti-baseline at the big size: materialized two-copy diff shape
    big = f"{base}/{factor}x"
    live = spark.read.parquet(big)
    t0 = time.time()
    live.exceptAll(live.limit(0)).count()  # one full scan + set-op pass
    out[f"t_fulldiff_{factor}x"] = round(time.time() - t0, 3)
    out["growth"] = round(
        out[f"t_drain_{factor}x"] / max(out["t_drain_1x"], 1e-9), 2
    )
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
