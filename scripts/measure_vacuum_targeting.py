"""Measure that the r12 file-targeted apply_deletes vacuum cost tracks
TOUCHED FILES, not dataset size.

Setup: Z-ordered datasets at 1x and FACTORx rows (same schema, same
clustered columns, more files at the bigger size), then the SAME
fixed-size takedown batch — keys drawn from ONE physical file — is
deleted and vacuumed on each. Under the r11 full double rewrite the
vacuum wall grew linearly with the dataset; file-targeted it should be
~flat (victim detection is a footer-pruned key-column probe; the
rewrite touches only the victim file(s) + staged commit).

Usage: python scripts/measure_vacuum_targeting.py [n_rows] [factor]
Prints ONE JSON line:
  {"op": "vacuum_targeting", "n1": ..., "nN": ..., "batch": ...,
   "t_vacuum_1x": ..., "t_vacuum_Nx": ..., "growth": ...,
   "rewritten_1x": ..., "kept_1x": ..., "rewritten_Nx": ..., "kept_Nx": ...}
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
    batch = 500
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("vacuum-targeting")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import engage_spark.io as io

    def frame(n: int):
        return spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 100_000).alias("a"),
            (F.col("id") % 16).alias("b"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )

    out = {"op": "vacuum_targeting", "batch": batch}
    for tag, n in (("1x", n1), (f"{factor}x", n1 * factor)):
        p = f"/tmp/vacuum_scale_{tag}"
        shutil.rmtree(p, ignore_errors=True)
        files = max(8, n // 125_000)
        io.zorder_write(spark, frame(n), p, ["a", "b"], bits=12,
                        num_files=files)
        io._zorder_file_ranges(spark, p)  # fill the stats manifest
        one_file = sorted(spark.read.parquet(p).inputFiles())[0]
        doomed = [
            r.k for r in spark.read.parquet(p)
            .withColumn("__f", F.input_file_name())
            .filter(F.col("__f") == one_file)
            .select("k").limit(batch).collect()
        ]
        io.delete_rows(spark, p, doomed, "k")
        t0 = time.perf_counter()
        vac = io.apply_deletes(spark, p)
        t = round(time.perf_counter() - t0, 3)
        key = tag if tag == "1x" else "Nx"
        out[f"t_vacuum_{key}"] = t
        out[f"rewritten_{key}"] = vac["rewritten_files"]
        out[f"kept_{key}"] = vac["kept_files"]
        out["n1" if tag == "1x" else "nN"] = n
        shutil.rmtree(p, ignore_errors=True)
    out["growth"] = round(out["t_vacuum_Nx"] / max(out["t_vacuum_1x"], 1e-9), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
