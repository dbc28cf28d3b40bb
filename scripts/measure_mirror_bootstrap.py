"""Measure the DISTRIBUTED mirror bootstrap (r13 — VERDICT r12 weak
#1): the first sync's 1:1 file copy fans out over executors, so wall
should scale ~linearly with total bytes at fixed per-file size (i.e.
flat per-core), not with a serial per-file driver loop.

Setup: datasets at 1x and FACTORx rows written at a FIXED file size
(file count grows with the factor, past _BOOTSTRAP_DRIVER_MAX so both
runs take the distributed path). Each is bootstrapped into a fresh
mirror; the serial driver loop (the pre-r13 shape) is timed alongside
at both sizes as the anti-baseline, and names/byte-sizes are verified
identical to the source.

Usage: python scripts/measure_mirror_bootstrap.py [n_rows] [factor]
Prints ONE JSON line:
  {"op": "mirror_bootstrap", "n1": ..., "files_1x": ...,
   "t_dist_1x": ..., "t_dist_Nx": ..., "t_serial_1x": ...,
   "t_serial_Nx": ..., "growth_dist": ..., "layout_ok": true}
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


def _sizes(root: str) -> dict:
    out = {}
    for dirp, _dirs, files in os.walk(root):
        if "_" in os.path.relpath(dirp, root).split(os.sep)[0]:
            continue
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            full = os.path.join(dirp, f)
            out[os.path.relpath(full, root)] = os.path.getsize(full)
    return out


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("mirror-bootstrap")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark import versioning as v_mod
    from engage_spark.io import zorder_write
    from engage_spark.versioning import (
        _bootstrap_copy,
        _live_names,
        sync_mirror,
        version_log_enable,
    )

    base = "/tmp/_mirror_bootstrap"
    shutil.rmtree(base, ignore_errors=True)
    out = {"op": "mirror_bootstrap", "n1": n1, "nN": n1 * factor}
    rows_per_file = 25_000  # fixed file size; count grows with factor

    layout_ok = True
    for tag, n in (("1x", n1), (f"{factor}x", n1 * factor)):
        path = f"{base}/{tag}"
        df = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 9973).alias("a"),
            (F.col("id") * 31 % 7919).alias("b"),
        )
        files = max(4, n // rows_per_file)
        zorder_write(spark, df, path, ["a", "b"], bits=16, num_files=files)
        version_log_enable(spark, path)
        out[f"files_{tag}"] = len(spark.read.parquet(path).inputFiles())

        mirror = f"{path}_mirror"
        t0 = time.time()
        sync_mirror(spark, path, mirror, "k")  # distributed bootstrap
        out[f"t_dist_{tag}"] = round(time.time() - t0, 3)
        layout_ok = layout_ok and (_sizes(path) == _sizes(mirror))

        # anti-baseline: the pre-r13 serial driver loop (FileUtil.copy
        # per file from the driver)
        serial = f"{path}_serial"
        os.makedirs(serial, exist_ok=True)
        names = _live_names(spark, path)
        t0 = time.time()
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        from engage_spark.io import _hadoop_fs

        for name in names:
            sfs, sp = _hadoop_fs(spark, f"{path}/{name}")
            dfs_, dp = _hadoop_fs(spark, f"{serial}/{name}")
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                sfs, sp, dfs_, dp, False, True, conf
            )
        out[f"t_serial_{tag}"] = round(time.time() - t0, 3)
        assert v_mod._BOOTSTRAP_DRIVER_MAX < out[f"files_{tag}"]

    out["growth_dist"] = round(
        out[f"t_dist_{factor}x"] / max(out["t_dist_1x"], 1e-9), 2
    )
    out["growth_serial"] = round(
        out[f"t_serial_{factor}x"] / max(out["t_serial_1x"], 1e-9), 2
    )
    out["layout_ok"] = layout_ok
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
