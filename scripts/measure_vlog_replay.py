"""Measure that version-log file replay stays FLAT in total version
count once snapshot checkpoints exist (r13 — VERDICT r12 missing #3).

Setup: one small dataset accumulates N logical-delete versions (each a
one-entry commit; auto-snapshots fire every _SNAPSHOT_EVERY commits).
We then time (a) the pure-python _replay_files walk and (b) a full
read_version planning+count, both against the real entry list and
against the same list with its snapshot entries STRIPPED (the pre-r13
replay-from-v1 shape).

Usage: python scripts/measure_vlog_replay.py [n_versions]
Prints ONE JSON line:
  {"op": "vlog_replay", "versions": ..., "entries_walked_ckpt": ...,
   "entries_walked_nockpt": ..., "t_replay_ckpt_us": ...,
   "t_replay_nockpt_us": ..., "t_read_version": ...}
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
    n_versions = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("vlog-replay")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.io import delete_rows, zorder_write
    from engage_spark.versioning import (
        _replay_files,
        _vlog_entries,
        read_version,
        version_log_enable,
    )

    path = "/tmp/_vlog_replay"
    shutil.rmtree(path, ignore_errors=True)
    df = spark.range(200_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("a"),
        (F.col("id") * 31 % 791).alias("b"),
    )
    zorder_write(spark, df, path, ["a", "b"], bits=16, num_files=8)
    version_log_enable(spark, path)
    for i in range(n_versions):
        delete_rows(spark, path, [10_000_000 + i], "k")

    entries = _vlog_entries(spark, path)
    latest = entries[-1]["version"]
    stripped = [e for e in entries if e["op"] != "snapshot"]

    def _time_replay(es):
        t0 = time.perf_counter()
        for _ in range(200):
            files = _replay_files(es, latest)
        return files, (time.perf_counter() - t0) / 200 * 1e6

    files_c, us_c = _time_replay(entries)
    files_n, us_n = _time_replay(stripped)
    assert sorted(files_c) == sorted(files_n)

    # walked-entry counts: checkpointed replay starts at the last
    # snapshot <= latest; the stripped list walks everything
    last_snap = max(
        (i for i, e in enumerate(entries) if e["op"] == "snapshot"),
        default=0,
    )
    out = {
        "op": "vlog_replay",
        "versions": latest,
        "entries_walked_ckpt": len(entries) - last_snap,
        "entries_walked_nockpt": len(stripped),
        "t_replay_ckpt_us": round(us_c, 1),
        "t_replay_nockpt_us": round(us_n, 1),
    }
    t0 = time.time()
    read_version(spark, path, latest).count()
    out["t_read_version"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
