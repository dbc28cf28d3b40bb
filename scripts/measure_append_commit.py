"""Lease-held window of the staged-commit append (SCALE.md evidence).

Claim under test: append_dataset on a version-logged target holds the
maintenance lease only for its rename+log commit tail — a window that
is O(files in the increment) metadata work, independent of the bytes
written — so concurrent ingesters serialize on milliseconds-to-seconds
of bookkeeping instead of the full data-write duration (the pre-r14
shape, where the lease spanned the whole write).

Method: version-logged events dataset; append R-replicated slices with
the lease context manager instrumented to record held-time; report
total wall vs lease-held seconds per append at growing slice sizes,
then run 4 appenders concurrently and compare their wall to the sum of
sequential walls (overlap factor; muted on one shared local[32] JVM —
the staged writes contend for the same cores — but >1 means the stage
phases genuinely overlapped).

Usage: python scripts/measure_append_commit.py [sf_dir] [R...]
Prints ONE JSON line per measurement.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import threading
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(r) for r in sys.argv[2:]] or [1, 10]

    import engage_spark.io as eio
    from engage_spark.io import append_dataset, write_parquet
    from engage_spark.session import get_spark
    from engage_spark.versioning import version_log_enable

    spark = get_spark()
    held: list = []
    real_enter = eio.maintenance_lease.__enter__
    real_exit = eio.maintenance_lease.__exit__

    def timed_enter(self):
        out = real_enter(self)
        self._t0 = time.monotonic()
        return out

    def timed_exit(self, *a):
        held.append(time.monotonic() - self._t0)
        return real_exit(self, *a)

    eio.maintenance_lease.__enter__ = timed_enter
    eio.maintenance_lease.__exit__ = timed_exit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    root = tempfile.mkdtemp(prefix="append_commit_")

    for r in reps:
        ds = f"{root}/ds_r{r}"
        write_parquet(ev, ds)
        version_log_enable(spark, ds)
        slice_df = ev
        for i in range(1, r):
            slice_df = slice_df.unionByName(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 10_000_000)
                )
            )
        held.clear()
        t0 = time.monotonic()
        res = append_dataset(spark, slice_df, ds)
        wall = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "mode": "single",
                    "replication": r,
                    "rows": slice_df.count(),
                    "files": res["files"],
                    "wall_s": round(wall, 3),
                    "lease_held_s": round(sum(held), 3),
                    "held_fraction": round(sum(held) / wall, 3),
                }
            ),
            flush=True,
        )

    # 4 concurrent appenders vs the same 4 sequential
    ds = f"{root}/ds_conc"
    write_parquet(ev, ds)
    version_log_enable(spark, ds)
    slices = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * 10_000_000))
        for k in range(1, 5)
    ]
    t0 = time.monotonic()
    for s in slices:
        append_dataset(spark, s, ds)
    seq_wall = time.monotonic() - t0

    ds2 = f"{root}/ds_conc2"
    write_parquet(ev, ds2)
    version_log_enable(spark, ds2)
    errs: list = []

    def worker(s):
        try:
            append_dataset(spark, s, ds2)
        except Exception as e:  # pragma: no cover
            errs.append(str(e))

    ts = [threading.Thread(target=worker, args=(s,)) for s in slices]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    conc_wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "mode": "4-appenders",
                "sequential_wall_s": round(seq_wall, 3),
                "concurrent_wall_s": round(conc_wall, 3),
                "overlap_factor": round(seq_wall / conc_wall, 2),
                "errors": errs,
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
