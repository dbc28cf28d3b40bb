"""Data-skipping effectiveness of file-level min/max stats
(SCALE.md evidence).

Claim under test: on a Z-ordered layout, a narrow range query through
``stats.read_where`` schedules a small FRACTION of the files — pruned
driver-side from the `_versions/stats` sidecar before the scan is
planned — and the pruned read returns exactly what filtering the full
read returns. Parquet footer row-group pruning already skips the same
BYTES; what the sidecar removes is the per-file open+footer-probe work
that dominates planning at 10^5-file scale, so the local wall-clock
delta understates the cluster win (here both paths pay one driver;
there the unpruned path pays listing + footer reads across the fleet).

Method: Z-order `events` (sf dir arg) on (user_id, v_cents) into N
files, enable the version log + stats, then for a ladder of range
widths on user_id measure (a) files kept vs total, (b) wall of
read_where vs a plain filtered path read, (c) result-count equality.

Usage: python scripts/measure_stats_pruning.py [sf_dir] [num_files]
Prints ONE JSON line per range width:
  {"range": [lo, hi], "files_kept": k, "files_total": n,
   "pruned_wall_s": ..., "plain_wall_s": ..., "rows": r, "exact": true}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from engage_spark.io import zorder_write
    from engage_spark.session import get_spark
    from engage_spark.stats import _stats_prune, read_where, stats_enable
    from engage_spark.versioning import (
        _replay_files,
        _vlog_entries,
        latest_version,
        version_log_enable,
    )

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="stats_prune_")
    ds = f"{root}/events_z"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    zorder_write(
        spark, ev, ds, ["user_id", "v_cents"], bits=16, num_files=num_files
    )
    version_log_enable(spark, ds)
    t0 = time.monotonic()
    n_backfilled = stats_enable(spark, ds, ["user_id", "v_cents"])
    harvest_s = time.monotonic() - t0
    names = _replay_files(_vlog_entries(spark, ds), latest_version(spark, ds))
    print(
        json.dumps(
            {
                "backfilled_files": n_backfilled,
                "harvest_s": round(harvest_s, 3),
            }
        ),
        flush=True,
    )

    u_max = ev.agg(F.max("user_id")).collect()[0][0]
    for frac in (0.005, 0.02, 0.1, 0.5):
        lo = int(u_max * 0.4)
        hi = lo + max(1, int(u_max * frac))
        kept, _ = _stats_prune(spark, ds, names, "user_id", lo, hi)
        t0 = time.monotonic()
        r_pruned = read_where(spark, ds, "user_id", lo, hi).count()
        pruned_s = time.monotonic() - t0
        # the apples-to-apples twin: the SAME versioned read machinery
        # (reconcile + log replay + retained resolution) without the
        # stats prune — isolates what pruning buys inside the path
        t0 = time.monotonic()
        from engage_spark.versioning import read_version

        r_vfull = (
            read_version(spark, ds, latest_version(spark, ds))
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .count()
        )
        vfull_s = time.monotonic() - t0
        t0 = time.monotonic()
        r_plain = (
            spark.read.parquet(ds)
            .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
            .count()
        )
        plain_s = time.monotonic() - t0
        print(
            json.dumps(
                {
                    "range": [lo, hi],
                    "files_kept": len(kept),
                    "files_total": len(names),
                    "pruned_wall_s": round(pruned_s, 3),
                    "versioned_unpruned_wall_s": round(vfull_s, 3),
                    "plain_wall_s": round(plain_s, 3),
                    "rows": r_pruned,
                    "exact": r_pruned == r_vfull == r_plain,
                }
            ),
            flush=True,
        )
    shutil.rmtree(root, ignore_errors=True)


def files_scaling() -> None:
    """File-count scaling: fixed data volume and range width, growing
    file count — the dimension the sidecar exists for. The plain path's
    planning cost (listing + footer probe per file) grows with file
    count even when row-group pruning then skips the bytes; the
    pruned path schedules only overlap-possible files, so its cost
    tracks the RANGE, not the file count.

    Usage: python scripts/measure_stats_pruning.py --files [sf_dir]
    """
    import json
    import shutil
    import sys
    import tempfile
    import time

    from pyspark.sql import functions as F

    from engage_spark.io import zorder_write
    from engage_spark.session import get_spark
    from engage_spark.stats import _stats_prune, read_where, stats_enable
    from engage_spark.versioning import (
        _replay_files,
        _vlog_entries,
        latest_version,
        version_log_enable,
    )

    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    u_max = ev.agg(F.max("user_id")).collect()[0][0]
    lo, hi = int(u_max * 0.4), int(u_max * 0.4) + max(1, int(u_max * 0.005))
    for nf in (64, 512, 2048):
        root = tempfile.mkdtemp(prefix=f"stats_files_{nf}_")
        ds = f"{root}/z"
        zorder_write(spark, ev, ds, ["user_id", "v_cents"], bits=16,
                     num_files=nf)
        version_log_enable(spark, ds)
        t0 = time.monotonic()
        stats_enable(spark, ds, ["user_id"])
        harvest_s = time.monotonic() - t0
        names = _replay_files(
            _vlog_entries(spark, ds), latest_version(spark, ds)
        )
        kept, _ = _stats_prune(spark, ds, names, "user_id", lo, hi)
        # min of 3 passes each (steady-state planning cost, not first-
        # touch codegen)
        pruned_w, plain_w = [], []
        for _i in range(3):
            t0 = time.monotonic()
            rp = read_where(spark, ds, "user_id", lo, hi).count()
            pruned_w.append(time.monotonic() - t0)
            t0 = time.monotonic()
            rq = (
                spark.read.parquet(ds)
                .filter((F.col("user_id") >= lo) & (F.col("user_id") <= hi))
                .count()
            )
            plain_w.append(time.monotonic() - t0)
        print(
            json.dumps(
                {
                    "num_files": nf,
                    "harvest_s": round(harvest_s, 3),
                    "files_kept": len(kept),
                    "pruned_wall_s": round(min(pruned_w), 3),
                    "plain_wall_s": round(min(plain_w), 3),
                    "exact": rp == rq,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--files":
        files_scaling()
    else:
        main()
