"""Measure what the optimistic OPTIMIZE (r14) buys a concurrent
ingester: wall time of an append_dataset issued MID-OPTIMIZE vs the
same append on an idle dataset. Before OCC, the appender's commit tail
queued behind a lease held across the optimize's whole victim rewrite;
now the optimize holds the lease only for its retain+rename+log tail,
so the append should land at ~its solo latency while the rewrite runs.

Usage: python scripts/measure_optimize_occ.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from engage_spark.io import append_dataset, optimize_incremental, zorder_write, zorder_append
    from engage_spark.session import get_spark
    from engage_spark.versioning import dataset_history, version_log_enable

    spark = get_spark()
    root = tempfile.mkdtemp(prefix="occ_opt_measure_")
    ds = f"{root}/events"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    base = ev.filter(F.col("event_id") % 4 < 2)
    overlap = ev.filter(F.col("event_id") % 4 == 2)
    inc = ev.filter(F.col("event_id") % 4 == 3)

    # solo append latency on an idle (already-overlapping) layout
    zorder_write(spark, base, ds, ["user_id", "v_cents"], bits=16, num_files=16)
    version_log_enable(spark, ds)
    zorder_append(spark, overlap, ds, num_files=8)  # degrade layout
    t0 = time.monotonic()
    append_dataset(spark, inc.limit(20_000), ds)
    solo_s = time.monotonic() - t0

    # fresh dataset; append mid-optimize
    ds2 = f"{root}/events2"
    zorder_write(spark, base, ds2, ["user_id", "v_cents"], bits=16, num_files=16)
    version_log_enable(spark, ds2)
    zorder_append(spark, overlap, ds2, num_files=8)
    res: dict = {}

    def opt() -> None:
        t = time.monotonic()
        try:
            res["opt"] = optimize_incremental(
                spark, ds2, target_file_bytes=1 << 22, lease_wait_s=180.0
            )
        except Exception as e:  # surfaced below, not as a KeyError
            res["err"] = repr(e)
            res["opt"] = {"rewritten_files": -1}
        res["opt_s"] = time.monotonic() - t

    th = threading.Thread(target=opt)
    th.start()
    time.sleep(0.3)  # let the optimize enter its unleased rewrite
    t0 = time.monotonic()
    append_dataset(spark, inc.limit(20_000), ds2, lease_wait_s=180.0)
    mid_s = time.monotonic() - t0
    th.join()
    ops = [r.op for r in dataset_history(spark, ds2).collect()]
    out = {
        "solo_append_s": round(solo_s, 3),
        "append_during_optimize_s": round(mid_s, 3),
        "optimize_s": round(res["opt_s"], 3),
        "optimize_rewrote": res["opt"]["rewritten_files"],
        "history_ops": ops,
        "reconciles": ops.count("reconcile"),
        "optimize_error": res.get("err"),
    }
    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
