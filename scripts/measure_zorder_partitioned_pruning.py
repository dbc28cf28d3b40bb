"""File-skipping measurement for the HIVE-PARTITIONED + Z-CLUSTERED
layout (r13 io.zorder_write(partition_by=...)) — does directory
pruning actually COMPOSE with footer-stats pruning?

Method: lay out sf0.1 `events` two ways — flat Z-order on
(user_id, v_cents), and partitioned by event_type with the same
Z-clustering inside each partition dir — then evaluate, for the
lookup shape `event_type = X AND (user_id, v_cents) in a 1/8 x 1/8
quantile box`:

  - directory pruning: files outside event_type=X never even listed
    into the scan (hive partition pruning);
  - footer pruning: among the partition's files, row-group min/max
    stats exclude files whose z-rectangle misses the box.

kept/total counts the files a Spark scan would actually read out of
the WHOLE corpus. The flat layout footer-prunes on all three columns
(the event_type equality included); EVERY partition value is measured
and the per-type spread reported, so the comparison is not a
best-case pick.

Usage: python scripts/measure_zorder_partitioned_pruning.py [sf_dir] [files]
Prints ONE JSON line:
  {"box": ..., "flat_total": n, "part_total": n,
   "per_type": {type: {"flat_kept", "part_kept", "dir_pruned"}},
   "mean_flat_kept": ..., "mean_part_kept": ...}
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _kept(files, preds) -> int:
    keep = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {c: i for i, c in enumerate(md.schema.names)}
        overlaps = True
        for col, (qlo, qhi) in preds.items():
            if col not in names:
                continue  # partition column: not in the data file
            stats = [
                md.row_group(g).column(names[col]).statistics
                for g in range(md.num_row_groups)
            ]
            smin = min(s.min for s in stats)
            smax = max(s.max for s in stats)
            if smax < qlo or smin > qhi:
                overlaps = False
        keep += overlaps
    return keep


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_files = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    from pyspark.sql import functions as F

    from engage_spark.io import table, zorder_write
    from engage_spark.session import get_spark

    spark = get_spark("zorder-partitioned-pruning")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    qu = ev.approxQuantile("user_id", [0.25, 0.375], 0.001)
    qv = ev.approxQuantile("v_cents", [0.25, 0.375], 0.001)
    box = {
        "user_id": (int(qu[0]), int(qu[1])),
        "v_cents": (int(qv[0]), int(qv[1])),
    }
    # measure EVERY partition value, not a cherry-picked one — the
    # published number is the per-type spread plus the mean
    types = sorted(
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
    )

    base = tempfile.mkdtemp(prefix="zorder_part_measure_")
    try:
        flat, part = f"{base}/flat", f"{base}/part"
        zorder_write(
            spark, ev, flat, ["user_id", "v_cents"], bits=16,
            num_files=num_files,
        )
        zorder_write(
            spark, ev, part, ["user_id", "v_cents"], bits=16,
            num_files=num_files, partition_by=["event_type"],
        )
        flat_files = sorted(glob.glob(f"{flat}/*.parquet"))
        part_all = sorted(
            glob.glob(f"{part}/event_type=*/*.parquet")
        )
        per_type = {}
        for t in types:
            # flat: no dir pruning; footer stats on ALL THREE columns
            # do what they can (the event_type equality included —
            # string min/max stats, exactly what a Spark scan consults)
            flat_preds = {"event_type": (t, t), **box}
            part_dir = sorted(
                glob.glob(f"{part}/event_type={t}/*.parquet")
            )
            per_type[t] = {
                "flat_kept": _kept(flat_files, flat_preds),
                "part_kept": _kept(part_dir, box),
                "dir_pruned": len(part_all) - len(part_dir),
            }
        out = {
            "box": {k: list(v) for k, v in box.items()},
            "flat_total": len(flat_files),
            "part_total": len(part_all),
            "per_type": per_type,
            "mean_flat_kept": round(
                sum(v["flat_kept"] for v in per_type.values())
                / len(per_type), 1,
            ),
            "mean_part_kept": round(
                sum(v["part_kept"] for v in per_type.values())
                / len(per_type), 1,
            ),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
