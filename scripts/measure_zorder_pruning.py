"""File-skipping measurement for the Z-order layout (io.zorder_write).

Method: lay out sf0.1 `events`, quantized to (user_id, value-cents),
three ways — unsorted (as-ingested), linearly sorted on user_id (the
single-column clustering a plain ORDER BY write gives), and Z-ordered
on (user_id, v_cents) — then evaluate footer-stats pruning for three
predicate shapes by reading every output file's parquet row-group
min/max (exactly the stats a Spark scan consults before reading pages):

  lead   user_id in a 1/8 strip              (linear sort's home turf)
  second v_cents in a 1/8 strip              (linear sort can't prune)
  rect   both constrained to a 1/8 x 1/8 box (the lookup shape)

Skip rate = files whose stats exclude the predicate / total files.
At 100 TB "files" are row groups / splits; the ratio is the fraction
of the corpus a point/range lookup never reads. The Z layout trades a
little of the lead-column's pruning for pruning on EVERY curve column
— the right layout whenever lookups hit more than one dimension.

Usage: python scripts/measure_zorder_pruning.py [sf_dir] [num_files]
Prints ONE JSON line:
  {"layout": {"pred": {"kept": k, "total": n}, ...}, ...}
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


def surviving(path: str, preds: dict[str, tuple[int, int]]) -> tuple[int, int]:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    keep = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        names = {c: i for i, c in enumerate(md.schema.names)}
        overlaps = True
        for col, (qlo, qhi) in preds.items():
            smin = min(
                md.row_group(g).column(names[col]).statistics.min
                for g in range(md.num_row_groups)
            )
            smax = max(
                md.row_group(g).column(names[col]).statistics.max
                for g in range(md.num_row_groups)
            )
            if smax < qlo or smin > qhi:
                overlaps = False
        keep += overlaps
    return keep, len(files)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from engage_spark.io import table, zorder_write
    from engage_spark.session import get_spark

    spark = get_spark("zorder-pruning")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100 + 1e-9).cast("long").alias("v_cents"),
    )
    # equal-MASS 1/8 strips (25th..37.5th percentile), not 1/8 of the
    # value RANGE: `value` is right-skewed, so a range strip holds most
    # of the rows and no layout could prune it — the quantile strip is
    # the selectivity a real lookup has
    qu = ev.approxQuantile("user_id", [0.25, 0.375], 0.001)
    qv = ev.approxQuantile("v_cents", [0.25, 0.375], 0.001)
    u_strip = (int(qu[0]), int(qu[1]))
    v_strip = (int(qv[0]), int(qv[1]))
    preds = {
        "lead": {"user_id": u_strip},
        "second": {"v_cents": v_strip},
        "rect": {"user_id": u_strip, "v_cents": v_strip},
    }

    base = tempfile.mkdtemp(prefix="zorder_measure_")
    try:
        paths = {
            "unsorted": f"{base}/unsorted",
            "linear_user_id": f"{base}/linear",
            "zorder_minmax": f"{base}/zorder",
            "zorder_rank": f"{base}/zorder_rank",
        }
        ev.repartition(num_files).write.parquet(paths["unsorted"])
        (
            ev.repartitionByRange(num_files, "user_id")
            .sortWithinPartitions("user_id")
            .write.parquet(paths["linear_user_id"])
        )
        zorder_write(
            spark, ev, paths["zorder_minmax"], ["user_id", "v_cents"],
            bits=16, num_files=num_files,
        )
        zorder_write(
            spark, ev, paths["zorder_rank"], ["user_id", "v_cents"],
            bits=16, num_files=num_files, scale="rank",
        )
        out = {
            layout: {
                name: dict(zip(("kept", "total"), surviving(p, pred)))
                for name, pred in preds.items()
            }
            for layout, p in paths.items()
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
