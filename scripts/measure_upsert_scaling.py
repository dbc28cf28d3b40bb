"""Cost scaling for io.upsert_dataset (SCALE.md evidence).

Claim under test: a CDC batch's merge cost is O(touched partitions)
with `assume_partition_stable=True`, O(one column-pruned key scan)
without it, and only the fallback path pays the full rewrite. Method:
replicate sf0.1 documents R× (token-salted ids so keys stay unique),
partition by doc_id % 64, then apply the SAME 500-row batch touching 2
partitions three ways at R=1 and R=10:

  stable    assume_partition_stable=True   (reads 2/64 partitions)
  general   default                        (adds the key-match scan)
  rewrite   max_touched_partitions=1       (forced full-merge fallback)

Usage: python scripts/measure_upsert_scaling.py [sf_dir] [R...]
  env UPSERT_FAT=k repeats the text column k x (default 8) so IO, not
  fixed planning overhead, dominates — documents is only 5k rows at
  sf0.1.
Prints ONE JSON line per R:
  {"replication": R, "rows": n, "partitions": 64, "bytes": b,
   "stable_s": ..., "general_s": ..., "rewrite_s": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(x) for x in sys.argv[2:]] or [1, 10]

    from pyspark.sql import functions as F

    from engage_spark.io import table, upsert_dataset
    from engage_spark.session import get_spark

    spark = get_spark("upsert-scaling")
    base = tempfile.mkdtemp(prefix="upsert_scale_")
    try:
        for r in reps:
            d = table(spark, sf_dir, "documents").select(
                "doc_id", "text", "n_chars"
            )
            if r > 1:
                d = d.crossJoin(
                    spark.range(r).withColumnRenamed("id", "rep")
                ).select(
                    (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
                    "text",
                    "n_chars",
                )
            fat = int(os.environ.get("UPSERT_FAT", "8"))
            if fat > 1:
                d = d.withColumn("text", F.expr(f"repeat(text, {fat})"))
            d = d.withColumn("part", (F.col("doc_id") % 64).cast("int"))
            n_rows = d.count()

            batch = (
                d.filter(F.col("part").isin(3, 7))
                .limit(500)
                .select(
                    "doc_id",
                    "text",
                    (F.col("n_chars") + 1).alias("n_chars"),
                    "part",
                )
            )
            batch = batch.localCheckpoint()  # fix the batch once

            out = {"replication": r, "rows": n_rows, "partitions": 64}
            # "versioned" (r14): the retain-then-rename commit — the
            # slice is written ONCE to staging then renamed in, vs the
            # plain dynamic-overwrite path's staging write PLUS a
            # second write of the slice into the target
            for mode, kw in (
                ("stable", {"assume_partition_stable": True}),
                ("general", {}),
                ("versioned", {"assume_partition_stable": True}),
                ("rewrite", {"max_touched_partitions": 1}),
            ):
                tgt = os.path.join(base, f"t_{r}_{mode}")
                d.write.partitionBy("part").parquet(tgt)
                if mode == "versioned":
                    from engage_spark.versioning import version_log_enable

                    version_log_enable(spark, tgt)
                out.setdefault(
                    "bytes",
                    sum(
                        os.path.getsize(os.path.join(dp, f))
                        for dp, _, fs in os.walk(tgt)
                        for f in fs
                    ),
                )
                t0 = time.perf_counter()
                upsert_dataset(
                    spark, tgt, batch, ["doc_id"], partition_by=["part"], **kw
                )
                out[f"{mode}_s"] = round(time.perf_counter() - t0, 3)
                shutil.rmtree(tgt, ignore_errors=True)
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
