"""Cost of near-dup admission in the streaming ingest: the same
delivery ingested with exact-only admission vs near_dup_index
admission, wall-clock per mode (Trigger.AvailableNow drain of N
micro-batches). The near-dup path adds, per batch, one MinHash pass
over the batch, one band-row equi-join against the stored index, and
the verify join for banding survivors — all batch-sized except the
index-side band scan.

Usage: python scripts/measure_ingest_neardup.py [sf_dir] [n_files]
Prints ONE JSON line per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("ingest-neardup-cost")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.streaming.jobs import incremental_ingest_stream

    from pyspark.sql import functions as F

    delivery = "/tmp/ingest_nd_docs"
    shutil.rmtree(delivery, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        "text",
        # deterministic 16-dim stand-in embedding (hash-derived): the
        # semantic tier's COST is what this measures — banding, index
        # join, cosine verify — which is content-independent
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("text"), F.lit(i)), F.lit(1000))
                    / 500.0
                    - 1.0
                )
                for i in range(16)
            ]
        ).alias("embedding"),
    )
    docs.repartition(n_files).write.parquet(delivery)
    rows = docs.count()

    for mode in ("exact_only", "near_dup", "near_dup_plus_semantic"):
        work = f"/tmp/ingest_nd_{mode}"
        shutil.rmtree(work, ignore_errors=True)
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(delivery)
        )
        kwargs = {}
        if mode.startswith("near_dup"):
            kwargs["near_dup_index"] = f"{work}/nd_index"
        if mode == "near_dup_plus_semantic":
            kwargs["embed_index"] = f"{work}/emb_index"
        t0 = time.perf_counter()
        incremental_ingest_stream(
            stream, f"{work}/corpus", f"{work}/store", **kwargs
        ).awaitTermination()
        t = time.perf_counter() - t0
        admitted = spark.read.parquet(f"{work}/corpus").count()
        print(json.dumps({
            "mode": mode,
            "rows": rows,
            "batches": n_files,
            "admitted": admitted,
            "wall_s": round(t, 2),
            "per_batch_s": round(t / n_files, 2),
            "sf_dir": sf_dir,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
