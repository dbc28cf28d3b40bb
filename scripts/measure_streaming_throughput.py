"""Micro-batch throughput for the doc-quality gate stream (SCALE.md's
streaming perf signal — the st_* queries are deliberately excluded from
the headline bench because orchestration dominates their wall-clock, so
this measures the metric that actually matters for a streaming ingestion
pipeline: sustained rows/second through the map-only quality transform).

Method: split sf0.1 documents into FILES parquet files in a delivery
directory, readStream with a swept maxFilesPerTrigger (files per
micro-batch), run the quality_select transform (the same projection
st_doc_quality_stream hash-checks against the x_text_quality oracle)
into a memory sink under Trigger.AvailableNow, then read per-batch
numInputRows / triggerExecution durations from the query's progress
events — Structured Streaming's own throughput accounting, not an
outer wall-clock that would fold in session startup.

The sweep is the point (round-9 addition): per-batch cost is ~1.3 s
FIXED trigger/planning overhead plus a small row-linear term, so
throughput is almost exactly proportional to micro-batch size — the
production lever is maxFilesPerTrigger / maxBytesPerTrigger (file
source) or maxOffsetsPerTrigger (Kafka), not the transform.

Usage: python scripts/measure_streaming_throughput.py [sf_dir] [n_files] [mft_list]
  mft_list: comma-separated maxFilesPerTrigger values to sweep
            (default "1" — the historical single-run mode).
Prints ONE JSON line per swept value:
  {"max_files_per_trigger": m, "rows": N, "batches": k,
   "sum_batch_s": ..., "rows_per_s": ..., "median_batch_rows_per_s": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def run_one(spark, delivery: str, part: str, mft: int, sf_dir: str) -> dict:
    from engage_spark.queries.llm_text import quality_select
    from engage_spark.streaming.jobs import stream_parquet

    schema = spark.read.parquet(delivery).schema  # noqa: F841 (schema probe)
    stream = stream_parquet(
        spark, delivery, schema, schema_src=part,
        glob="*.parquet", maxFilesPerTrigger=str(mft),
    )
    name = f"tput_{mft}"
    q = (
        quality_select(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batches = [
        p for p in (q.recentProgress or []) if p.get("numInputRows", 0) > 0
    ]
    rows = sum(p["numInputRows"] for p in batches)
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in batches]
    rates = [p["numInputRows"] / d for p, d in zip(batches, durs) if d > 0]
    total = sum(durs)
    spark.catalog.dropTempView(name)
    return {
        "max_files_per_trigger": mft,
        "rows": rows,
        "batches": len(batches),
        "sum_batch_s": round(total, 3),
        "rows_per_s": round(rows / total, 1) if total else None,
        "median_batch_rows_per_s": (
            round(statistics.median(rates), 1) if rates else None
        ),
        "sf_dir": sf_dir,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mfts = [int(x) for x in (sys.argv[3] if len(sys.argv) > 3 else "1").split(",")]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("stream-throughput")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # delivery directory: n_files equal parquet slices
    delivery = "/tmp/stream_tput_docs"
    shutil.rmtree(delivery, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(n_files).write.parquet(delivery)

    part = next(
        f"{delivery}/{f}" for f in os.listdir(delivery) if f.endswith(".parquet")
    )
    for mft in mfts:
        print(json.dumps(run_one(spark, delivery, part, mft, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
