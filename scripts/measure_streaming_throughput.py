"""Micro-batch throughput for the doc-quality gate stream (SCALE.md's
streaming perf signal — the st_* queries are deliberately excluded from
the headline bench because orchestration dominates their wall-clock, so
this measures the metric that actually matters for a streaming ingestion
pipeline: sustained rows/second through the map-only quality transform).

Method: split sf0.1 documents into FILES_PER_RUN parquet files in a
delivery directory, readStream with maxFilesPerTrigger=1 (one file per
micro-batch), run the quality_select transform (the same projection
st_doc_quality_stream hash-checks against the x_text_quality oracle)
into a memory sink under Trigger.AvailableNow, then read per-batch
numInputRows / triggerExecution durations from the query's progress
events — Structured Streaming's own throughput accounting, not an
outer wall-clock that would fold in session startup.

Usage: python scripts/measure_streaming_throughput.py [sf_dir] [n_files]
Prints ONE JSON line:
  {"rows": N, "batches": k, "sum_batch_s": ..., "rows_per_s": ...,
   "median_batch_rows_per_s": ..., "sf_dir": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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

    from engage_spark.queries.llm_text import quality_select
    from engage_spark.streaming.jobs import stream_parquet

    # delivery directory: n_files equal parquet slices = n micro-batches
    delivery = "/tmp/stream_tput_docs"
    shutil.rmtree(delivery, ignore_errors=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(n_files).write.parquet(delivery)

    part = next(
        f"{delivery}/{f}" for f in os.listdir(delivery) if f.endswith(".parquet")
    )
    schema = spark.read.parquet(delivery).schema
    stream = stream_parquet(
        spark, delivery, schema, schema_src=part,
        glob="*.parquet", maxFilesPerTrigger="1",
    )
    q = (
        quality_select(stream)
        .writeStream.format("memory")
        .queryName("tput")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batches = [
        p for p in (q.recentProgress or [])
        if p.get("numInputRows", 0) > 0
    ]
    rows = sum(p["numInputRows"] for p in batches)
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in batches]
    rates = [p["numInputRows"] / d for p, d in zip(batches, durs) if d > 0]
    total = sum(durs)
    print(json.dumps({
        "rows": rows,
        "batches": len(batches),
        "sum_batch_s": round(total, 3),
        "rows_per_s": round(rows / total, 1) if total else None,
        "median_batch_rows_per_s": round(statistics.median(rates), 1) if rates else None,
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
