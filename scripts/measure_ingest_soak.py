"""Semantic-tier ingest SOAK (r10 verdict item 6): >=20 micro-batches
through the full exact -> MinHash -> semantic admission pipeline,
verifying that per-batch cost and index-probe latency stay FLAT while
the embed index grows ~20x, and measuring paraphrase-rejection
precision/recall on PLANTED pairs.

Plants: every batch b >= 2 re-delivers P documents from batch b-2 with
 - a new doc_id (passes the exact-fingerprint gate),
 - REVERSED word order (word-3-gram shingles are disjoint -> passes
   the MinHash gate),
 - the original embedding plus ~1% deterministic noise (cosine ~0.999
   >= the 0.85 admission threshold -> the SEMANTIC tier must reject).

Precision comes from a differential run: the same delivery with the
embed tier OFF; semantic_rejected = admitted(off) - admitted(on).

Usage: python scripts/measure_ingest_soak.py [sf_dir] [n_batches] [plants]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession


def _hash_embedding(dim: int = 16):
    return F.array(
        *[
            (F.pmod(F.xxhash64(F.col("text"), F.lit(i)), F.lit(1000)) / 500.0 - 1.0)
            for i in range(dim)
        ]
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    plants = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .appName("ingest-soak")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from engage_spark.api import embed_index_query
    from engage_spark.streaming.jobs import incremental_ingest_stream

    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .withColumn("embedding", _hash_embedding())
        .localCheckpoint()
    )

    delivery = "/tmp/ingest_soak_delivery"
    shutil.rmtree(delivery, ignore_errors=True)
    planted_ids: list[int] = []
    noise = F.array(
        *[
            (
                F.pmod(F.xxhash64(F.col("text"), F.lit(5000 + i)), F.lit(1000))
                / 500.0
                - 1.0
            )
            * 0.02
            for i in range(16)
        ]
    )
    for b in range(n_batches):
        part = base.filter(F.col("doc_id") % n_batches == b)
        if b >= 2:
            src = (
                base.filter(F.col("doc_id") % n_batches == b - 2)
                .orderBy("doc_id")
                .limit(plants)
            )
            plant = src.select(
                (F.col("doc_id") + 10_000_000 * (b + 1)).alias("doc_id"),
                F.array_join(
                    F.reverse(F.split(F.col("text"), r"\s+")), " "
                ).alias("text"),
                F.zip_with(
                    F.col("embedding"), noise, lambda x, y: x + y
                ).alias("embedding"),
            )
            planted_ids.extend(r.doc_id for r in plant.select("doc_id").collect())
            part = part.unionByName(plant)
        # sequential writes -> increasing mtimes -> in-order processing
        part.coalesce(1).write.parquet(f"{delivery}/b{b:03d}.parquet")

    results = {}
    for mode in ("semantic", "no_semantic"):
        work = f"/tmp/ingest_soak_{mode}"
        shutil.rmtree(work, ignore_errors=True)
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, embedding array<double>"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(delivery)
        )
        kwargs = {"near_dup_index": f"{work}/nd_index"}
        if mode == "semantic":
            kwargs["embed_index"] = f"{work}/emb_index"
        t0 = time.perf_counter()
        q = incremental_ingest_stream(
            stream, f"{work}/corpus", f"{work}/store", **kwargs
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        batch_s = [
            p["batchDuration"] / 1000.0
            for p in (q.recentProgress or [])
            if p.get("numInputRows", 0) > 0
        ]
        admitted = {
            r.doc_id
            for r in spark.read.parquet(f"{work}/corpus")
            .select("doc_id")
            .collect()
        }
        results[mode] = {"wall": wall, "batch_s": batch_s, "admitted": admitted}

    sem, off = results["semantic"], results["no_semantic"]
    rejected = off["admitted"] - sem["admitted"]
    planted = set(planted_ids)
    caught = rejected & planted
    bs = sem["batch_s"]
    early = bs[2:8]
    late = bs[-6:]
    mean = lambda v: sum(v) / max(1, len(v))  # noqa: E731

    # index-probe latency vs index size: probe the full-grown index,
    # then an index built from just the first 2 batches' corpus slice
    from engage_spark.api import embed_index_build

    probe = base.orderBy("doc_id").limit(50).select("doc_id", "embedding")
    big_idx = "/tmp/ingest_soak_semantic/emb_index"

    def probe_s(idx: str) -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            embed_index_query(
                idx, probe, id_col="doc_id", threshold=0.85
            ).count()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return round(best, 3)

    small_idx = "/tmp/ingest_soak_small_idx"
    shutil.rmtree(small_idx, ignore_errors=True)
    small = base.filter(F.col("doc_id") % n_batches < 2).select(
        F.col("doc_id").alias("vec_id"), F.col("embedding")
    )
    embed_index_build(small, small_idx, dim=16)
    big_rows = spark.read.parquet(f"{big_idx}/vectors").count()
    small_rows = small.count()

    print(json.dumps({
        "batches": n_batches,
        "planted": len(planted),
        "semantic_rejected": len(rejected),
        "caught_planted": len(caught),
        "precision": round(len(caught) / max(1, len(rejected)), 4),
        "recall": round(len(caught) / max(1, len(planted)), 4),
        "per_batch_early_s": round(mean(early), 2),
        "per_batch_late_s": round(mean(late), 2),
        "late_over_early": round(mean(late) / max(1e-9, mean(early)), 2),
        "wall_semantic_s": round(sem["wall"], 1),
        "wall_no_semantic_s": round(off["wall"], 1),
        "probe_small_s": probe_s(small_idx),
        "probe_big_s": probe_s(big_idx),
        "index_rows_small": small_rows,
        "index_rows_big": big_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
