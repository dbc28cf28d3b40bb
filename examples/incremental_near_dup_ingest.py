"""Incremental corpus ingest with exact AND near-dup admission.

The streaming half of the curation story: documents arrive as files in
a delivery directory; each micro-batch admits only documents that are

  (a) not exact duplicates of anything already ingested — md5
      fingerprint anti-join against the persisted fingerprint store —
  (b) not NEAR-duplicates (paraphrases) of anything a PRIOR batch
      admitted — MinHash band-key join against the persisted near-dup
      index (api.minhash_index_query semantics).

Both stores append under run=<tag>_batch=<id> partitions, so a
replayed batch overwrites its own partition instead of duplicating,
and a crash between the store write and the checkpoint commit replays
cleanly (own-batch exclusion). The corpus parquet IS the state — the
stream restarts from any checkpoint with no rehydration.

Run:  python examples/incremental_near_dup_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    from engage_spark.streaming.jobs import incremental_ingest_stream

    delivery = f"{workdir}/delivery"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # simulate a feed: 4 file drops = 4 micro-batches
    docs.repartition(4).write.parquet(delivery)

    corpus, store = f"{workdir}/corpus", f"{workdir}/fingerprints"
    nd_index = f"{workdir}/near_dup_index"
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(delivery)
    )
    incremental_ingest_stream(
        stream, corpus, store, near_dup_index=nd_index
    ).awaitTermination()

    delivered = docs.count()
    admitted = spark.read.parquet(corpus).count()
    indexed = spark.read.parquet(f"{nd_index}/hashes").count()
    return {"delivered": delivered, "admitted": admitted, "indexed": indexed}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("incremental-ingest-example")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="ingest_example_")
    try:
        out = run(spark, sf_dir, workdir)
        rejected = out["delivered"] - out["admitted"]
        print(
            f"delivered {out['delivered']} docs in 4 batches; admitted "
            f"{out['admitted']} ({rejected} exact/near dups rejected); "
            f"near-dup index holds {out['indexed']} documents"
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
