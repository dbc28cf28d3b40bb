"""End-to-end pretraining-corpus preparation with the public API.

Chains the engine's corpus operators the way a real curation job would
— every stage is a lazy DataFrame transform, so the whole pipeline is
one Catalyst plan per output and nothing materializes driver-side:

    raw documents
      -> exact dedup (first copy per md5 fingerprint wins)
      -> cross-doc span dedup (strip 16-token boilerplate, C4-style)
      -> bigram-LM perplexity scoring + percentile gate (drop the
         worst-perplexity decile — the KenLM/CCNet quality filter)
      -> deterministic 50% hash sample (reproducible on any layout)
      -> then three independent consumers of the cleaned sample:
         chunks — context-window chunking (size 64, stride 48)
         packs  — shard-parallel greedy sequence packing (512-token
                  packs per (source, shard) stratum)
         shards — deterministic md5-keyed delivery order

Run:  python examples/curate_pretraining_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engage_spark import api


def curate(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Build every stage as a lazy DataFrame; return them keyed by
    stage name (callers pick which to materialize)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    deduped = api.exact_dedup_keepers(docs, id_col="doc_id", text_col="text")
    despanned = api.span_dedup(
        deduped, span_tokens=16, id_col="doc_id", text_col="text"
    )
    # carry source forward for the packing strata; drop docs whose text
    # was entirely boilerplate
    cleaned = (
        despanned.filter(F.col("n_kept") > 0)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", F.col("cleaned_text").alias("text"))
    )
    # model-based quality gate: score every doc's perplexity under the
    # corpus's own bigram LM, bucket into deciles (broadcast-threshold
    # assignment, no global sort), drop the worst decile
    ppl = api.bigram_perplexity(cleaned, id_col="doc_id", text_col="text")
    gated = api.percentile_gate(ppl, "ppl", n_buckets=10)
    quality = cleaned.join(
        gated.filter(F.col("bucket") < 10).select("doc_id"), "doc_id", "left_semi"
    )
    sampled = api.hash_sample(quality, rate=0.5, id_col="doc_id")
    chunks = api.chunk_documents(
        sampled, size=64, stride=48, id_col="doc_id", text_col="text"
    )
    # shard-parallel packing: the cumsum window partitions by
    # (source, shard) so no stratum funnels through one task at scale
    packed = api.sequence_packing(
        sampled, id_col="doc_id", text_col="text", strata_col="source",
        budget=512, n_shards=8,
    )
    shards = api.training_shards(sampled, n_shards=16, id_col="doc_id")
    return {
        "raw": docs,
        "deduped": deduped,
        "despanned": despanned,
        "quality": quality,
        "sampled": sampled,
        "chunks": chunks,
        "packed": packed,
        "shards": shards,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("curate-pretraining-corpus")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    stages = curate(spark, sf_dir)
    for name in ("raw", "deduped", "quality", "sampled", "chunks", "packed"):
        print(f"{name:10s} {stages[name].count():>8d} rows")
    stages["shards"].groupBy("shard_id").count().orderBy("shard_id").show(4)
    spark.stop()


if __name__ == "__main__":
    main()
